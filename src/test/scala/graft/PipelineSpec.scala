package graft

import java.nio.file.Files

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("runAll drives stage -> quality -> DWH end-to-end with a run report") {
    val out = Files.createTempDirectory("graft_pipe").toFile.getAbsolutePath
    val report = Pipeline.runAll(spark, "/root/testdata/sf0.001", out, "run_p1")
      .as[Pipeline.StageReport].collect().map(r => r.stage -> r.rows).toMap

    val raw = spark.read.parquet(s"$out/raw/orders")
    val clean = spark.read.parquet(s"$out/clean/orders")
    val fact = spark.read.parquet(s"$out/dwh/fact_orders")
    val factLine = spark.read.parquet(s"$out/dwh/fact_lineitem")

    assert(report.keySet == Set("stage_raw", "quality", "transform_load", "report"))
    assert(report("stage_raw") == raw.count())
    // raw data is valid, so clean == raw and the error zone is absent/empty
    assert(clean.count() == raw.count())
    assert(!new java.io.File(s"$out/error/orders").exists() ||
      spark.read.parquet(s"$out/error/orders").count() == 0)
    // DWH facts: every clean order at order grain, every line of a clean
    // order at line grain, all with resolved surrogate keys
    assert(fact.count() == clean.count())
    assert(fact.where(fact("customer_key").isNull).count() == 0)
    assert(report("transform_load") == fact.count() + factLine.count())
    assert(factLine.count() == spark.read.parquet(s"$out/raw/lineitem").count())
    assert(factLine.where(factLine("part_key").isNull || factLine("customer_key").isNull)
      .count() == 0)
    // metadata rode through the zones
    assert(raw.columns.contains("_run_id"))
    // DWH is laid out partitioned by date_key
    for (f <- Seq("fact_orders", "fact_lineitem")) {
      val parts = new java.io.File(s"$out/dwh/$f").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(parts.nonEmpty && parts.forall(_.startsWith("date_key=")))
    }
    // report zone: per-zone stats cover every raw row; rule audit readable
    val stats = spark.read.parquet(s"$out/report/zone_stats")
    assert(stats.agg(org.apache.spark.sql.functions.sum("n_rows"))
      .collect().head.getLong(0) == raw.count())
    assert(spark.read.parquet(s"$out/report/rule_audit").columns.toSet ==
      Set("rule", "n_violations"))
  }
}
