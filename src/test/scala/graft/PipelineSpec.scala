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

    // DWH dimensional shape: dim_date covers every fact date_key
    val dimDate = spark.read.parquet(s"$out/dwh/dim_date")
    assert(dimDate.select("date_key").distinct().count() == dimDate.count())
    assert(fact.join(dimDate, Seq("date_key"), "left_anti").count() == 0)
  }

  test("two runs with a changed customer snapshot version the SCD2 dim; facts resolve current") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_pipe2").toFile.getAbsolutePath
    val orig = "/root/testdata/sf0.001"

    // Second-run source: same tables, but some customers changed market
    // segment — the attribute change SCD2 must version.
    val mutated = Files.createTempDirectory("graft_sf_mut").toFile.getAbsolutePath
    for (t <- Seq("orders", "lineitem", "part", "nation", "region", "supplier",
                  "documents", "embeddings", "events"))
      Files.copy(java.nio.file.Paths.get(s"$orig/$t.parquet"),
        java.nio.file.Paths.get(s"$mutated/$t.parquet"))
    spark.read.parquet(s"$orig/customer.parquet")
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 10 === 0, concat(lit("MOVED_"), col("c_mktsegment")))
          .otherwise(col("c_mktsegment")))
      .write.parquet(s"$mutated/customer.parquet")

    Pipeline.runAll(spark, orig, out, "run_a", "2026-01-01 00:00:00").collect()
    Pipeline.runAll(spark, mutated, out, "run_b", "2026-02-01 00:00:00").collect()

    val dim = spark.read.parquet(s"$out/dwh/dim_customer")
    assert(Seq("valid_from", "valid_to", "is_current", "customer_key")
      .forall(dim.columns.contains))
    val moved = dim.where(col("c_custkey") % 10 === 0)
    val unmoved = dim.where(col("c_custkey") % 10 =!= 0)
    // changed keys: two versions — the old one closed at run 2's snapshot
    // time and no longer current, the new one open-ended and current
    assert(moved.groupBy("c_custkey").count().where(col("count") =!= 2).count() == 0)
    assert(moved.where(!col("is_current"))
      .agg(min(col("valid_to")), max(col("valid_to"))).collect().head.toSeq.forall(
        _ == java.sql.Timestamp.valueOf("2026-02-01 00:00:00")))
    assert(moved.where(col("is_current")).where(!col("c_mktsegment").startsWith("MOVED_"))
      .count() == 0)
    // unchanged keys: exactly one (current) version
    assert(unmoved.groupBy("c_custkey").count().where(col("count") =!= 1).count() == 0)
    assert(unmoved.where(!col("is_current")).count() == 0)
    // per-version surrogate keys are unique across the whole dim
    assert(dim.select("customer_key").distinct().count() == dim.count())
    // facts resolve against the CURRENT version's surrogate key
    val cur = dim.where(col("is_current")).select(col("c_custkey"), col("customer_key"))
    val fact = spark.read.parquet(s"$out/dwh/fact_orders")
    assert(fact.where(col("customer_key").isNull).count() == 0)
    assert(fact.join(cur, Seq("customer_key"), "left_anti").count() == 0)
  }
}
