package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Star}

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("GraftExtensions.register exposes native expressions to SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_simhash(array('a','b','a')) AS sh,
        |  graft_shingles(array('a','b','c','d'), 2) AS sg,
        |  graft_cosine(array(1.0d, 0.0d), array(2.0d, 0.0d)) AS cs,
        |  size(graft_minhash(array('x y z'), 64)) AS mh_n""".stripMargin).head()
    assert(row.getSeq[String](row.fieldIndex("sg")).toList == List("a b", "b c", "c d"))
    assert(math.abs(row.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(row.getAs[Int]("mh_n") == 64)
    // SQL result matches the Column-API expression
    val viaApi = Seq("a b a").toDF("t")
      .select(Dedup.simHash(col("t"))).as[Long].head()
    assert(row.getAs[Long]("sh") == viaApi)
  }

  test("writeFactPartitioned lays out by date key and prunes on read") {
    val fact = Seq((20240101, 1L, 10.0), (20240101, 2L, 20.0), (20240202, 3L, 30.0))
      .toDF("date_key", "k", "v")
    val dir = Files.createTempDirectory("graft_fact").toFile.getAbsolutePath
    Star.writeFactPartitioned(fact, dir, "date_key", "k")
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val pruned = back.where(col("date_key") === 20240101)
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("date_key"))
    // physical layout: one directory per date_key
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("date_key=20240101", "date_key=20240202"))
  }
}
