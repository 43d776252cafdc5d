package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for iterating on hot queries (not part of the
  * library surface; excluded from SparkEntry). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import s.implicits._
    import operators.Dedup

    // planted semantics check
    val P = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 $P b1 b2 b3 b4 b5"),
      (2L, s"c1 c2 c3 c4 c5 c6 c7 $P d1 d2 d3"),
      (3L, "e1 e2 e3 e4 e5 e6 e7 e8 e9"), // clean, shorter
      (4L, "x x x x x x x x x x x x x x x x x x x x"), // self-repeat
      (5L, "short doc")
    ).toDF("doc_id", "text")
    for (md5h <- Seq(false, true)) {
      println(s"=== md5Hash=$md5h")
      Dedup.substrDedup(docs, "doc_id", "text", 8, md5h)
        .orderBy("doc_id").collect().foreach(println)
    }
    // corpus scale + non-vacuity probe on the dedup corpus
    val dd = Tables.documents(s, d)
    val corpus = dd.unionByName(dd.filter(col("doc_id") % 20 === 0)
      .withColumn("doc_id", col("doc_id") + 100000))
    def probe(label: String, md5h: Boolean): Unit = {
      val t0 = System.nanoTime()
      val out = Dedup.substrDedup(corpus, "doc_id", "text", 8, md5h)
      val agg = out.agg(count(lit(1)), sum(col("n_dropped")),
        sum(when(col("n_dropped") > 0, 1).otherwise(0))).collect().head
      println(f"$label rows=${agg.getLong(0)} dropped_tokens=${agg.getLong(1)} docs_cut=${agg.getLong(2)} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    probe("xxh", md5h = false)
    probe("md5", md5h = true)
    spark.stop()
  }
}
