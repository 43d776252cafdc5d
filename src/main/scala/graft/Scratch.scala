package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for iterating on hot queries (not part of the
  * library surface; excluded from SparkEntry). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    Tables.documents(s, d).count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.documents(s, d)
    val toks = operators.TextAnalysis.tokens(col("text"))
    val queries = docs.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(toks, 1, 6)).as("qtext"))
    val vocab = queries.select(explode(array_distinct(
        operators.TextAnalysis.tokens(col("qtext")))).as("term"))
      .select(col("term")).distinct().collect().map(_.getString(0)).toSeq
    println(s"  vocab size = ${vocab.length}")
    val hsOf = graft.functions.NativeExprs.queryTf(col("_w"), vocab)

    (1 to 3).foreach { round =>
      println(s"--- round $round")
      time("eager-style pass (posexplode_outer)") {
        docs.select(toks.as("_w"))
          .select(size(col("_w")).as("_dl"), posexplode_outer(hsOf))
          .groupBy(col("col.term").as("term"))
          .agg(count(lit(1)).as("df"))
          .collect()
      }
      val hits = docs.select(col("doc_id"), toks.as("_w"))
        .select(col("doc_id"), size(col("_w")).as("dl"), explode(hsOf).as("_h"))
        .select(col("doc_id"), col("dl"), col("_h.term").as("term"),
          col("_h.tf").cast("long").as("tf"))
      time("hits only (map tf + explode)") { noop(hits) }
      time("hits + partial sum agg") {
        noop(hits.groupBy(col("doc_id")).agg(sum(col("tf"))))
      }
      time("bm25 full (construct+exec)") {
        noop(SparkEntry.queries("bm25_topk")(s, d))
      }
      if (round == 3) {
        val q = SparkEntry.queries("bm25_topk")(s, d)
        noop(q)
        println(q.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
