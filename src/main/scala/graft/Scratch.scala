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
      println(f"  $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.documents(s, d)
      val toks = operators.TextAnalysis.tokens(col("text"))
      time("tokens only") {
        noop(docs.select(col("doc_id"), toks.as("t")))
      }
      time("ngramsAll project") {
        noop(docs.select(col("doc_id"),
          operators.TextAnalysis.ngramsAll(toks, 2).as("g")))
      }
      time("ngrams explode") {
        noop(docs.select(col("doc_id"),
          explode(operators.TextAnalysis.ngramsAll(toks, 2)).as("g")))
      }
      time("grams groupBy") {
        noop(docs.select(col("doc_id"),
          explode(operators.TextAnalysis.ngramsAll(toks, 2)).as("g"))
          .groupBy(col("doc_id"), col("g")).count())
      }
      time("rep_filter full") {
        noop(SparkEntry.queries("rep_filter")(s, d))
      }
      time("ngramsAll project repart32") {
        noop(docs.repartition(32).select(col("doc_id"),
          operators.TextAnalysis.ngramsAll(toks, 2).as("g")))
      }
      time("postings repart32") {
        noop(docs.repartition(32).select(col("doc_id").as("d"), size(toks).as("dl"),
            explode(toks).as("term"))
          .groupBy(col("d"), col("dl"), col("term")).agg(count(lit(1))))
      }
      time("bm25 postings") {
        noop(docs.select(col("doc_id").as("d"), size(toks).as("dl"),
            explode(toks).as("term"))
          .groupBy(col("d"), col("dl"), col("term")).agg(count(lit(1))))
      }
      time("bm25 full") {
        noop(SparkEntry.queries("bm25_topk")(s, d))
      }
    }
    spark.stop()
  }
}
