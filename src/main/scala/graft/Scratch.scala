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

    // Per-job durations for the LAST timed block: shows where the wall
    // time goes (broadcast jobs vs shuffle-stage jobs under AQE).
    val jobT = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = j.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n').take(60)}[${si.numTasks}]").mkString(" | ")
        jobT.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = Option(jobT.get(j.jobId)).getOrElse((0L, "?"))
        println(f"    job ${j.jobId}%3d ${(j.time - t0) / 1e3}%6.2f s  $desc")
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.documents(s, d)
      val toks = operators.TextAnalysis.tokens(col("text"))
      // bm25 pieces: construction (vocab collect) vs execution
      val queries = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(toks, 1, 6)).as("qtext"))
      time("query-side vocab collect") {
        queries.select(explode(array_distinct(
          operators.TextAnalysis.tokens(col("qtext")))).as("term"))
          .select(col("term")).distinct().collect()
      }
      time("stats agg (scalar)") {
        docs.select(size(toks).as("dl"))
          .agg(count(lit(1)), sum(col("dl"))).collect()
      }
      time("bm25 construction only") {
        operators.Retrieval.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", 10)
      }
      time("bm25 full (construct+exec)") {
        noop(SparkEntry.queries("bm25_topk")(s, d))
      }
      val pre = time("bm25 construct (pre)") {
        operators.Retrieval.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", 10)
      }
      time("bm25 exec only") { noop(pre) }
      if (round == 3) {
        pre.collect()
        println("=== final adaptive plan ===")
        println(pre.queryExecution.executedPlan.toString)
      }
      // hypothesis: exploding ALL tokens then filtering is the cost —
      // filter the token ARRAY first, explode only survivors
      val vocab = queries.select(explode(array_distinct(
          operators.TextAnalysis.tokens(col("qtext")))).as("term"))
        .select(col("term")).distinct().collect().map(_.getString(0)).toSeq
      time("postings explode-then-filter") {
        noop(docs.select(col("doc_id").as("d"), size(toks).as("dl"), explode(toks).as("term"))
          .where(col("term").isin(vocab: _*))
          .groupBy(col("d"), col("dl"), col("term")).agg(count(lit(1))))
      }
      time("postings filter-then-explode") {
        noop(docs.select(col("doc_id").as("d"), size(toks).as("dl"),
            explode(filter(toks, t => t.isin(vocab: _*))).as("term"))
          .groupBy(col("d"), col("dl"), col("term")).agg(count(lit(1))))
      }
      time("corpus scan+tokenize only") {
        noop(docs.select(col("doc_id"), size(toks).as("dl")))
      }
      time("postings pre-projected toks") {
        noop(docs.select(col("doc_id").as("d"), toks.as("w"))
          .select(col("d"), size(col("w")).as("dl"), explode(col("w")).as("term"))
          .where(col("term").isin(vocab: _*))
          .groupBy(col("d"), col("dl"), col("term")).agg(count(lit(1))))
      }
    }
    spark.stop()
  }
}
