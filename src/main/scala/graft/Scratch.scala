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
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    Tables.documents(s, d).count()

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield (c - s) / 1e3).getOrElse(-1.0)
        val exec = si.taskMetrics.executorRunTime / 1e3
        println(f"    stage ${si.stageId}%3d wall=$wall%6.2f cpuSum=$exec%6.2f tasks=${si.numTasks}%3d")
      }
    })
    def time[T](label: String)(f: => T): T = {
      val cm = org.apache.spark.metrics.source.CodegenMetrics
      val c0 = cm.METRIC_COMPILATION_TIME.getCount
      val t0 = System.nanoTime(); val r = f
      val dc = cm.METRIC_COMPILATION_TIME.getCount - c0
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  janinoCompiles=+$dc"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    (1 to 3).foreach { round =>
      println(s"--- round $round")
      time("profile_columns") { noop(SparkEntry.queries("profile_columns")(s, d)) }
      // variants: no spread, and per-column approx to see where time goes
      val orders = Tables.orders(s, d)
      time("profile no spread") {
        noop(operators.Quality.profileColumns(orders,
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")))
      }
      time("single countDistinct") {
        noop(Tables.spread(s, d, "orders", orders).agg(countDistinct(col("o_custkey"))))
      }
      time("4 countDistinct only") {
        noop(Tables.spread(s, d, "orders", orders).agg(countDistinct(col("o_orderkey")),
          countDistinct(col("o_custkey")), countDistinct(col("o_orderstatus")),
          countDistinct(col("o_orderpriority"))))
      }
    }
    spark.stop()
  }
}
