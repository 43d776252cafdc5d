package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Failed queries report an
  * "errors" entry (and are excluded from the total) instead of being
  * silently timed as if they succeeded.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    // Warm the session before timing anything: scheduler, codegen
    // infrastructure, parquet footer reader, and shuffle machinery all pay
    // one-time costs that would otherwise land entirely on the first query
    // (alphabetically ann_ivf) and distort per-query comparisons.
    {
      import org.apache.spark.sql.functions._
      Tables.region(spark, sfDir)
        .groupBy(col("r_regionkey")).agg(count(lit(1)))
        .write.mode("overwrite").format("noop").save()
      // Per-table first-touch (file listing + footer reads + schema) is also
      // one-time; count() materializes no columns, so this is metadata work.
      Seq(Tables.nation _, Tables.customer _, Tables.supplier _,
          Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
          Tables.documents _, Tables.embeddings _)
        .foreach(t => t(spark, sfDir).count())
    }

    var timings = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    // Two back-to-back reps per query, report the min: a single shared-JVM
    // pass scatters one-time costs (janino codegen compiles, GC debt left
    // by whichever heavy query ran before, broadcast cleanup) onto random
    // queries — ±0.5-2s per-query noise that swamps round-over-round
    // comparison at this scale factor. The min is the steady-state
    // throughput, which is the quantity that extrapolates to a long-lived
    // cluster session (compile cost amortizes; it does not scale with data).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // Stable order so per-round bench JSON is comparable across rounds.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val best = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        timings :+= (name -> best)
      } catch {
        case e: Throwable =>
          errors :+= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }
    }
    val qs = timings.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = timings.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"reps":$reps,"sf":${q(sfDir)}}""")
    spark.stop()
  }
}
