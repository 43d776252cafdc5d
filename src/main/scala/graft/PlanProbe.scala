package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: print executedPlan with AQE off (static ReuseExchange) and
  * the final adaptive plan after execution, for reuse auditing. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // local-fs chmod-fork removal (no libhadoop in this environment):
      // see graft.sources.BareLocalFileSystem
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.BareLocalFileSystem].getName)
      // v2 output committer: task-parallel commit renames instead of the
      // driver-serial job-commit merge — O(files) driver work removed from
      // every partitioned write (zones are idempotent overwrite targets,
      // so v2's weaker mid-job atomicity is safe here)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // AQE coalescing floor: the 1MB default collapses small-bytes but
      // CPU-DENSE post-shuffle stages (similarity-join verify: 5.7MB of
      // candidate pairs -> 5 tasks x 1.3s of array_intersect) to a handful
      // of tasks. 256KB keeps such stages parallel; at production shuffle
      // sizes bytes/parallelism >> 256KB so the floor never binds there.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256KB")
      // static conf: the default 100-entry codegen cache thrashes under a
      // 90-query sweep (~1500 distinct codegen units), recompiling every
      // stage on every run — sized to hold the whole library's units
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name (AQE off, static) =====")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p1 = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      println(p1.linesIterator.filter(l => l.contains("Exchange") || l.contains("Generate")
        || l.contains("Scan parquet") || l.contains("Reused")).mkString("\n"))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      println(s"===== $name (AQE on, final after exec) =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val p2 = df.queryExecution.executedPlan.toString
      println(p2.linesIterator.filter(l => l.contains("Exchange") || l.contains("Generate")
        || l.contains("Scan parquet") || l.contains("Reused") || l.contains("QueryStage")).mkString("\n"))
    }
    spark.stop()
  }
}
