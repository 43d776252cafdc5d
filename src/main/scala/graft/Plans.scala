package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps the formatted physical plan of every SparkEntry
  * query so pushdown, broadcast choices, and codegen coverage can be
  * reviewed (`tools/run.sh graft.Plans <sfDir> [query...]`).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
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
    HarnessLog.quietBudgetedWindowWarn() // budgeted-site WARN noise, see HarnessLog
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        println(s"\n===== $name =====")
        try {
          val df = fn(spark, sfDir)
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch {
          case e: Throwable => println(s"explain failed: ${e.getMessage}")
        }
        // eager checkpoints materialize at CONSTRUCTION, so even a
        // plan dump creates blocks — free them per query (Bench rationale)
        Ckpt.releaseTransient()
      }
    }
    spark.stop()
  }
}
