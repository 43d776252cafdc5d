package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the lake-maintenance step every streaming zone
  * needs: micro-batch sinks (raw/clean/error zones, the dedup index) append
  * one file per trigger per partition, and a 100 TB lake tailed for a month
  * decays into millions of KB-sized files whose per-file open/footer costs
  * dominate scan time.
  *
  * `compact` rewrites a parquet directory into ceil(bytes / targetBytes)
  * files, sized from the ACTUAL on-disk footprint (no data scan to plan),
  * and swaps the result in atomically-enough for a maintenance window:
  * write to `<dir>.compact-tmp`, then move over the original. Uses
  * `coalesce` (narrow — no shuffle: compaction must not pay a network pass
  * over the whole zone) unless the caller asks for `sortBy`, in which case
  * the rewrite range-partitions + sorts so downstream scans get clustered
  * data (one deliberate shuffle, the min-max-pruning trade).
  */
object Compaction {

  /** On-disk bytes and file count of a directory's parquet data files. */
  def footprint(dir: String): (Long, Int) = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    val files = walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    (files.map(_.length()).sum, files.size)
  }

  /** Plan the output file count for `dir` at `targetBytes` per file. */
  def planFiles(dir: String, targetBytes: Long): Int = {
    val (bytes, _) = footprint(dir)
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
  }

  /** Compact `dir` in place. Returns (filesBefore, filesAfter). NOTE:
    * rewrites the directory as a FLAT parquet table — for a hive-partitioned
    * zone, compact each leaf partition directory (that is also the unit a
    * maintenance job parallelizes over). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              sortBy: Seq[String] = Nil): (Int, Int) = {
    val (_, before) = footprint(dir)
    val n = planFiles(dir, targetBytes)
    val df = spark.read.parquet(dir)
    val out =
      if (sortBy.isEmpty) df.coalesce(n)
      else df.repartitionByRange(n, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*)
    val tmp = s"$dir.compact-tmp"
    out.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(dir)
    val trash = new java.io.File(s"$dir.compact-old")
    deleteRecursively(trash)
    require(target.renameTo(trash), s"could not stage old dir $dir")
    require(new java.io.File(tmp).renameTo(target), s"could not swap in $tmp")
    deleteRecursively(trash)
    val (_, after) = footprint(dir)
    (before, after)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }
}
