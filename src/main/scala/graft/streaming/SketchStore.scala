package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe replace-on-write for lake-resident sketch tables
  * ([[StreamingCms]], [[StreamingHll]]) — closes the ADVICE r15 window:
  * `mode("overwrite")` is delete-then-write, so a crash mid-overwrite
  * could leave a PARTIAL sketch whose max(_bid) already equals the batch
  * id (the replay would then skip against incomplete cells) or lose the
  * prior sketch entirely.
  *
  * Protocol (two sibling dirs, `<path>.swap.tmp` and `<path>.swap.prev`;
  * every step is an atomic FileSystem rename or an idempotent write):
  *
  *  1. write the new sketch COMPLETELY to `.tmp` (overwrite — a partial
  *     `.tmp` from an earlier crash is simply rewritten);
  *  2. retire the live dir: delete any stale `.prev`, rename live → `.prev`;
  *  3. rename `.tmp` → live;
  *  4. delete `.prev`.
  *
  * [[recover]] runs before every read: the only crash point that leaves
  * the live dir missing is between steps 2 and 3, where `.prev` holds the
  * complete PRIOR sketch — renaming it back restores exactly the
  * state-before-this-batch, and the at-least-once replay then re-folds
  * the batch (never applied twice: the fold that crashed never reached
  * step 3). A crash after step 3 leaves the new sketch live and at most a
  * stale `.prev`, which step 2 of the next fold clears; the replay then
  * sees the batch already applied (bid guard or max-idempotence). Every
  * crash point therefore resolves to exactly-once application.
  *
  * Writing `.tmp` FIRST also replaces the old localCheckpoint-before-
  * overwrite trick: the plan still reads the live dir while the write
  * runs, and the live dir is only renamed after the write completes. */
object SketchStore {

  private def fs(s: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def tmpPath(path: String) = new org.apache.hadoop.fs.Path(path + ".swap.tmp")
  private def prevPath(path: String) = new org.apache.hadoop.fs.Path(path + ".swap.prev")

  /** Roll back to the complete prior sketch if a crash between retire and
    * promote left the live dir missing. Call before any read. */
  def recover(s: SparkSession, path: String): Unit = {
    val (f, live) = fs(s, path)
    val prev = prevPath(path)
    if (!f.exists(live) && f.exists(prev)) {
      require(f.rename(prev, live), s"sketch recover: rename $prev -> $live failed")
    }
  }

  /** True iff a (recovered) sketch exists at `path`. */
  def exists(s: SparkSession, path: String): Boolean = {
    recover(s, path)
    val (f, live) = fs(s, path)
    f.exists(live)
  }

  /** Replace the sketch at `path` with `df` under the swap protocol. */
  def swapWrite(df: DataFrame, path: String): Unit = {
    val s = df.sparkSession
    val (f, live) = fs(s, path)
    val tmp = tmpPath(path)
    val prev = prevPath(path)
    df.write.mode("overwrite").parquet(tmp.toString) // step 1: full write
    if (f.exists(live)) {
      if (f.exists(prev)) f.delete(prev, true) // stale from a post-promote crash
      require(f.rename(live, prev), s"sketch swap: retire $live -> $prev failed")
    }
    require(f.rename(tmp, live), s"sketch swap: promote $tmp -> $live failed")
    if (f.exists(prev)) f.delete(prev, true)
  }
}
