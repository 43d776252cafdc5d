package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming Count-Min Sketch — the unbounded-stream form of
  * [[graft.operators.TextAnalysis.cmsSketch]]: each micro-batch's cell
  * table folds into a lake-resident sketch by CELL-WISE SUM. Because the
  * merge law is exact (cells are counts — the spec-pinned property of the
  * batch operator), the accumulated sketch is ROW-IDENTICAL to the batch
  * sketch of everything ingested so far: an exact streaming operator, not
  * an approximation of one, and the state is ≤ depth×width rows no matter
  * how much text has streamed past (the token streams themselves are
  * never retained). Point queries read the sketch dir at any time with
  * the usual min-over-rows estimate and one-sided overcount bound.
  *
  * Failure semantics: foreachBatch is AT-LEAST-ONCE (a crash between the
  * sketch write and the checkpoint commit replays the batch), and
  * cell-wise sum is not idempotent by content — so the fold carries its
  * own replay guard: every sketch row records the last-applied `_bid`,
  * and a batch whose id is ≤ the stored one is SKIPPED. Guard and cells
  * land in one [[SketchStore]] swap-write (full write to a temp dir, then
  * atomic renames — never a delete-then-write over the live dir), so
  * every crash point resolves to exactly-once: crash before the promote
  * rolls back to the complete prior sketch and re-folds, crash after it
  * replays into a bid-guarded skip. There is no window where a PARTIAL
  * cell table carries the new `_bid` (the ADVICE r15 overwrite hazard). */
object StreamingCms {

  /** Fold one micro-batch into the sketch at `sketchPath` — IDEMPOTENT per
    * batchId: replaying an already-applied id is a no-op (the
    * StreamingDedup replay discipline, adapted to non-idempotent sums).
    * Exposed so the replay spec can drive it directly. */
  private[graft] def foldBatch(batch: DataFrame, batchId: Long,
                               sketchPath: String, depth: Int, width: Int): Unit = {
    val s = batch.sparkSession
    val bs = TextAnalysis.cmsSketch(batch, "text", depth, width)
      .withColumn("_bid", lit(batchId))
    val merged =
      if (SketchStore.exists(s, sketchPath)) {
        val prior = s.read.parquet(sketchPath)
        // bounded driver pull: one MAX over the ≤ depth×width-row sketch
        // (null when a prior batch was empty → nothing applied yet)
        val lastApplied = Option(prior.agg(max(col("_bid"))).first().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)
        if (batchId <= lastApplied) return // replayed batch: already folded
        prior.unionByName(bs)
          .groupBy(col("_r"), col("_b")).agg(sum(col("_cell")).as("_cell"))
          .withColumn("_bid", lit(batchId))
      } else bs
    SketchStore.swapWrite(merged, sketchPath)
  }

  /** Start the sketch consumer over a watched directory of
    * [[StreamingDedup.Doc]] parquet files; the running sketch lives at
    * `outRoot/sketch` as (_r, _b, _cell, _bid) parquet. */
  def run(spark: SparkSession, watchDir: String, outRoot: String,
          depth: Int = 4, width: Int = 1024): StreamingQuery = {
    val sketchPath = s"$outRoot/sketch"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[StreamingDedup.Doc].schema)
      .parquet(watchDir)
    stream.writeStream
      .option("checkpointLocation", s"$outRoot/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, sketchPath, depth, width)
      }
      .start()
  }
}
