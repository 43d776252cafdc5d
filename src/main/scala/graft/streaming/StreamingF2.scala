package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.F2Sketch

/** Streaming AMS F2 sketch — the unbounded-stream form of
  * [[graft.operators.F2Sketch.f2Cells]]: each micro-batch's 96 estimator
  * sums fold into a lake-resident sketch by ESTIMATOR-WISE SUM (the
  * spec-pinned linear merge law: Z_i(A ⊎ B) = Z_i(A) + Z_i(B), because
  * every occurrence of a key value draws the same md5 sign on any engine/
  * batch/retry). The accumulated state is therefore ROW-IDENTICAL to the
  * batch sketch of everything ingested so far — an exact streaming
  * operator in 96 longs of state, answering the running self-join-size /
  * repetition-skew question ([[graft.operators.F2Sketch]] scaladoc) at
  * any point in the stream without retaining a token of text.
  *
  * This is the FIFTH member of the streaming-guard contrast family, and
  * it sits on the GUARDED side with [[StreamingCms]]: a linear fold is
  * NOT idempotent by content (an at-least-once foreachBatch replay would
  * double every Z and inflate F2 ≈ 4×), so the fold carries the same
  * `_bid` replay guard — batches whose id is ≤ the stored one are
  * skipped — while HLL's register max ([[StreamingHll]]), the quantile
  * sketch's distinct union ([[StreamingQuantile]]), and the Bloom
  * filter's bitwise OR ([[StreamingBloom]]) need no guard at all.
  * Writes go through the [[SketchStore]] swap protocol, so there is no
  * window where a partial cell table carries the new `_bid`. */
object StreamingF2 {

  /** Fold one micro-batch's token stream into the sketch at `sketchPath` —
    * IDEMPOTENT per batchId (replaying an applied id is a no-op).
    * Exposed so the replay spec can drive it directly. */
  private[graft] def foldBatch(batch: DataFrame, batchId: Long,
                               sketchPath: String): Unit = {
    val s = batch.sparkSession
    val toks = batch
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
    // Empty first micro-batch guard: f2Cells' global agg over zero tokens
    // emits 96 NULL-z rows, which would seed the sketch with NULLs and make
    // estimate()'s median-of-means element_at go out of range under ANSI.
    // A token-free batch is a content no-op for a linear fold — skip it.
    if (toks.isEmpty) return
    val bs = F2Sketch.f2Cells(toks, Seq.empty, "t")
      .withColumn("_bid", lit(batchId))
    val merged =
      if (SketchStore.exists(s, sketchPath)) {
        val prior = s.read.parquet(sketchPath)
        // bounded driver pull: one MAX over the 96-row sketch
        val lastApplied = Option(prior.agg(max(col("_bid"))).first().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)
        if (batchId <= lastApplied) return // replayed batch: already folded
        prior.unionByName(bs)
          .groupBy(col("_e")).agg(sum(col("z")).as("z"))
          .withColumn("_bid", lit(batchId))
      } else bs
    SketchStore.swapWrite(merged, sketchPath)
  }

  /** Current F2 estimate from the lake sketch — the batch median-of-means
    * tail over the accumulated cells. One row (f2_est). */
  def estimate(spark: SparkSession, sketchPath: String): DataFrame =
    F2Sketch.f2EstimateFromCells(
      spark.read.parquet(sketchPath).select(col("_e"), col("z")), Seq.empty)

  /** Start the sketch consumer over a watched directory of
    * [[StreamingDedup.Doc]] parquet files; the running sketch lives at
    * `outRoot/sketch` as (_e, z, _bid) parquet. */
  def run(spark: SparkSession, watchDir: String, outRoot: String): StreamingQuery = {
    val sketchPath = s"$outRoot/sketch"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[StreamingDedup.Doc].schema)
      .parquet(watchDir)
    stream.writeStream
      .option("checkpointLocation", s"$outRoot/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, sketchPath)
      }
      .start()
  }
}
