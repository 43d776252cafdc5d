package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.QuantileSketch

/** Streaming mergeable quantile sketch — the unbounded-stream form of
  * [[graft.operators.QuantileSketch]]: each micro-batch's ≤ k-row survivor
  * table folds into a lake-resident sketch by the EXACT merge law
  * (distinct-union + re-threshold), so the accumulated state is
  * row-identical to the batch sketch of everything ingested so far, in
  * ≤ k rows at any stream size.
  *
  * Failure semantics — the THIRD member of the streaming-sketch guard
  * family: [[StreamingCms]] cell sums are not idempotent and carry a
  * `_bid` replay guard; [[StreamingHll]] register maxes are idempotent by
  * content and need none; this fold is idempotent by CONTENT through the
  * merge's distinct on (v60, value) — an at-least-once foreachBatch
  * replay re-unions the same survivor rows into a no-op — so, like HLL,
  * it needs NO batch-id bookkeeping. Requires unique row keys (the
  * md5-coin source); two genuinely distinct rows colliding on
  * (v60, value) is the documented ~2^−60 jitter. Writes go through the
  * [[SketchStore]] swap protocol (no partial-overwrite window). */
object StreamingQuantile {

  /** Fold one micro-batch into the sketch at `sketchPath`. Exposed so the
    * replay/parity spec can drive it directly. */
  private[graft] def foldBatch(batch: DataFrame, sketchPath: String,
                               keyCol: String, valueCol: String, k: Int): Unit = {
    val s = batch.sparkSession
    val bs = QuantileSketch.sketch(batch, keyCol, valueCol, k)
    val merged =
      if (SketchStore.exists(s, sketchPath))
        QuantileSketch.merge(s.read.parquet(sketchPath), bs, k)
      else bs
    SketchStore.swapWrite(merged, sketchPath)
  }

  /** Start the quantile-sketch consumer over a watched directory of
    * [[StreamingDedup.Doc]] parquet files (value = document length in
    * characters); the running sketch lives at `outRoot/sketch` as
    * (level, v60, value) parquet — read it at any time and take survivor
    * order statistics. */
  def run(spark: SparkSession, watchDir: String, outRoot: String,
          k: Int = 64): StreamingQuery = {
    val sketchPath = s"$outRoot/sketch"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[StreamingDedup.Doc].schema)
      .parquet(watchDir)
      .selectExpr("doc_id", "length(text) AS n_chars")
    stream.writeStream
      .option("checkpointLocation", s"$outRoot/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        foldBatch(batch, sketchPath, "doc_id", "n_chars", k)
      }
      .start()
  }
}
