package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.BloomSketch

/** Streaming Bloom filter — the unbounded-stream form of
  * [[graft.operators.BloomSketch]]: each micro-batch's word table folds
  * into a lake-resident filter by word-wise BITWISE OR, so the
  * accumulated filter is row-identical to the batch filter of everything
  * ingested so far, in ≤ m/32 rows of state at any stream size — the
  * incremental decontamination gate (new benchmark/blocklist keys arrive;
  * the training-side probe keeps reading one broadcastable table).
  *
  * Failure semantics — the FOURTH member of the streaming-guard contrast
  * family: CMS sums need the `_bid` replay guard (sums double-count),
  * HLL maxes are idempotent by content, the quantile sketch's fold is
  * idempotent through its distinct, and OR is idempotent ALGEBRAICALLY
  * (x | x = x) — a replayed batch re-ORs the same bits into a no-op, so
  * no batch-id bookkeeping is needed. Writes still go through the
  * [[SketchStore]] swap protocol: a crash MID-overwrite could otherwise
  * lose words of the prior filter (the ADVICE r15 window). */
object StreamingBloom {

  /** Fold one micro-batch's keys into the word table at `sketchPath` —
    * idempotent by OR, no replay bookkeeping. Exposed for the replay
    * spec. */
  private[graft] def foldBatch(batch: DataFrame, keyCol: String,
                               sketchPath: String): Unit = {
    val s = batch.sparkSession
    val bw = BloomSketch.bloomWords(batch, keyCol)
    val merged =
      if (SketchStore.exists(s, sketchPath))
        BloomSketch.merge(s.read.parquet(sketchPath), bw)
      else bw
    SketchStore.swapWrite(merged, sketchPath)
  }

  /** Start the membership-filter consumer over a watched directory of
    * [[StreamingDedup.Doc]] parquet files; the running word table lives
    * at `outRoot/sketch` as (widx, bits) parquet — probe it at any time
    * with [[graft.operators.BloomSketch.bloomProbe]]. */
  def run(spark: SparkSession, watchDir: String, outRoot: String): StreamingQuery = {
    val sketchPath = s"$outRoot/sketch"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[StreamingDedup.Doc].schema)
      .parquet(watchDir)
    stream.writeStream
      .option("checkpointLocation", s"$outRoot/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        foldBatch(batch, "text", sketchPath)
      }
      .start()
  }
}
