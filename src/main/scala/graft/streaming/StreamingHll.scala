package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming HyperLogLog — the unbounded-stream form of
  * [[graft.operators.TextAnalysis.hllRegisters]]: each micro-batch's
  * register table folds into a lake-resident sketch by REGISTER-WISE MAX.
  * Because the merge law is max (spec-pinned on the batch operator), the
  * accumulated sketch is ROW-IDENTICAL to the batch sketch of everything
  * ingested so far, in ≤ 256 rows of state at any stream size.
  *
  * Failure semantics — the instructive contrast with [[StreamingCms]]:
  * foreachBatch is AT-LEAST-ONCE there too, but max is IDEMPOTENT BY
  * CONTENT (re-maxing the same batch's registers changes nothing), so
  * this fold needs NO batch-id replay guard — a crash between the sketch
  * overwrite and the checkpoint commit replays the batch into a no-op.
  * CMS cells are sums (not idempotent) and carry the `_bid` guard;
  * HLL registers are maxes and don't have to. */
object StreamingHll {

  /** Fold one micro-batch into the register table at `sketchPath` —
    * idempotent by CONTENT (max-merge), no replay bookkeeping needed.
    * Written under the [[SketchStore]] swap protocol: even though a
    * replayed max-merge is harmless, a crash MID-overwrite could still
    * lose registers of the prior sketch (delete-then-write) — the swap
    * write closes that window here too (ADVICE r15).
    * Exposed so the replay spec can drive it directly. */
  private[graft] def foldBatch(batch: DataFrame, sketchPath: String): Unit = {
    val s = batch.sparkSession
    val bs = TextAnalysis.hllRegisters(batch, "text")
    val merged =
      if (SketchStore.exists(s, sketchPath))
        s.read.parquet(sketchPath).unionByName(bs)
          .groupBy(col("bucket")).agg(max(col("r")).cast("int").as("r"))
      else bs
    SketchStore.swapWrite(merged, sketchPath)
  }

  /** Start the cardinality-sketch consumer over a watched directory of
    * [[StreamingDedup.Doc]] parquet files; the running register table
    * lives at `outRoot/sketch` as (bucket, r) parquet — read it at any
    * time and estimate with the usual α·m²/Σ2^(−r) formula. */
  def run(spark: SparkSession, watchDir: String, outRoot: String): StreamingQuery = {
    val sketchPath = s"$outRoot/sketch"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[StreamingDedup.Doc].schema)
      .parquet(watchDir)
    stream.writeStream
      .option("checkpointLocation", s"$outRoot/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        foldBatch(batch, sketchPath)
      }
      .start()
  }
}
