package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.{Quality, Star}
import graft.sources.Retry

/** Continuous variant of `graft.Pipeline.runAll` — the reference's broker
  * consumer as a long-running flow (etl/broker/consumer.py's drain loop +
  * STEP3's quality split applied per micro-batch):
  *
  *   watched dir (FileStreamSource = the queue) →
  *     raw zone (staged metadata, append) +
  *     watermarked exact dedup → quality rule split → clean/error zones +
  *     an INCREMENTALLY UPSERTED latest-state table (newest row per key via
  *     `Star.upsertLatest` in `foreachBatch` — the staging-reload primitive
  *     applied continuously).
  *
  * Every sink is checkpointed, so the pipeline resumes exactly-once after a
  * restart (file source offsets + sink commit log). The state upsert
  * detaches the existing table from its files (`localCheckpoint`) before
  * overwriting — the swap a transactional table format (Delta/Iceberg)
  * would make atomic in a production deployment; the MERGE semantics
  * (union + keep-newest per key) are exactly `Star.upsertLatest`.
  */
object StreamingPipeline {

  final case class Sinks(raw: StreamingQuery, clean: StreamingQuery,
                         error: StreamingQuery, state: StreamingQuery) {
    def all: Seq[StreamingQuery] = Seq(raw, clean, error, state)
    def drain(): Unit = all.foreach(_.processAllAvailable())
    def stop(): Unit = all.foreach(_.stop())
  }

  /** Start the four sinks over a watched directory of event files.
    * `stateKey`/`stateVersion`/`stateTieBreak` configure the latest-state
    * upsert (defaults: newest event per user). */
  def run(spark: SparkSession, watchDir: String, outRoot: String,
          rules: Seq[Quality.Rule], runId: String,
          stateKey: String = "user_id", stateVersion: String = "ts",
          stateTieBreak: String = "event_id"): Sinks = {
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[EventStreaming.Event].schema)
      .parquet(watchDir)

    // Sink STARTUP (checkpoint dir probe, offset-log recovery, first source
    // listing) is driver-side work Spark's task retry does not cover — the
    // same exposure as the reference's broker connect, so it takes the same
    // bounded-retry treatment (etl/utils/retry.py wraps consumer startup).
    // start() is idempotent-safe to retry: a failed start leaves no running
    // query behind.
    def startRetrying(label: String)(start: => StreamingQuery): StreamingQuery =
      Retry.withRetry(label = s"stream_start:$label")(start)

    val raw = startRetrying("raw") {
      EventStreaming.toRawZone(stream, s"$outRoot/raw", s"$outRoot/cp_raw",
        "dirq", runId)
    }

    val deduped = EventStreaming.dedupStream(stream)
    val (clean, err) = EventStreaming.qualityZones(deduped, rules)
    val cleanQ = startRetrying("clean") {
      clean.writeStream.format("parquet")
        .option("path", s"$outRoot/clean").option("checkpointLocation", s"$outRoot/cp_clean")
        .outputMode(OutputMode.Append).start()
    }
    val errQ = startRetrying("error") {
      err.writeStream.format("parquet")
        .option("path", s"$outRoot/error").option("checkpointLocation", s"$outRoot/cp_error")
        .outputMode(OutputMode.Append).start()
    }

    val statePath = s"$outRoot/state"
    val stateQ = startRetrying("state") { clean.writeStream
      .option("checkpointLocation", s"$outRoot/cp_state")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing =
          if (new java.io.File(statePath).exists())
            // detach from the files about to be overwritten (bounded: the
            // state table holds one row per key)
            Some(spark.read.parquet(statePath).localCheckpoint())
          else None
        val merged = existing match {
          case Some(e) => Star.upsertLatest(e, batch, stateKey, stateVersion, stateTieBreak)
          case None => Star.upsertLatest(batch.limit(0), batch, stateKey, stateVersion, stateTieBreak)
        }
        merged.write.mode("overwrite").parquet(statePath)
      }
      .start()
    }

    Sinks(raw, cleanQ, errQ, stateQ)
  }
}
