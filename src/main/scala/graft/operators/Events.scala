package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics: type routing, gap-based sessionization, and
  * tumbling-window aggregation.
  *
  * Batch re-expression of the reference's broker flow (etl/broker/producer.py
  * routes each entity to its own queue; consumer.py drains queues to the raw
  * zone) — routing becomes a keyed aggregation / partitioned write, and the
  * natural Spark upgrade is sessionization + windowed aggregation over the
  * event stream. The streaming path (readStream/watermark) lives in
  * graft.streaming.EventStreaming.
  *
  * Scale design: both sessionization windows and groupBys key on
  * `user_id`/`event_type` — high-cardinality partition keys, no global
  * windows, single shuffle each.
  */
object Events {

  /** Per-type routing stats (producer.py's queue fan-out as an aggregation). */
  def routeStats(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        // decimal-exact sum, surfaced as double (deterministic across engines)
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  /** Gap-based sessionization: a new session starts after `gapSec` of
    * inactivity. lag + running sum over (user, time) — the standard
    * distributed sessionization; one shuffle on user_id. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isNew = prevTs.isNull ||
      (col("ts").cast("double") - prevTs.cast("double") > gapSec.toDouble)
    events
      .withColumn("_new_session", isNew.cast("int"))
      .withColumn("session_id",
        sum(col("_new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
  }

  /** Tumbling-window aggregation (batch analog of the streaming windowed
    * aggs): per (hour, event_type) counts/sums. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
}
