package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse analytics operators beyond plain groupBy: top-N per group,
  * hierarchical rollups, as-of (most-recent-prior) joins, and skew-safe
  * two-stage aggregation.
  *
  * Scale notes: top-N windows partition on the group key (never global);
  * rollup is Spark's native grouping-sets operator (one shuffle, partial
  * aggs); the as-of join here is the self-table window form — one shuffle
  * on the partition key; salted aggregation splits hot keys across
  * `saltBuckets` partial groups before the final combine, the standard
  * fix when one key dominates a 100 TB aggregation.
  */
object Analytics {

  /** Top `n` rows per group by `order` (descending), deterministic
    * tie-break on `tieBreak`. */
  def topNPerGroup(df: DataFrame, groupCols: Seq[Column], order: Column,
                   tieBreak: Column, n: Int): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(groupCols: _*).orderBy(order.desc, tieBreak)))
      .where(col("rn") <= n)

  /** ROLLUP aggregation: subtotals at every prefix level of `dims` plus the
    * grand total (NULL-filled dimension columns mark subtotal rows). */
  def rollupAgg(df: DataFrame, dims: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.rollup(dims: _*).agg(aggs.head, aggs.tail: _*)

  /** As-of self-join via window: for every row, the most recent prior value
    * of `valueCol` among rows matching `condition`, within the same
    * `partition`, ordered by (`order`, `tieBreak`). Strictly prior (the
    * current row is excluded). */
  def asOfPrior(df: DataFrame, partition: Column, order: Column, tieBreak: Column,
                condition: Column, valueCol: Column, outName: String): DataFrame =
    df.withColumn(outName,
      max(when(condition, valueCol)).over(
        Window.partitionBy(partition).orderBy(order, tieBreak)
          .rowsBetween(Window.unboundedPreceding, -1)))

  /** Range (point-in-interval) join via bucket explosion — the scale-safe
    * form of `points JOIN intervals ON p BETWEEN s AND e`. A plain theta
    * join is a broadcast-nested-loop (O(n*m)); here each interval is
    * exploded into the fixed-width buckets it spans, each point computes its
    * single bucket, and the join is a hash equijoin on (keys..., bucket)
    * followed by the precise BETWEEN filter. A point's single bucket meets
    * each overlapping interval exactly once, so no dedup is needed. Choose
    * `bucketSec` near the typical interval length: wider buckets = fewer
    * exploded rows, more false candidates for the filter. */
  /** Per-group z-score anomaly flags — the monitoring upgrade over plain
    * zone counts (dashboard.py's stats, made actionable): each row's value
    * is scored against its group's mean/stddev in one partitioned window
    * pass; constant groups (stddev 0) get a null score, never a
    * divide-by-zero. Flags derive from the ROUNDED score so the boundary
    * behaves identically in any engine. */
  def zScoreAnomalies(df: DataFrame, keyCols: Seq[Column], valueCol: Column,
                      threshold: Double): DataFrame = {
    val w = Window.partitionBy(keyCols: _*)
    val sd = stddev_pop(valueCol).over(w)
    val z = round((valueCol - avg(valueCol).over(w)) /
      when(sd === 0.0, lit(null)).otherwise(sd), 6)
    df.withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold, lit(false)))
  }

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointTs: Column, startTs: Column, endTs: Column,
                keys: Seq[String], bucketSec: Long): DataFrame = {
    val b = lit(bucketSec.toDouble)
    val ivals = intervals.withColumn("_bucket",
      explode(sequence(floor(startTs.cast("double") / b).cast("long"),
        floor(endTs.cast("double") / b).cast("long"))))
    val pts = points.withColumn("_bucket",
      floor(pointTs.cast("double") / b).cast("long"))
    pts.join(ivals, keys :+ "_bucket")
      .where(pointTs.cast("double").between(startTs.cast("double"), endTs.cast("double")))
      .drop("_bucket")
  }

  /** Skew-safe aggregation: partial-aggregate on (key, salt) where salt is a
    * deterministic hash of `saltSource`, then combine per key. Semantically
    * identical to a direct groupBy(key).agg(count, sum...) for the supported
    * aggregates; the salt stage bounds any single reducer's share of a hot
    * key to ~1/saltBuckets. */
  def saltedSumCount(df: DataFrame, key: Column, keyName: String,
                     value: Column, saltSource: Column, saltBuckets: Int): DataFrame =
    df.groupBy(key.as(keyName), pmod(xxhash64(saltSource), lit(saltBuckets)).as("_salt"))
      .agg(count(lit(1)).as("_n"), sum(value).as("_s"))
      .groupBy(col(keyName))
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as("sum_value"))
}
