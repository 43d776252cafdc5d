package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema DWH build: dimension tables with deterministic surrogate keys,
  * a generated date dimension, SCD Type 2 history, and fact construction via
  * broadcast dimension-key lookups.
  *
  * Re-expresses sql/create_dwh_tables.sql (4 dims + dim_date + facts;
  * dim_khach_hang is SCD2 with valid_from/valid_to/is_current) and
  * STEP4_TRANSFORM_LOAD.py:441's transform-and-load.
  *
  * Scale design: dimensions are small relative to facts, so every fact-to-dim
  * lookup is a `broadcast()` hash join — a 100 TB fact must never sort-merge
  * against a 10 MB dim. Surrogate keys are dense ranks of the natural key
  * computed with a TWO-PHASE rank: range-repartition the distinct keys,
  * `row_number` within each partition, then add broadcast per-partition
  * offsets. No single-partition global window anywhere — a billion-row
  * dimension ranks with the parallelism of `spark.sql.shuffle.partitions`.
  */
object Star {

  /** Attach a deterministic surrogate key: the dense rank of the natural key,
    * 1..N in natural-key order (create_dwh_tables.sql:22 IDENTITY analog).
    *
    * Two-phase rank: (1) distinct keys are range-partitioned on the key, so
    * partition i holds a contiguous key range and partitions are
    * sample-balanced; (2) `row_number` ranks within each partition (the
    * window is partitioned — no `WindowExec: No Partition Defined`); (3)
    * per-partition counts (one tiny row per partition) are prefix-summed and
    * broadcast back, making the global rank `offset(partition) + local rank`.
    * The result is invariant to where the range boundaries fall, because the
    * offsets are computed from the actual per-partition counts. The only
    * global window runs over `numPartitions` count rows, never over data.
    */
  def withSurrogateKey(dim: DataFrame, naturalKey: String, keyName: String): DataFrame = {
    val nk = col(naturalKey)
    val keys = dim.select(nk).distinct()
      .repartitionByRange(nk)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_rn", row_number().over(Window.partitionBy(col("_pid")).orderBy(nk)))
    // Prefix-sum of per-partition counts via a triangular self-join over the
    // (numPartitions)-row count table — not a global window, so the whole
    // plan is free of unpartitioned WindowExec (asserted by StarEventsSpec).
    val counts = keys.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._cnt")), lit(0L)).as("_offset"))
    val ranked = keys.join(broadcast(offsets), "_pid")
      .select(nk, (col("_offset") + col("_rn")).cast("long").as(keyName))
    // Joining the ranks back is only needed when the dim carries attributes
    // beyond the key (or duplicate key rows, which share a rank like
    // dense_rank); a bare key table IS the ranked table.
    if (dim.columns.toSeq == Seq(naturalKey)) ranked
    else dim.join(ranked, Seq(naturalKey))
  }

  /** Date dimension derived from a date-typed column's domain
    * (create_dwh_tables.sql:108-125). date_key = yyyymmdd; ISO day-of-week. */
  def dimDate(src: DataFrame, dateCol: String): DataFrame = {
    val d = col("full_date")
    src.select(col(dateCol).cast("date").as("full_date")).distinct()
      .select(
        (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).as("date_key"),
        d.as("full_date"),
        (weekday(d) + 1).as("iso_dow"),
        date_format(d, "EEEE").as("day_name"),
        dayofmonth(d).as("day_of_month"),
        dayofyear(d).as("day_of_year"),
        weekofyear(d).as("week_of_year"),
        month(d).as("month"),
        date_format(d, "MMMM").as("month_name"),
        quarter(d).as("quarter"),
        year(d).as("year"),
        (weekday(d) + 1 >= 6).as("is_weekend"))
  }

  /** Resolve a fact's natural FK to a dim surrogate key with a broadcast
    * join (STEP4_TRANSFORM_LOAD.py fact lookup; left join keeps facts with
    * missing dims — surrogate key NULL, the late-arriving-dimension case). */
  def lookupDim(fact: DataFrame, dim: DataFrame, naturalKey: String, surrogateKey: String): DataFrame =
    fact.join(broadcast(dim.select(col(naturalKey), col(surrogateKey))), Seq(naturalKey), "left")

  /** Write a fact table partitioned by its date key — the layout that makes
    * partition pruning work at 100 TB (a date-ranged query reads only its
    * partitions; `.explain` shows PartitionFilters). Pair with
    * `sortWithinPartitions` on the join key so downstream bucketed readers
    * get clustered data. */
  def writeFactPartitioned(fact: DataFrame, path: String, dateKeyCol: String,
                           sortCol: String): Unit =
    fact.repartition(col(dateKeyCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite")
      .partitionBy(dateKeyCol)
      .parquet(path)

  /** Upsert-latest merge: union of the existing table and an updates batch,
    * keeping only the newest version per business key (version ordered by
    * `versionCol` desc, deterministic tie-break). The incremental-load
    * primitive for fact/staging tables (STEP4's repeated staging loads) —
    * one shuffle on the key, no driver state. */
  def upsertLatest(existing: DataFrame, updates: DataFrame, key: String,
                   versionCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col(tieBreak).desc)
    existing.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** SCD Type 2 merge of timestamped snapshots
    * (create_dwh_tables.sql:21-41 valid_from/valid_to/is_current).
    *
    * Input: union of snapshots, each row carrying `snapCol` (snapshot date).
    * Rows whose tracked attributes are unchanged vs the key's previous
    * snapshot are dropped; survivors get validity intervals via `lead`.
    * One shuffle on the business key; no driver-side state.
    */
  def scd2(snapshots: DataFrame, key: String, attrs: Seq[String], snapCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(snapCol))
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val versions = snapshots
      .withColumn("_first", lag(col(snapCol), 1).over(w).isNull)
      .withColumn("_changed", changed)
      .where(col("_first") || col("_changed"))
      .drop("_first", "_changed")
    val w2 = Window.partitionBy(col(key)).orderBy(col(snapCol))
    versions
      .withColumn("valid_from", col(snapCol))
      .withColumn("valid_to", lead(col(snapCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(snapCol)
  }
}
