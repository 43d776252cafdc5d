package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column data-skipping layout: Z-order (Morton) clustering — the
  * open-lakehouse `OPTIMIZE ZORDER BY` capability (Delta/Iceberg), built
  * from plain Spark primitives. No analog exists in the reference tree
  * (its loads are insert-ordered); this is a scale capability a 100 TB
  * store needs: parquet/ORC readers skip files and row groups by
  * column min/max statistics, and a single-column sort only tightens ONE
  * column's per-file ranges — a predicate on any other column still reads
  * everything. Interleaving the bits of k normalized columns gives every
  * file a tight bounding box in ALL k dimensions at once, so selective
  * predicates on ANY clustered column (or box predicates on several)
  * prune to ~the files whose box intersects.
  *
  * Scale design: one aggregation pass computes the per-column min/max
  * (1-row broadcast join — the audited stats-join shape), the z-value is
  * a pure codegen'd integer projection (no UDF, no shuffle), and the
  * clustered write is `repartitionByRange` on the z-value (sampling
  * range-partitioner: targetFiles ranges) + `sortWithinPartitions` — so
  * the whole relayout is one stats pass + one range shuffle, identical to
  * what a cluster-scale OPTIMIZE job runs. The z-VALUE is deterministic
  * integer arithmetic ((v-min)*(2^bits-1) // max(range,1), bit
  * interleave) and therefore DuckDB-replayable; the range boundaries of
  * the physical relayout come from Spark's sampling RangePartitioner
  * (seeded per RDD id), so rerun FILE CUTS may shift within sampling
  * tolerance — the row set, the z-values, and the pruning property are
  * stable, the exact file boundaries are not, the same contract
  * industrial OPTIMIZE ZORDER implementations ship with.
  *
  * Bounds: integral columns only (exact bucketing; float domains need a
  * quantization policy this operator deliberately does not invent), and
  * per-column range × (2^bits − 1) must stay under 2^63 (ANSI mode fails
  * loudly past it — at bits=16 that admits ranges to ~1.4e14, far past
  * any surrogate/key domain this engine emits).
  */
object Layout {

  /** Per-column bucket ids: (v − min) × (2^bits − 1) ÷ max(range, 1) —
    * exact BIGINT arithmetic, constant columns all land in bucket 0.
    * Returns the input columns plus `_zb_<col>` bucket columns and the
    * interleaved `zval`. `bits` capped at 20 so k×bits stays well inside
    * a signed 64-bit z-value for k ≤ 3. */
  def zorderValues(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty && cols.size <= 3, s"zorder takes 1-3 columns, got ${cols.size}")
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq("byte", "short", "int", "integer", "long", "bigint")
        .contains(dt.typeName.toLowerCase) || dt.typeName.startsWith("int"),
        s"zorder clusters integral columns only; $c is ${dt.typeName}")
    }
    val maxBucket = (1L << bits) - 1
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"_mn_$c"), max(col(c)).cast("long").as(s"_mx_$c")))
    // 1-row broadcast stats join (the audited crossJoin shape): bounds are
    // derived from the data itself so the operator needs no catalog input
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val withBuckets = cols.zipWithIndex.foldLeft(df.crossJoin(broadcast(bounds))) {
      case (acc, (c, i)) =>
        // EXACT integral floor-division (Column `/` is double division and
        // would round large products): scaled numerator and range land in
        // named temp columns so the SQL `DIV` operator applies — the same
        // `//` arithmetic the DuckDB oracle runs, term-for-term
        acc.withColumn(s"_graft_zn_$i", (col(c).cast("long") - col(s"_mn_$c")) * maxBucket)
          .withColumn(s"_graft_zr_$i", greatest(col(s"_mx_$c") - col(s"_mn_$c"), lit(1L)))
          .withColumn(s"_zb_$c", expr(s"_graft_zn_$i DIV _graft_zr_$i"))
    }
    withBuckets
      .withColumn("zval", interleave(cols.map(c => col(s"_zb_$c")), bits))
      .drop(cols.flatMap(c => Seq(s"_mn_$c", s"_mx_$c")): _*)
      .drop(cols.indices.flatMap(i => Seq(s"_graft_zn_$i", s"_graft_zr_$i")): _*)
  }

  /** Bit interleave of k bucket columns, column-major within each bit
    * position: output bit (j·k + i) = bit j of column i. Expanded to an
    * explicit shift/mask sum — k·bits codegen'd integer ops, and the SAME
    * term list the DuckDB oracle generates, so engine parity is
    * term-for-term by construction. */
  private[graft] def interleave(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    val terms = for {
      j <- 0 until bits
      i <- 0 until k
    } yield shiftleft(shiftright(buckets(i), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` at `path` clustered by the z-value of `cols`:
    * `targetFiles` range partitions of contiguous z-runs, each sorted, so
    * every output file carries a tight min/max box in all clustered
    * columns. The z columns are dropped before writing — the layout is a
    * physical property, not schema. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    targetFiles: Int, bits: Int = 16): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    zorderValues(df, cols, bits)
      .repartitionByRange(targetFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .drop(cols.map(c => s"_zb_$c"): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed co-located layout — the SHUFFLE-FREE-JOIN storage shape
    * (Hive/Spark bucketing): rows hash into `numBuckets` files per
    * partition by `keys`, recorded in the catalog, so a join or
    * aggregation on those keys reads each bucket as an already-hash-
    * partitioned split and plans NO Exchange on that side. The Z-order
    * sibling above optimizes PREDICATE pruning; this one optimizes JOIN
    * co-location — together they are the two storage-layout levers a
    * 100 TB star/corpus store tunes. Two tables bucketed the same way
    * (same keys, same count) join with zero shuffle on both sides — the
    * fact⋈fact edge (orders⋈lineitem) that at petabyte scale is THE
    * dominant exchange. `sortCols` adds within-bucket ordering
    * (`sortBy`), letting sort-merge joins skip their sorts too.
    *
    * Catalog-backed by necessity: bucket metadata lives in the table
    * catalog (`saveAsTable` — Spark's bucketBy contract), so callers
    * address the layout by table name, not path. The bucket function is
    * Spark's internal key hash — opaque to other engines by design,
    * which is why this operator is spec-verified (plan-shape + row
    * parity) rather than value-oracled: there is nothing engine-portable
    * to oracle, the LAYOUT is the deliverable. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one key column")
    require(numBuckets >= 1 && numBuckets <= 100000,
      s"numBuckets must be in [1,100000], got $numBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Per-file min/max bounding boxes of `cols` under `path` — the
    * statistics a data-skipping reader consults, surfaced as a DataFrame
    * so layouts are auditable (and testable) without parsing footers. One
    * scan, grouped by `input_file_name`. */
  def fileBoxes(spark: org.apache.spark.sql.SparkSession, path: String,
                cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"min_$c"), max(col(c)).cast("long").as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
