package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Ckpt.CkptOps

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

  /** CUBE aggregation: subtotals at EVERY subset of `dims` (2^n grouping
    * sets), the full cross-tab a dashboard slices from. Like rollup this is
    * Spark's native grouping-sets operator — a single Expand + one shuffle
    * with map-side partial aggregation, not 2^n passes over the fact. */
  def cubeAgg(df: DataFrame, dims: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.cube(dims: _*).agg(aggs.head, aggs.tail: _*)

  /** Winsorize: clamp `value` into its group's [lo, hi] quantile range —
    * the standard robust-stats outlier treatment before training-data or
    * revenue aggregation. Group percentiles are computed in one aggregation
    * pass and broadcast back onto the rows, so the fact table is scanned
    * once and never shuffled (group count is bounded — percentile tables
    * are dimension-sized).
    *
    * Two percentile paths, pick per deployment:
    *  - `approx = false` (default): Spark's EXACT interpolated `percentile`.
    *    Bit-matches any SQL engine's exact percentile (the oracle path),
    *    but the aggregation buffer holds EVERY group value — fine when
    *    groups are modest, OOM territory when one group spans a 100 TB
    *    fact.
    *  - `approx = true`: `approx_percentile` (Greenwald-Khanna sketch,
    *    `accuracy` controls the error bound ~1/accuracy). Constant-memory
    *    per group and mergeable map-side — the 100 TB path. Clamp bounds
    *    may differ from exact by the sketch error; rows clamp to slightly
    *    different edges, never wrongly dropped. */
  def winsorize(df: DataFrame, groupCols: Seq[Column], value: Column,
                lo: Double, hi: Double, outName: String,
                approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val names = groupCols.zipWithIndex.map { case (_, i) => s"_g$i" }
    val keyed = groupCols.zip(names).map { case (c, n) => c.as(n) }
    def pctl(p: Double): Column =
      if (approx) approx_percentile(value, lit(p), lit(accuracy)).cast("double")
      else percentile(value, lit(p))
    val exact = df.groupBy(keyed: _*).agg(
      pctl(lo).as("_lo"),
      pctl(hi).as("_hi"))
    // null-safe LEFT join: a NULL group key still matches its own bounds row
    // (groupBy keeps a null group), and a row with no bounds row passes
    // through unclamped instead of being silently dropped.
    df.join(broadcast(exact),
        groupCols.zip(names).map { case (c, n) => c <=> col(n) }.reduce(_ && _),
        "left")
      .withColumn(outName,
        round(greatest(coalesce(col("_lo"), value),
          least(coalesce(col("_hi"), value), value)), 6))
      .drop((names ++ Seq("_lo", "_hi")): _*)
  }

  /** Grouped percentile report: one aggregation pass emitting a named
    * column per requested quantile (0.0/1.0 are min/max). Same two paths
    * as [[winsorize]], pick per deployment:
    *  - `approx = false` (default): Spark's EXACT interpolated `percentile`
    *    — bit-matches any SQL engine's `quantile_cont` (the oracle path),
    *    but the agg buffer holds EVERY group value: fine for dimension-
    *    sized groups, OOM territory when one group spans a 100 TB fact.
    *  - `approx = true`: `approx_percentile` (Greenwald-Khanna sketch),
    *    constant memory per group and mergeable map-side — the 100 TB
    *    path. The sketch retains the true extremes, so 0.0/1.0 stay exact;
    *    interior quantiles differ by at most the ~1/accuracy rank error. */
  def percentiles(df: DataFrame, group: Column, value: Column,
                  ps: Seq[(String, Double)], scale: Int = 4,
                  approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty, "percentiles needs at least one quantile")
    def pctl(p: Double): Column =
      if (approx) approx_percentile(value, lit(p), lit(accuracy)).cast("double")
      else percentile(value, lit(p))
    val aggs = ps.map { case (n, p) => round(pctl(p), scale).as(n) }
    df.groupBy(group).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-key daily gap fill with forward fill: emit one row per (key, day)
    * over each key's [min, max] day span; days with no rows carry the most
    * recent prior value (time-series densification for charts/ML features).
    *
    * Scale: the daily aggregate shuffles once on (key, day); the spine is
    * generated per key from its own span (`sequence` + explode — map-side,
    * no cross join against a global calendar); the forward fill is one
    * window over the SAME key partitioning. Spine size is bounded by
    * keys x span-days, independent of the raw event count. */
  def gapFill(df: DataFrame, key: Column, dateCol: Column, valueAgg: Column): DataFrame = {
    val daily = df.groupBy(key.as("key"), dateCol.as("day")).agg(valueAgg.as("day_value"))
    val spine = daily.groupBy(col("key"))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col("key"), explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("key", "day"), "left")
      .withColumn("filled_value", last(col("day_value"), ignoreNulls = true).over(w))
      .withColumn("is_filled", col("day_value").isNull)
  }

  /** Hot-key skew diagnostics: the top-N heaviest keys with their share of
    * the table and their ratio to the mean key weight — the report that
    * tells you whether a join/agg on this key needs salting BEFORE the 100
    * TB run finds out the hard way. One (key)-keyed partial-agg shuffle +
    * a distributed TakeOrdered of the top N; global stats ride a 1-row
    * broadcast. */
  def skewProfile(df: DataFrame, key: Column, keyName: String, topN: Int): DataFrame = {
    val counts = df.groupBy(key.as(keyName)).agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(sum(col("n_rows")).as("_total"),
      count(lit(1)).as("_n_keys"))
    counts.crossJoin(broadcast(stats))
      .select(col(keyName), col("n_rows"),
        round(col("n_rows").cast("double") / col("_total"), 6).as("share"),
        // n_rows cast to double BEFORE the multiply: long*long would overflow
        // (and throw under ANSI) once n_rows * n_keys exceeds 2^63 — easily
        // reached at the 100 TB scale this diagnostic is for.
        round(col("n_rows").cast("double") * col("_n_keys") / col("_total"), 4)
          .as("skew_vs_mean"))
      .orderBy(col("n_rows").desc, col(keyName)).limit(topN)
  }

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

  /** Robust per-group outliers by median/MAD — the heavy-tail-safe
    * complement of [[zScoreAnomalies]]: one extreme document shifts a mean
    * and inflates a stddev enough to mask itself (z-scores break down
    * exactly on the corpora that need outlier gates), while the median and
    * the median absolute deviation have a 50% breakdown point. Convention
    * is the LOWER MEDIAN (the element at rank ⌈n/2⌉ in value order) for
    * both passes — an actual data value, no interpolation, so every
    * downstream double is a single correctly-rounded op away from exact
    * integers and the whole chain replays cross-engine bit for bit.
    * `rscore` = (x − med)/mad rounded 6dp (NULL when mad = 0, i.e. a
    * majority-constant group); a row is an outlier when
    * |x − med| > k·mad with mad > 0.
    *
    * Scale: two group-partitioned window passes (rank in value order, rank
    * in deviation order) + two group-keyed joins of the |groups|-row
    * median/MAD tables — the [[graft.operators.TextAnalysis]] deciles
    * discipline; no global sort, no unpartitioned window, groups hash
    * independently. Output: outlier rows only —
    * (idCol, groupCol, valueCol, med, mad, rscore). */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, k: Double): DataFrame = {
    require(k > 0, s"madOutliers needs k > 0; got $k")
    val v = col(valueCol).cast("double")
    val base = df.select(col(groupCol), col(idCol), v.as("_v"))
      .where(col("_v").isNotNull)
    val wg = Window.partitionBy(col(groupCol))
    def lowerMedian(in: DataFrame, ord: Column, out: String): DataFrame =
      in.withColumn("_rn", row_number().over(
          Window.partitionBy(col(groupCol)).orderBy(ord, col(idCol))))
        .withColumn("_n", count(lit(1)).over(wg))
        .where(col("_rn") === expr("(_n + 1) div 2")) // integer ⌈n/2⌉ — the lower-median rank
        .select(col(groupCol), ord.as(out))
    val med = lowerMedian(base, col("_v"), "med")
    val dev = base.join(med, groupCol)
      .withColumn("_dev", abs(col("_v") - col("med")))
    val mad = lowerMedian(dev, col("_dev"), "mad")
    dev.join(mad, groupCol)
      .where(col("mad") > 0.0 && col("_dev") > lit(k) * col("mad"))
      .select(col(idCol), col(groupCol), col("_v").as(valueCol), col("med"),
        col("mad"), round((col("_v") - col("med")) / col("mad"), 6).as("rscore"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the
    * distribution-drift gate between two corpus slices (old vs new crawl,
    * one source vs the rest): D = max over the union of observed values of
    * |F̂_a − F̂_b|, the strongest nonparametric "did the distribution
    * move" signal, sensitive where mean/stddev monitors
    * ([[zScoreAnomalies]], schema_drift's profile deltas) are blind.
    * Every per-row double is the same two correctly-rounded ops in both
    * engines (cum/n, subtraction) from identical integers, so the MAX is
    * engine-exact; d_stat rounds once at 6dp.
    *
    * Scale: both sides pre-aggregate to (value, count) — one map-side
    *-combined shuffle each, output bounded by the VALUE DOMAIN (distinct
    * metric values: token counts, score buckets), never the corpus. The
    * cumulative window that follows is ordered-unpartitioned but runs on
    * that domain-bounded frame (the vocab_top discipline). A CONTINUOUS
    * metric (raw doubles: prices, scores, latencies) makes that frame
    * corpus-sized — route it through [[ksBinned]], which grids both sides
    * onto ≤ nBins integer bins first; calling this directly is only
    * correct for metrics whose value domain is intrinsically bounded.
    * Output: one row (n_a, n_b, n_points, d_stat). */
  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def cnt(df: DataFrame, out: String) =
      df.select(col(valueCol).as("v")).where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as(out))
    ksTwoSampleCounts(cnt(a, "_ca"), cnt(b, "_cb"))
  }

  /** [[ksTwoSample]]'s counts-based core, public for inputs that ARRIVE
    * as (value, count) histograms — an index's cell-occupancy table
    * ([[AnnIndex.staleness]]), a pre-aggregated day/bucket profile —
    * where expanding counts back to rows just to re-count them would be
    * wasted shuffle. `a` is (v, _ca), `b` is (v, _cb), one row per
    * distinct value each; semantics and output are exactly
    * [[ksTwoSample]]'s (the row form IS this on its per-side
    * aggregates). */
  def ksTwoSampleCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val u = a.join(b, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    // domain-bounded frame (post-aggregation): cumulative + totals share
    // one ordered window partition — audited in SourceGuardSpec
    val wc = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // empty-side guard (ADVICE r15): one empty input makes cum/n read
    // 0/0 = NaN (which would also dominate the max) — the nullif-style
    // guard used for _nrest in ksBySource maps an empty side to a NULL
    // d_stat instead, the same "no complement, no statistic" semantics
    def nz(c: Column): Column =
      when(c === 0L, lit(null)).otherwise(c).cast("double")
    u.select(col("v"),
        sum(col("_ca")).over(wc).as("_cuma"), sum(col("_cb")).over(wc).as("_cumb"),
        sum(col("_ca")).over(wt).as("_na"), sum(col("_cb")).over(wt).as("_nb"))
      .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        count(lit(1)).as("n_points"),
        round(max(abs(col("_cuma").cast("double") / nz(col("_na")) -
          col("_cumb").cast("double") / nz(col("_nb")))), 6).as("d_stat"))
  }

  /** Per-source KS drift — [[ksTwoSample]] run as ONE set-based plan for
    * every source against the REST of the corpus (the fleet monitor: which
    * domain's length/quality distribution has wandered from the pool).
    * Semantics per source are EXACTLY the two-sample statistic on
    * (slice, complement) — spec-pinned against [[ksTwoSample]] row by row.
    *
    * Scale: counts pre-aggregate per (source, value) and per value (both
    * map-side combined, value-domain-bounded outputs); the |sources| ×
    * |values| evaluation grid is a cross of those two DIMENSION-SIZED
    * aggregates (audited — never a corpus cross), and every cumulative
    * runs in a source-PARTITIONED window. A source holding the whole
    * corpus reads d_stat NULL (empty complement) rather than NaN.
    * Output: (source, n_in, n_rest, d_stat 6dp). */
  def ksBySource(df: DataFrame, srcCol: String, valueCol: String): DataFrame = {
    val base = df.select(col(srcCol).as("source"), col(valueCol).as("v"))
      .where(col("v").isNotNull)
    val cnt = base.groupBy(col("source"), col("v")).agg(count(lit(1)).as("_c"))
    val gv = base.groupBy(col("v")).agg(count(lit(1)).as("_g"))
    val grid = cnt.select(col("source")).distinct()
      .crossJoin(gv) // dimension-sized × value-domain-sized, see scaladoc
      .join(cnt, Seq("source", "v"), "left")
      .select(col("source"), col("v"), col("_g"),
        coalesce(col("_c"), lit(0L)).as("_c"))
    val wc = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("source"))
    grid.select(col("source"),
        sum(col("_c")).over(wc).as("_cin"),
        sum(col("_g") - col("_c")).over(wc).as("_crest"),
        sum(col("_c")).over(wt).as("_nin"),
        sum(col("_g") - col("_c")).over(wt).as("_nrest"))
      .groupBy(col("source"))
      .agg(max(col("_nin")).as("n_in"), max(col("_nrest")).as("n_rest"),
        round(max(abs(col("_cin").cast("double") / col("_nin").cast("double") -
          col("_crest").cast("double") /
            when(col("_nrest") === 0L, lit(null)).otherwise(col("_nrest")).cast("double"))),
          6).as("d_stat"))
  }

  /** KS drift for CONTINUOUS metrics — closes [[ksTwoSample]]'s
    * documented footgun: its cumulative window is bounded only by the
    * VALUE DOMAIN, fine for integer metrics (token counts, buckets) but
    * corpus-sized the day someone passes a raw double. Here both sides
    * first bin onto a shared integer grid — `nBins` equal-width bins
    * between the COMBINED min/max, from ONE 1-row broadcast (the zorder
    * bucketing discipline) — and the exact two-sample statistic runs on
    * bin indexes, so the ordered frame is ≤ nBins rows no matter what the
    * metric is. This is standard KS-on-binned practice: D on the binned
    * CDFs underestimates continuous D by at most the largest per-bin mass.
    * Bin arithmetic is floor((v − lo)/(hi − lo)·nBins) clamped to
    * nBins−1 — each step one correctly-rounded double op, identically
    * parenthesized in the oracle, so indexes are engine-exact; a
    * degenerate hi = lo maps everything to bin 0 (D = 0).
    * Output: one row (n_a, n_b, n_points, d_stat), [[ksTwoSample]]'s. */
  def ksBinned(a: DataFrame, b: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 65536, s"ksBinned needs 2 <= nBins <= 65536, got $nBins")
    def side(df: DataFrame) = df.select(col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
    val va = side(a)
    val vb = side(b)
    // 1-row combined min/max broadcast — the audited 1-row-stats crossJoin
    val stats = broadcast(va.unionByName(vb)
      .agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi")))
    def binned(df: DataFrame) = df.crossJoin(stats).select(
      when(col("_hi") === col("_lo"), lit(0L))
        .otherwise(least(
          floor((col("_v") - col("_lo")) / (col("_hi") - col("_lo")) * nBins),
          lit((nBins - 1).toLong)))
        .cast("int").as("bin"))
    ksTwoSample(binned(va), binned(vb), "bin")
  }

  /** [[ksBySource]] for CONTINUOUS metrics — the grouped form has the
    * same value-domain exposure the two-sample form had (its
    * |sources|×|values| grid and source-partitioned cumulatives are
    * bounded only by the metric's domain): bin once on the GLOBAL
    * min/max grid (one 1-row broadcast — shared edges keep every
    * source's CDF comparable), then run the set-based per-source drift
    * on bin indexes, ≤ |sources|×nBins grid regardless of the metric.
    * Bin arithmetic is [[ksBinned]]'s, oracle-parenthesized.
    * Output: (source, n_in, n_rest, d_stat 6dp). */
  def ksBinnedBySource(df: DataFrame, srcCol: String, valueCol: String,
                       nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 65536,
      s"ksBinnedBySource needs 2 <= nBins <= 65536, got $nBins")
    val base = df.select(col(srcCol).as("source"), col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
    val stats = broadcast(base.agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi")))
    val binned = base.crossJoin(stats) // 1-row stats broadcast, the ksBinned class
      .select(col("source"),
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_lo")) / (col("_hi") - col("_lo")) * nBins),
            lit((nBins - 1).toLong)))
          .cast("int").as("bin"))
    ksBySource(binned, "source", "bin")
  }

  /** Mann–Whitney U rank-sum drift test — the nonparametric LOCATION
    * companion to [[ksTwoSample]]'s shape statistic (KS asks "is the
    * distribution different", this asks "has the typical value SHIFTED",
    * and it keeps power under heavy tails where a t-test drowns).
    * Tie-exact: ranks come from the (value, count) histogram as midranks —
    * 2·midrank(v) = 2·|{u < v}| + t(v) + 1 stays INTEGER, so the rank sum
    * R_a, U = R_a − n_a(n_a+1)/2, and the tie-corrected normal
    * approximation z = (U − n_a·n_b/2) / σ with
    * σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1))) are engine-exact: the
    * integer sums are order-free and every double step (incl. sqrt, which
    * IEEE 754 requires correctly rounded) is a single correctly-rounded op
    * on identical operands, identically parenthesized in the oracle.
    *
    * Scale: both sides pre-aggregate to (value, count) — the [[ksTwoSample]]
    * discipline — so the one ordered window runs on a VALUE-DOMAIN-bounded
    * frame, never the corpus (continuous metrics bin first, the
    * [[ksBinned]] route). All-tied or empty inputs read z_stat NULL
    * (σ = 0 — no test). Output: one row (n_a, n_b, u_stat, z_stat 6dp). */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def cnt(df: DataFrame, out: String) =
      df.select(col(valueCol).as("v")).where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as(out))
    val u = cnt(a, "_ca").join(cnt(b, "_cb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
      .withColumn("_t", col("_ca") + col("_cb"))
    // domain-bounded ordered frame (post-aggregation) — the ksTwoSample
    // window class, audited in SourceGuardSpec
    val wc = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = u.select(col("_ca"), col("_cb"), col("_t"),
      (lit(2L) * (sum(col("_t")).over(wc) - col("_t")) + col("_t") + lit(1L))
        .as("_mr2"))
    val agg0 = ranked.agg(
      sum(col("_ca")).as("_na"), sum(col("_cb")).as("_nb"),
      sum(col("_ca") * col("_mr2")).as("_r2a"),
      // t cast to DECIMAL(38,0) before cubing: a single tied value with
      // > ~2.1M rows makes t^3 overflow BIGINT and ANSI mode throws; the
      // downstream use is a double anyway (oracle mirrors via HUGEINT)
      sum(col("_t").cast("decimal(38,0)") * col("_t") * col("_t") - col("_t"))
        .as("_t3"))
    val naD = col("_na").cast("double")
    val nbD = col("_nb").cast("double")
    val base = agg0.select(col("_na"), col("_nb"), col("_t3"),
      ((col("_r2a").cast("double") - naD * (naD + lit(1.0))) / lit(2.0))
        .as("u_stat"))
    val nD = (col("_na") + col("_nb")).cast("double")
    val sig2 = naD * nbD / lit(12.0) *
      ((nD + lit(1.0)) - col("_t3").cast("double") / (nD * (nD - lit(1.0))))
    base.select(col("_na").as("n_a"), col("_nb").as("n_b"), col("u_stat"),
      when(sig2 > 0,
        round((col("u_stat") - naD * nbD / lit(2.0)) / sqrt(sig2), 6))
        .as("z_stat"))
  }

  /** Population Stability Index — THE production scorecard/feature-drift
    * metric beside [[ksBinned]]'s KS (PSI weights tail divergence KS's
    * single-supremum misses; conventional read: < 0.1 stable, 0.1–0.25
    * drifting, > 0.25 action). Both sides grid onto `nBins` shared
    * equal-width bins from ONE combined-min/max 1-row broadcast (the
    * [[ksBinned]] grid, so raw continuous metrics are safe), then
    * PSI = Σ (p_i − q_i)·ln(p_i/q_i) over the OCCUPIED-union bins with
    * Jeffreys add-½ smoothing — p_i = (c_i + ½)/(n + k/2) over the k
    * occupied bins, so empty-on-one-side bins contribute finite mass and
    * both smoothed vectors still sum to 1 across the support.
    * Engine-exact: counts + ½ and n + k·0.5 are exact doubles, each
    * division/product one correctly-rounded op, ln 6dp-rounded DECIMAL
    * (the lmScore convention), terms 6dp-DECIMAL so the final sum is
    * order-free. Output: one row (n_a, n_b, n_bins, psi). */
  def psiBinned(a: DataFrame, b: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 65536, s"psiBinned needs 2 <= nBins <= 65536, got $nBins")
    def side(df: DataFrame) = df.select(col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
    val va = side(a)
    val vb = side(b)
    // 1-row combined min/max broadcast — the audited 1-row-stats crossJoin
    val stats = broadcast(va.unionByName(vb)
      .agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi")))
    def binned(df: DataFrame) = df.crossJoin(stats).select(
      when(col("_hi") === col("_lo"), lit(0L))
        .otherwise(least(
          floor((col("_v") - col("_lo")) / (col("_hi") - col("_lo")) * nBins),
          lit((nBins - 1).toLong)))
        .cast("int").as("bin"))
    val ca = binned(va).groupBy(col("bin")).agg(count(lit(1)).as("_ca"))
    val cb = binned(vb).groupBy(col("bin")).agg(count(lit(1)).as("_cb"))
    val u = ca.join(cb, Seq("bin"), "full_outer")
      .select(coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    // 1-row totals broadcast onto the ≤ nBins-row union — audited class
    val tot = broadcast(u.agg(sum(col("_ca")).as("_na"), sum(col("_cb")).as("_nb"),
      count(lit(1)).as("_k")))
    val kHalf = col("_k").cast("double") * lit(0.5)
    val terms = u.crossJoin(tot).select(col("_na"), col("_nb"), col("_k"),
        ((col("_ca").cast("double") + lit(0.5)) / (col("_na").cast("double") + kHalf)).as("_p"),
        ((col("_cb").cast("double") + lit(0.5)) / (col("_nb").cast("double") + kHalf)).as("_q"))
      .select(col("_na"), col("_nb"), col("_k"),
        round((col("_p") - col("_q")) *
            round(log(col("_p") / col("_q")), 6).cast("decimal(18,6)").cast("double"), 6)
          .cast("decimal(18,6)").as("_term"))
    terms.agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
      max(col("_k")).as("n_bins"),
      sum(col("_term")).cast("double").as("psi"))
  }

  /** Per-source PSI — [[psiBinned]] run as ONE set-based plan for every
    * source against the REST (the [[ksBySource]] discipline: counts
    * pre-aggregate, rest = global − slice, the |sources| × ≤ nBins grid is
    * a cross of two dimension-sized aggregates, never a corpus pair join).
    * The smoothing support k is the GLOBAL occupied-bin count (a slice and
    * its complement share the union support by construction). A source
    * holding the whole corpus reads psi NULL (empty complement).
    * Output: (source, n_in, n_rest, psi). */
  def psiBinnedBySource(df: DataFrame, srcCol: String, valueCol: String,
                        nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 65536,
      s"psiBinnedBySource needs 2 <= nBins <= 65536, got $nBins")
    val base = df.select(col(srcCol).as("source"), col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
    val stats = broadcast(base.agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi")))
    val binned = base.crossJoin(stats) // 1-row stats broadcast, the ksBinned class
      .select(col("source"),
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_lo")) / (col("_hi") - col("_lo")) * nBins),
            lit((nBins - 1).toLong)))
          .cast("int").as("bin"))
    val cnt = binned.groupBy(col("source"), col("bin")).agg(count(lit(1)).as("_c"))
    val gv = binned.groupBy(col("bin")).agg(count(lit(1)).as("_g"))
    val grid = cnt.select(col("source")).distinct()
      .crossJoin(gv) // dimension-sized × ≤ nBins — the ksBySource grid class
      .join(cnt, Seq("source", "bin"), "left")
      .select(col("source"), col("_g"), coalesce(col("_c"), lit(0L)).as("_c"))
    val wt = Window.partitionBy(col("source"))
    val withTot = grid.select(col("source"), col("_g"), col("_c"),
      sum(col("_c")).over(wt).as("_nin"),
      sum(col("_g") - col("_c")).over(wt).as("_nrest"),
      count(lit(1)).over(wt).as("_k"))
    val kHalf = col("_k").cast("double") * lit(0.5)
    val terms = withTot.select(col("source"), col("_nin"), col("_nrest"),
        ((col("_c").cast("double") + lit(0.5)) / (col("_nin").cast("double") + kHalf)).as("_p"),
        (((col("_g") - col("_c")).cast("double") + lit(0.5)) / (col("_nrest").cast("double") + kHalf)).as("_q"))
      .select(col("source"), col("_nin"), col("_nrest"),
        round((col("_p") - col("_q")) *
            round(log(col("_p") / col("_q")), 6).cast("decimal(18,6)").cast("double"), 6)
          .cast("decimal(18,6)").as("_term"))
    terms.groupBy(col("source"))
      .agg(max(col("_nin")).as("n_in"), max(col("_nrest")).as("n_rest"),
        when(max(col("_nrest")) > 0, sum(col("_term")).cast("double")).as("psi"))
  }

  /** Autocorrelation function of the gap-filled daily total series — the
    * seasonality diagnostic the smoothing pair ([[movingAvg]]/[[ewmaDaily]])
    * can't give: a weekly cycle spikes r at lag 7, a trend keeps every lag
    * positive, white noise sits near 0. r_k = Σ d_t·d_{t+k} / Σ d_t² over
    * demeaned daily totals d_t = x_t − x̄.
    *
    * Engine-exact: daily totals are DECIMAL sums (order-free), x̄ is one
    * division of that exact sum, each demeaned product rounds to 6dp
    * DECIMAL before the order-free numerator/denominator sums, and r_k is
    * one final rounded division. Scale: everything after the one map-side-
    * combined daily aggregate is DAYS-sized — the spine join for lag pairs
    * carries ≤ |days|·maxLag rows, the mean and denominator ride audited
    * 1-row broadcasts; no corpus-sized node above the daily aggregate.
    * A constant series (zero variance) reads acf NULL.
    * Output: (lag, n_pairs, acf 6dp), one row per lag 1..maxLag. */
  def acfDaily(events: DataFrame, tsCol: Column, valCol: Column,
               maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"acfDaily needs 1 <= maxLag <= 64, got $maxLag")
    val daily = events.groupBy(to_date(tsCol).as("day"))
      .agg(sum(valCol.cast("decimal(18,4)")).as("_rev"))
    val spine = daily.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val filled = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("_rev"), lit(0).cast("decimal(18,4)")).as("_rev"))
    // 1-row mean broadcast onto the days-sized frame — audited class
    val st = broadcast(filled.agg(sum(col("_rev")).as("_s"), count(lit(1)).as("_n")))
    val dev = filled.crossJoin(st).select(col("day"),
      (col("_rev").cast("double") - col("_s").cast("double") / col("_n")).as("_d"))
    // 1-row denominator broadcast (Σ d² as exact 6dp-DECIMAL sum)
    val den = broadcast(dev.agg(
      sum(round(col("_d") * col("_d"), 6).cast("decimal(18,6)")).as("_den")))
    val lags = dev.select(explode(sequence(lit(1), lit(maxLag))).as("lag"),
      col("day"), col("_d"))
    val pairs = lags.join(
      dev.select(col("day").as("_day2"), col("_d").as("_d2")),
      col("_day2") === date_add(col("day"), col("lag")))
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(round(col("_d") * col("_d2"), 6).cast("decimal(18,6)")).as("_num"))
      .crossJoin(den) // 1-row denominator — audited class
      .select(col("lag").cast("int").as("lag"), col("n_pairs"),
        when(col("_den") > 0,
          round(col("_num").cast("double") / col("_den").cast("double"), 6)).as("acf"))
  }

  /** Ljung–Box portmanteau whiteness test over the daily series (Ljung &
    * Box 1978) — the DECISION on top of [[acfDaily]]'s diagnostic: the
    * ACF says which lags look correlated, Q = n(n+2)·Σ r_k²/(n−k) says
    * whether the autocorrelation as a whole is distinguishable from
    * white noise (Q ~ χ²_h under H₀; reject above the pinned critical
    * value — the literal is interpolated into BOTH engines, the Benford
    * convention, so neither evaluates a chi-square quantile).
    *
    * Exactness: on the gap-filled spine the pair count at lag k IS
    * n − k, so each term is r_k²/n_pairs — two correctly-rounded ops on
    * the 6dp-rounded r_k — rounded to 6dp DECIMAL before the cross-row
    * sum (order-free), and Q is the fixed chain (n·(n+2))·Σ with n
    * recovered exactly as max(n_pairs + lag). A constant series reads
    * Q NULL (no ACF to test). Scale: [[acfDaily]]'s frame plus a 1-row
    * fold. Output: one row (n_days, max_lag, q_stat, reject). */
  def ljungBoxDaily(events: DataFrame, tsCol: Column, valCol: Column,
                    maxLag: Int, critValue: Double): DataFrame = {
    val acf = acfDaily(events, tsCol, valCol, maxLag)
    acf.agg(
        max(col("n_pairs") + col("lag")).as("_n"),
        max(col("lag")).as("_h"),
        sum(round(col("acf") * col("acf") / col("n_pairs").cast("double"), 6)
          .cast("decimal(18,6)")).as("_terms"))
      .select(
        col("_n").cast("bigint").as("n_days"),
        col("_h").cast("int").as("max_lag"),
        (col("_n").cast("double") * (col("_n").cast("double") + lit(2.0))
          * col("_terms").cast("double")).as("q_stat"))
      .withColumn("reject", col("q_stat") > critValue)
  }

  /** Wald–Wolfowitz runs test over the daily series (Wald & Wolfowitz
    * 1940) — the SIGN-pattern randomness check beside [[ljungBoxDaily]]'s
    * magnitude test: too FEW runs of above/below-median days means
    * clustering (regime persistence the ACF can under-weigh when
    * magnitudes are noisy), too MANY means oscillation; both reject
    * via z = (R − μ)/σ with μ = 2n₁n₂/n + 1 and
    * σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)).
    *
    * Exactness: the median is the exact LOWER median of the DECIMAL
    * daily totals (an order statistic, engine-identical); days equal to
    * the median drop (the standard convention — they belong to neither
    * side); n₁/n₂/R are integers (R counts sign changes + 1 via a lag
    * over the day spine), and μ/σ/z are fixed-parenthesization chains of
    * exactly-cast integers (2n₁n₂ ≤ n²/2 — DECIMAL(38,0) carries it past
    * any calendar). Degenerate sides (n₁ = 0 or n₂ = 0, or n < 2) read
    * z NULL. Scale: one map-side daily aggregate, then the day-spine
    * frame (calendar-bounded ordered windows — the audited ksTwoSample
    * class). Output: one row (n_days, n_above, n_below, n_runs, z_stat). */
  def runsTestDaily(events: DataFrame, tsCol: Column, valCol: Column): DataFrame = {
    val daily = events.groupBy(to_date(tsCol).as("day"))
      .agg(sum(valCol.cast("decimal(18,4)")).as("_rev"))
    val spine = daily.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val filled = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("_rev"), lit(0).cast("decimal(18,4)")).as("_rev"))
    // exact lower median: rank the day-spine frame (calendar-bounded)
    val wRank = Window.orderBy(col("_rev"), col("day"))
    val wTot = broadcast(filled.agg(count(lit(1)).as("_nAll")))
    val med = broadcast(filled.withColumn("_rk", row_number().over(wRank))
      .crossJoin(wTot) // 1-row total — audited class
      // floor((n+1)/2), NOT a double->int cast: Spark's ANSI cast
      // truncates but DuckDB's cast rounds — floor agrees everywhere
      .where(col("_rk") === floor((col("_nAll") + lit(1)) / lit(2)))
      .select(col("_rev").as("_med")))
    val signed = filled.crossJoin(med) // 1-row median — audited class
      .where(col("_rev") =!= col("_med"))
      .select(col("day"), (col("_rev") > col("_med")).cast("int").as("_s"))
    val wDay = Window.orderBy(col("day"))
    val runs = signed
      .select(col("_s"),
        when(lag(col("_s"), 1).over(wDay).isNull, lit(1))
          .when(lag(col("_s"), 1).over(wDay) =!= col("_s"), lit(1))
          .otherwise(lit(0)).as("_newRun"))
      .agg(count(lit(1)).as("_n"),
        sum(col("_s").cast("long")).as("_n1"),
        sum((lit(1) - col("_s")).cast("long")).as("_n2"),
        sum(col("_newRun").cast("long")).as("_r"))
    val nD = col("_n").cast("double")
    val p = (col("_n1").cast("decimal(38,0)") * col("_n2")).cast("double") * 2.0
    val mu = p / nD + lit(1.0)
    val sig2 = p * (p - nD) / (nD * nD * (nD - lit(1.0)))
    runs.select(col("_n").cast("bigint").as("n_days"),
      col("_n1").as("n_above"), col("_n2").as("n_below"),
      col("_r").as("n_runs"),
      when(col("_n1") > 0 && col("_n2") > 0 && col("_n") > 1 && sig2 > 0,
        round((col("_r").cast("double") - mu) / sqrt(sig2), 6)).as("z_stat"))
  }

  /** CUSUM level-shift localization over the gap-filled daily series —
    * WHERE the mean changed, which [[ewmaDaily]]'s spike flag (single-day
    * outliers) and [[ksTwoSample]] (needs the split given) can't answer:
    * the argmax of |S_t|, S_t = Σ_{i≤t}(x_i − x̄), is the classic
    * changepoint estimate, and M = max|S_t|/(σ̂√n) its normalized
    * statistic (≳ 1.36 rejects stability at 5% — the Kolmogorov bound,
    * since under H₀ the CUSUM bridge behaves Brownian).
    *
    * Engine-exact: demeaned terms round to 6dp DECIMAL so the cumulative
    * sum is exact and order-association-free (a raw double running sum
    * would depend on the window implementation's association), |S| compares
    * in DECIMAL, the argmax tie-breaks to the EARLIEST day, and σ̂ / M are
    * fixed-parenthesization single-op chains. Scale: days-sized after the
    * one daily aggregate; the ordered cumulative window runs on the day
    * spine (domain-bounded — the ksTwoSample window class); mean and
    * max-|S| ride audited 1-row broadcasts. A constant series reads
    * m_stat NULL. Output: one row (n_days, cp_day, s_max, m_stat). */
  def cusumDaily(events: DataFrame, tsCol: Column, valCol: Column): DataFrame = {
    val daily = events.groupBy(to_date(tsCol).as("day"))
      .agg(sum(valCol.cast("decimal(18,4)")).as("_rev"))
    val spine = daily.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val filled = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("_rev"), lit(0).cast("decimal(18,4)")).as("_rev"))
    val st = broadcast(filled.agg(sum(col("_rev")).as("_s"), count(lit(1)).as("_n")))
    val dev = filled.crossJoin(st).select(col("day"), col("_n"),
      (col("_rev").cast("double") - col("_s").cast("double") / col("_n")).as("_d"))
    // day-spine ordered cumulative — domain-bounded, the ksTwoSample class
    val wc = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = dev.select(col("day"), col("_n"),
        round(col("_d") * col("_d"), 6).cast("decimal(18,6)").as("_sq"),
        sum(round(col("_d"), 6).cast("decimal(18,6)")).over(wc).as("_cum"))
      .select(col("day"), col("_n"), col("_sq"), abs(col("_cum")).as("_abs"))
    val st2 = broadcast(rows.agg(max(col("_abs")).as("_smax"), sum(col("_sq")).as("_ssq")))
    val one = rows.crossJoin(st2).agg(
      max(col("_n")).as("n_days"),
      min(when(col("_abs") === col("_smax"), col("day"))).as("cp_day"),
      max(col("_smax")).as("_smax"), max(col("_ssq")).as("_ssq"))
    val nD = col("n_days").cast("double")
    one.select(col("n_days"), col("cp_day"),
      col("_smax").cast("double").as("s_max"),
      when(col("_ssq") > 0,
        round(col("_smax").cast("double") /
          (sqrt(col("_ssq").cast("double") / nD) * sqrt(nD)), 6)).as("m_stat"))
  }

  /** Delete-one-GROUP jackknife for the corpus mean of an integer metric
    * (Quenouille/Tukey; the survey-statistics replication estimator) —
    * the missing piece on every corpus dashboard: a mean token count
    * without an error bar can't tell a real drift from source-mix noise.
    * Groups (sources/domains) are the natural exchangeable unit of a
    * crawled corpus — documents within a source are correlated, so a
    * per-row bootstrap UNDERSTATES the variance; delete-a-group is the
    * standard fix. θ₍₋g₎ = (S − S_g)/(N − n_g); the classic estimator
    * var = (G−1)/G · Σ(θ₍₋g₎ − θ̄)².
    *
    * Engine-exact WITHOUT display rounding: S, N, S_g, n_g are integer
    * sums; every remaining step is a single correctly-rounded double op
    * on identical operands (division, subtraction, square, IEEE sqrt),
    * EXCEPT the two cross-group sums, which ride the 6dp-DECIMAL
    * convention (θ₍₋g₎ and the squared deviations round to 6dp so the
    * sums are order-free). The 1.96 normal quantile is a pinned literal.
    *
    * Scale: one group-keyed integer aggregate (map-side combined), then
    * a ǀgroupsǀ-row frame with a 1-row totals broadcast. Fewer than two
    * groups → se/ci NULL. Output: one row (n_groups, n_rows, mean,
    * se_jack, ci_lo, ci_hi). */
  def jackknifeMean(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("_g"), col(valueCol).cast("long").as("_v"))
      .where(col("_g").isNotNull && col("_v").isNotNull)
      .groupBy(col("_g")).agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s"))
    val tot = broadcast(g.agg(sum(col("_n")).as("_nn"), sum(col("_s")).as("_ss"),
      count(lit(1)).as("_gg")))
    val loo = g.crossJoin(tot) // 1-row totals onto the |groups| frame — audited
      .select(col("_nn"), col("_ss"), col("_gg"),
        round((col("_ss") - col("_s")).cast("double") /
          when(col("_nn") - col("_n") === 0L, lit(null))
            .otherwise(col("_nn") - col("_n")).cast("double"), 6)
          .cast("decimal(18,6)").as("_t6"))
    val agg0 = loo.groupBy(col("_nn"), col("_ss"), col("_gg"))
      .agg(sum(col("_t6")).as("_tsum"), count(col("_t6")).as("_gok"))
    val thetaBar = col("_tsum").cast("double") / col("_gok").cast("double")
    val dev = loo.join(broadcast(agg0), Seq("_nn", "_ss", "_gg"))
      .select(col("_nn"), col("_ss"), col("_gg"), col("_gok"),
        round((col("_t6").cast("double") - thetaBar) *
          (col("_t6").cast("double") - thetaBar), 6)
          .cast("decimal(18,6)").as("_d2"))
    val gD = col("_gok").cast("double")
    val se = sqrt((gD - lit(1.0)) / gD * col("_d2sum").cast("double"))
    dev.groupBy(col("_nn"), col("_ss"), col("_gg"), col("_gok"))
      .agg(sum(col("_d2")).as("_d2sum"))
      .select(col("_gg").as("n_groups"), col("_nn").as("n_rows"),
        (col("_ss").cast("double") / col("_nn").cast("double")).as("mean"),
        when(col("_gok") >= 2, se).as("se_jack"))
      .withColumn("ci_lo", col("mean") - lit(1.96) * col("se_jack"))
      .withColumn("ci_hi", col("mean") + lit(1.96) * col("se_jack"))
  }

  /** Cumulative Poisson(1) probabilities as pinned 10dp literals —
    * P(X ≤ k), k = 0..8 (the k = 9 tail carries ~1.1e-7 mass and is
    * absorbed into the last bucket). Inlined IDENTICALLY into the Spark
    * plan and the oracle SQL, so neither engine ever evaluates exp(). */
  private[graft] val Poisson1Cdf: Seq[Double] = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508,
    0.9999988748)

  /** Poissonized bootstrap confidence interval for the corpus mean — the
    * RESAMPLING companion to [[jackknifeMean]] (which respects group
    * structure; this one answers the i.i.d.-rows question and needs no
    * grouping column). Classic multiplier bootstrap: each replicate
    * re-weights every row by an independent Poisson(1) draw — the
    * with-replacement resample's occupancy distribution — and the CI is
    * the ⌈0.025·B⌉ / ⌈0.975·B⌉ ORDER STATISTICS of the B replicate means
    * (exact ranks, no interpolation — the lower-median convention).
    *
    * The draws are md5 COINS, not RNG (the L29i/L29o convention): per
    * (id, rep), u = (52-bit md5 prefix + 0.5)/2^52 is dyadic-EXACT, and
    * the weight is u's bucket among the PINNED [[Poisson1Cdf]] literals —
    * identical on every engine/run/retry/partitioning, so the "random"
    * CI is bit-reproducible and fully oracled. Replicate means are
    * UNROUNDED single divisions (exact — they feed a SORT, not a sum;
    * the terminal-division rule), the point mean likewise.
    *
    * Scale: the explode multiplies the corpus ×B MAP-SIDE (the
    * mix_epochs blow-up discipline — no join, no shuffle grows), the
    * B-group sums combine map-side so 2·B longs cross the exchange, and
    * the order statistics run on a B-length collected array (bounded by
    * the declared rep count, require-capped). Output: one row (n_reps,
    * mean, boot_lo, boot_hi). */
  def bootstrapMeanCi(df: DataFrame, idCol: String, valueCol: String,
                      reps: Int = 40): DataFrame = {
    require(reps >= 8 && reps <= 256, s"bootstrapMeanCi needs 8 <= reps <= 256, got $reps")
    val base = df.select(col(idCol).cast("string").as("_id"),
        col(valueCol).cast("long").as("_v"))
      .where(col("_id").isNotNull && col("_v").isNotNull)
    val expanded = base.select(col("_id"), col("_v"),
      explode(sequence(lit(1), lit(reps))).as("rep"))
    val h52 = conv(substring(md5(
        concat(col("_id"), lit(":"), col("rep").cast("string")).cast("binary")),
      1, 13), 16, 10).cast("long").cast("double")
    val u = (h52 + lit(0.5)) / lit(4503599627370496.0) // 2^52, dyadic-exact
    val w = Poisson1Cdf.zipWithIndex
      .foldRight(lit(9): Column) { case ((t, k), acc) =>
        when(u <= t, lit(k)).otherwise(acc) }
    val rep = expanded.select(col("rep"), col("_v"), w.as("_w"))
      .groupBy(col("rep"))
      .agg(sum(col("_w") * col("_v")).as("_sw"), sum(col("_w")).as("_nw"))
      .select(when(col("_nw") > 0,
        col("_sw").cast("double") / col("_nw").cast("double")).as("_m"))
    val tot = broadcast(base.agg(sum(col("_v")).as("_s"), count(lit(1)).as("_n")))
    // ranks against the ACTUAL replicate count (a degenerate corpus can
    // drop a replicate to all-zero weights; a static rank would then be
    // out of range, which ANSI element_at turns into a crash), in DOUBLE
    // arithmetic mirrored by the oracle
    val bD = col("_b").cast("double")
    val loR = ceil(lit(0.025) * bD).cast("int")
    val hiR = ceil(lit(0.975) * bD).cast("int")
    // NULL replicate means (all-zero Poisson weights on a degenerate
    // corpus) are dropped EXPLICITLY on both sides: relying on Spark's
    // collect_list null-drop vs DuckDB list()'s default nulls-last order
    // would keep ranks aligned only by engine default, not construction
    rep.where(col("_m").isNotNull)
      .agg(sort_array(collect_list(col("_m"))).as("_ms"),
        count(col("_m")).as("_b"))
      .crossJoin(tot) // 1-row point-estimate totals — audited class
      .select(col("_b").cast("int").as("n_reps"),
        (col("_s").cast("double") / col("_n").cast("double")).as("mean"),
        when(col("_b") > 0, element_at(col("_ms"), loR)).as("boot_lo"),
        when(col("_b") > 0, element_at(col("_ms"), hiR)).as("boot_hi"))
  }

  /** Cohen's kappa agreement between two boolean verdict columns (Cohen
    * 1960) — the GATE-CALIBRATION diagnostic: a corpus pipeline runs
    * several keep gates (heuristic composite, trained classifier,
    * domain rollup), and raw percent agreement flatters them whenever
    * both mostly say "keep"; kappa subtracts the agreement two
    * independent coin-flips with the same marginals would get, so
    * "the classifier just re-measures doc length" shows up as κ ≈ 0
    * while the 2x2 cells say WHERE they disagree.
    *
    * Engine-exact: the 2x2 contingency is integer; κ is computed in its
    * cleared-denominator form κ = (n·(yy+nn) − Σ) / (n² − Σ) with
    * Σ = (yy+yn)(yy+ny) + (ny+nn)(yn+nn) carried in DECIMAL(38,0)
    * (HUGEINT on the oracle — products of two row counts overflow
    * BIGINT past ~3B rows, the mannWhitneyU tie-cube lesson), then ONE
    * terminal division of exactly-cast operands; p_o and p_e are each a
    * single division too. Both-gates-constant-and-equal reads κ NULL
    * (n² = Σ — chance agreement is total, no information to score).
    * Scale: one aggregate over the joined verdicts, map-side combined;
    * 5 longs cross the exchange. Output: one row (n, n_both_keep,
    * n_both_drop, n_only_a, n_only_b, p_o, p_e, kappa). */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val agg0 = df.agg(
      count(lit(1)).as("_n"),
      sum(when(aCol && bCol, 1L).otherwise(0L)).as("_yy"),
      sum(when(aCol && !bCol, 1L).otherwise(0L)).as("_yn"),
      sum(when(!aCol && bCol, 1L).otherwise(0L)).as("_ny"),
      sum(when(!aCol && !bCol, 1L).otherwise(0L)).as("_nn"))
    val n = col("_n").cast("decimal(38,0)")
    val peNum = (col("_yy") + col("_yn")).cast("decimal(38,0)") * (col("_yy") + col("_ny")) +
      (col("_ny") + col("_nn")).cast("decimal(38,0)") * (col("_yn") + col("_nn"))
    agg0.select(
      col("_n").as("n"),
      col("_yy").as("n_both_keep"), col("_nn").as("n_both_drop"),
      col("_yn").as("n_only_a"), col("_ny").as("n_only_b"),
      ((col("_yy") + col("_nn")).cast("double") / col("_n").cast("double")).as("p_o"),
      (peNum.cast("double") / (n * n).cast("double")).as("p_e"),
      when(n * n =!= peNum,
        (n * (col("_yy") + col("_nn")) - peNum).cast("double")
          / (n * n - peNum).cast("double"))
        .as("kappa"))
  }

  /** Spearman rank correlation, tie-exact (Spearman 1904; midrank tie
    * handling) — the CONTINUOUS companion to [[cohenKappa]]'s verdict
    * agreement: ρ between a document signal and a quality score answers
    * "is the score just re-measuring length" on the full scale, robust
    * to any monotone transform of either side (Pearson on raw values
    * would reward the classifier for being linear in length, which is
    * not the question).
    *
    * Exactness: both variables pre-aggregate to (value, count) and take
    * INTEGER doubled midranks from a cumulative over the value domain —
    * the [[mannWhitneyU]] construction, so ranks are engine-exact; the
    * five moment sums (Σr_x, Σr_y, Σr_x², Σr_y², Σr_xr_y) accumulate in
    * DECIMAL(38,0) (r ≤ 2n so Σr² ≤ 4n³ — BIGINT dies near 1.3M rows,
    * DECIMAL(38,0) holds past 10^11), and ρ is a fixed-parenthesization
    * double chain over exactly-cast sums (every op one correctly-rounded
    * step on identical operands; IEEE sqrt included). Constant either
    * side reads ρ NULL (zero variance — no ranking to correlate).
    *
    * Scale: the corpus is touched ONCE — everything reduces to the
    * (x, y, count) PAIR table first (one corpus aggregate; ≤ one row
    * per distinct value pair), both marginal count tables re-aggregate
    * the pair table (its exchange is planned once and REUSED — the
    * boilerplate_scrub shared-exchange class; a per-marginal corpus
    * re-scan would recompute arbitrary upstream, e.g. a classifier
    * chain, and measured 9x slower), the two cumulative rank windows
    * run on value-domain-bounded frames (the audited ksTwoSample
    * class), and the moments are count-weighted sums over the tiny
    * pair⨝rank join. Output: one row (n, rho). */
  def spearmanCorr(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(xCol.cast("double").as("_x"), yCol.cast("double").as("_y"))
    // the ONE corpus pass: joint (x, y) histogram, MATERIALIZED (24 B/row,
    // <= one row per distinct value pair). Without the cut, the pair
    // subtree re-plans under every downstream consumer and any broadcast
    // build embedding it re-executes the caller's whole upstream (a
    // classifier chain measured 6.5 s single-threaded inside the one-task
    // broadcast materialization vs 0.5 s parallel). NULL filtering happens
    // AFTER the checkpoint on the null-key GROUPS — same rows excluded,
    // but an isNotNull predicate on an aggregate-derived input column
    // re-shapes the upstream join into exactly that pathological
    // broadcast build (measured 6.6 s vs 0.6 s for the identical
    // checkpoint without the pre-filter). Callers with a corpus-sized
    // continuous variable should pre-bucket it (the ksBinned discipline)
    // so the pair table stays domain-bounded.
    val pairs = base.groupBy(col("_x"), col("_y")).agg(count(lit(1)).as("_c"))
      .ckptLocal()
      .where(col("_x").isNotNull && col("_y").isNotNull)
    // doubled midranks per distinct value off the pair-table marginals:
    // 2·mr(v) = 2·|{u < v}| + t(v) + 1
    def ranks(vc: String, out: String): DataFrame = {
      val cnt = pairs.groupBy(col(vc)).agg(sum(col("_c")).as("_t"))
      val w = Window.orderBy(col(vc))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cnt.select(col(vc),
        (lit(2L) * (sum(col("_t")).over(w) - col("_t")) + col("_t") + lit(1L))
          .as(out))
    }
    // post-checkpoint these joins are tiny⨝tiny: broadcast builds of the
    // rank tables only re-run a window over the materialized pair table
    val withR = pairs
      .join(ranks("_x", "_rx"), Seq("_x"))
      .join(ranks("_y", "_ry"), Seq("_y"))
    val c38 = col("_c").cast("decimal(38,0)")
    val agg0 = withR.agg(
      sum(col("_c")).as("_n"),
      sum(c38 * col("_rx")).as("_sx"),
      sum(c38 * col("_ry")).as("_sy"),
      sum(c38 * col("_rx") * col("_rx")).as("_sxx"),
      sum(c38 * col("_ry") * col("_ry")).as("_syy"),
      sum(c38 * col("_rx") * col("_ry")).as("_sxy"))
    val nD = col("_n").cast("double")
    def d(c: String) = col(c).cast("double")
    val varX = nD * d("_sxx") - d("_sx") * d("_sx")
    val varY = nD * d("_syy") - d("_sy") * d("_sy")
    agg0.select(col("_n").as("n"),
      when(varX > 0 && varY > 0,
        (nD * d("_sxy") - d("_sx") * d("_sy")) / sqrt(varX * varY))
        .as("rho"))
  }

  /** Day-of-week seasonal profile of the daily total series — the
    * calendar structure [[acfDaily]] detects (a lag-7 spike) made
    * legible: per-ISO-weekday mean daily total and share of mass, over
    * the gap-filled spine (absent days are real 0-days; excluding them
    * would inflate quiet weekdays). ISO numbering (1 = Monday) on both
    * engines — Spark `weekday()+1` ≡ DuckDB `isodow()` (their default
    * `dayofweek`s disagree on Sunday).
    *
    * Engine-exact without display rounding: daily totals are DECIMAL
    * sums, per-dow rollups stay DECIMAL, and each output double is one
    * correctly-rounded division of exactly-converted operands. Scale:
    * one map-side daily aggregate, then a ≤ 7-row rollup with the total
    * on an audited 1-row broadcast. Output: (dow, n_days, dow_total,
    * dow_mean, share), 7 rows. */
  def dowProfile(events: DataFrame, tsCol: Column, valCol: Column): DataFrame = {
    val daily = events.groupBy(to_date(tsCol).as("day"))
      .agg(sum(valCol.cast("decimal(18,4)")).as("_rev"))
    val spine = daily.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val filled = spine.join(daily, Seq("day"), "left")
      .select((weekday(col("day")) + lit(1)).as("dow"),
        coalesce(col("_rev"), lit(0).cast("decimal(18,4)")).as("_rev"))
    val byDow = filled.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("_rev")).as("_sum"))
    val tot = broadcast(byDow.agg(sum(col("_sum")).as("_tot")))
    byDow.crossJoin(tot) // 1-row total onto the 7-row frame — audited
      .select(col("dow"), col("n_days"),
        col("_sum").cast("double").as("dow_total"),
        (col("_sum").cast("double") / col("n_days").cast("double")).as("dow_mean"),
        (col("_sum").cast("double") / col("_tot").cast("double")).as("share"))
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

  /** Skew-safe equi-join (the JOIN counterpart of [[saltedSumCount]]'s
    * aggregation salting): the probe side's rows scatter over `saltBuckets`
    * deterministic salt values — `pmod(xxhash64(saltSource), buckets)`,
    * retry-stable because the salt is a pure function of the row, never an
    * RNG or a partition id — while every build-side row REPLICATES across
    * all buckets via one map-side `explode(sequence)`. Joining on
    * (key, salt) then spreads any single hot key's probe rows over
    * `saltBuckets` reducers instead of one. Result set identical to the
    * plain equi-join (spec-asserted); build-side cost is a ×buckets fanout,
    * so use a dimension-sized build side and fact-sized probe side.
    *
    * AQE's skew-join split handles this at runtime for sort-merge joins;
    * this is the explicit, plan-deterministic variant for when the skew is
    * KNOWN ahead of time (or AQE is unavailable: non-adaptive engines,
    * streaming micro-batches, bucketed layouts that must not re-split). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltSource: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1,
      s"saltedJoin needs saltBuckets >= 1, got $saltBuckets (0 would pmod-divide by zero)")
    require(!probe.columns.contains("_salt") && !build.columns.contains("_salt"),
      "saltedJoin reserves the _salt column; rename it on the inputs first")
    val p = probe.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets)).cast("int"))
    // sequence(int, int) is already array<int>; a cast around explode would
    // be a generator-nested-in-expression analysis error
    val b = build.withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }

  /** EXACT ntile(k) per stratum — equal-sized buckets over a deterministic
    * (value, id) order (quality deciles, curriculum phases, length-balanced
    * eval splits) — WITHOUT the per-stratum global sort a plain
    * `ntile().over(partitionBy(stratum).orderBy(...))` window costs: that
    * window drags every stratum through ONE reducer, and a 100 TB corpus
    * with a handful of sources is exactly the single-partition sort this
    * repo bans elsewhere.
    *
    * Two-phase rank instead (the corpus_shuffle/shardTokenBudget
    * discipline): (1) row_number over the FINE-GRAINED (stratum, value)
    * partitions — thousands of small sorts, no hot reducer beyond genuine
    * value skew; (2) per-(stratum, value) sizes derive OFF that window
    * chain (max row_number — no re-aggregation of the input), and their
    * running offsets + stratum totals come from windows over the
    * VALUE-DISTINCT count table, which is vocabulary-sized, not
    * corpus-sized; (3) one co-partitioned join (same (stratum, value) keys
    * the window already shuffled on; AQE broadcasts the count side)
    * reassembles global rank = offset + local rank, and the bucket falls
    * out of SQL-standard NTILE arithmetic on (rank, n): the first n%k
    * buckets hold ceil(n/k) rows, the rest floor(n/k) — all integer DIV,
    * no float boundaries. Output is row-identical to the window-ntile
    * formulation (spec-pinned). */
  def ntileBuckets(df: DataFrame, stratum: Column, value: Column,
                   id: Column, k: Int): DataFrame = {
    require(k >= 1, s"ntileBuckets needs k >= 1, got $k")
    // Explicit null-key filter, for two reasons: (1) semantics — the
    // rank-reassembly join on (stratum, value) is null-intolerant anyway,
    // so null-keyed rows can never receive a bucket (made explicit rather
    // than silent); (2) plan shape — without it the optimizer pushes
    // DIFFERENT IsNotNull sets into the two branches that scan the input
    // (ranked gets both keys, the count table only stratum), their
    // canonical forms diverge, and the (stratum, value) exchange is
    // computed twice instead of reused (the lm_bigram/ngram_novelty
    // canonicalization trap). With it, both branches share one exchange
    // (ReusedExchange, plan-asserted in the spec).
    val base = df.select(stratum.as("stratum"), value.as("value"), id.as("id"))
      .where(col("stratum").isNotNull && col("value").isNotNull)
    val wIn = Window.partitionBy(col("stratum"), col("value")).orderBy(col("id"))
    val ranked = base.withColumn("_r_in", row_number().over(wIn))
    val sizes = ranked.groupBy(col("stratum"), col("value"))
      .agg(max(col("_r_in")).cast("long").as("_cnt"))
    val wOff = Window.partitionBy(col("stratum")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("stratum"))
    val offsets = sizes
      .withColumn("_before", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
      .select(col("stratum"), col("value"), col("_before"), col("_n"))
    val r = col("_before") + col("_r_in") // 1-based rank within stratum
    val q = expr(s"_n DIV $k") // base bucket size
    val rem = col("_n") % k // first `rem` buckets hold q+1 rows
    val cut = rem * (q + 1) // rows living in the larger buckets
    ranked.join(offsets, Seq("stratum", "value"))
      .select(col("stratum"), col("value"), col("id"),
        when(r <= cut, expr(s"(_before + _r_in - 1) DIV (_n DIV $k + 1)") + 1)
          .otherwise(rem + expr(s"(_before + _r_in - 1 - (_n % $k) * (_n DIV $k + 1)) DIV (_n DIV $k)") + 1)
          .cast("int").as("bucket"))
  }

  /** Trailing calendar-window daily series: per-key daily event counts and
    * DECIMAL-exact value sums on a GAP-FILLED day spine (absent days
    * contribute zero), plus the `windowDays`-day moving sum/average — the
    * monitoring/trend feed shape (7-day revenue, rolling error rates).
    *
    * The spine makes the ROWS frame a true calendar window (without it,
    * "7 rows" silently means "7 OBSERVED days" and gaps stretch the
    * window). All windows partition on the key — daily aggregation is one
    * keyed partial-agg shuffle of (key, day, decimal, count); per-key state
    * after it is days-sized, never event-sized. Sums stay DECIMAL through
    * the sliding frame (accumulation-order independent — a double
    * running sum would be engine/partitioning dependent) and divide by the
    * ACTUAL frame row count, so the first windowDays-1 days average over
    * the days that exist. */
  def movingAvg(events: DataFrame, keyCol: Column, tsCol: Column,
                valCol: Column, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"movingAvg needs windowDays >= 1, got $windowDays")
    val daily = events
      .groupBy(keyCol.as("key"), to_date(tsCol).as("day"))
      .agg(sum(valCol.cast("decimal(18,4)")).as("_rev"), count(lit(1)).as("n_events"))
    val spine = daily.groupBy(col("key"))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col("key"), explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val filled = spine.join(daily, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        coalesce(col("_rev"), lit(0).cast("decimal(18,4)")).as("_rev"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), 0)
    filled
      .withColumn("_wsum", sum(col("_rev")).over(w))
      .withColumn("_wn", count(lit(1)).over(w))
      .select(col("key"), col("day"), col("n_events"),
        col("_rev").cast("double").as("day_value"),
        col("_wsum").cast("double").as("win_sum"),
        round(col("_wsum").cast("double") / col("_wn"), 6).as("win_avg"))
  }

  /** Exponentially-weighted moving average over the gap-filled day spine —
    * the recency-weighted companion to [[movingAvg]]'s uniform window (the
    * monitoring smoother that reacts to level shifts a flat mean lags
    * behind): weight of lag k is 2^−(k+1), truncated at `windowDays` lags
    * (2^−17 of the mass at the default 16 — negligible) and renormalized
    * by the weights actually present so the series start is unbiased.
    *
    * Engine-exact WITHOUT the decimal trick: scaling a double by a power
    * of two is EXACT (exponent arithmetic only), the term sum is a fixed
    * left-associated chain of correctly-rounded additions replayed in the
    * same order by the SQL, the weight denominator is a sum of distinct
    * dyadics (exact), and the final division rounds once. The spike flag
    * compares today against `spikeFactor`× yesterday's EWMA (one exact
    * multiply + compare); NULL on day one.
    *
    * Scale: one daily aggregate (map-side combined), a dimension-sized
    * spine explode, and ONE key-partitioned window pass evaluating all
    * `windowDays` lags (a second pass lags the computed EWMA) — the
    * movingAvg shuffle discipline. Output: (key, day, n_events,
    * day_value, ewma, spike). */
  def ewmaDaily(events: DataFrame, keyCol: Column, tsCol: Column,
                valCol: Column, windowDays: Int = 16,
                spikeFactor: Double = 4.0): DataFrame = {
    require(windowDays >= 2 && windowDays <= 32,
      s"ewmaDaily needs 2 <= windowDays <= 32, got $windowDays")
    val daily = events
      .groupBy(keyCol.as("key"), to_date(tsCol).as("day"))
      .agg(sum(valCol.cast("decimal(18,4)")).as("_rev"), count(lit(1)).as("n_events"))
    val spine = daily.groupBy(col("key"))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col("key"), explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val filled = spine.join(daily, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        coalesce(col("_rev"), lit(0).cast("decimal(18,4)")).as("_rev"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val x = col("_rev").cast("double")
    val terms = (0 until windowDays).map { k =>
      (lag(x, k).over(w), math.pow(2.0, -(k + 1)))
    }
    val num = terms.map { case (c, wk) => coalesce(c * wk, lit(0.0)) }
      .reduceLeft(_ + _)
    val den = terms.map { case (c, wk) =>
      coalesce(when(c.isNotNull, lit(wk)), lit(0.0)) }.reduceLeft(_ + _)
    val base = filled.select(col("key"), col("day"), col("n_events"),
      x.as("day_value"), (num / den).as("ewma"))
    base
      .withColumn("_prev", lag(col("ewma"), 1).over(w))
      .select(col("key"), col("day"), col("n_events"), col("day_value"),
        col("ewma"),
        // day one has no baseline — FALSE, not NULL (a nullable boolean
        // renders differently across the two gate readers)
        coalesce(col("day_value") > lit(spikeFactor) * col("_prev"),
          lit(false)).as("spike"))
  }
}
