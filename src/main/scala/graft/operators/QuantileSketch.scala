package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic MERGEABLE quantile sketch — the sketch family member
  * beside Misra-Gries ([[TextAnalysis.heavyHitters]]), CMS
  * ([[TextAnalysis.cmsSketch]]), HLL ([[TextAnalysis.hllRegisters]]) and
  * bottom-k MinHash ([[Dedup.sourceOverlapSketch]]): exact `percentile`
  * needs a full sort/ranking pass per group and `approx_percentile`'s GK
  * internals are not replayable cross-engine (the approx_stats
  * adjudication), so corpus-scale quantile MONITORING gets this instead —
  * the random-sampling mergeable quantile summary of Agarwal et al. 2012
  * ("Mergeable Summaries", PODS) with the md5-threshold convention
  * replacing random coins (the L29i/L29o discipline: every "coin" is a
  * pure function of the row key, so any engine, any partitioning, any
  * retry draws the SAME sample).
  *
  * Construction: each row gets a 60-bit uniform integer
  * v = first 15 md5 hex digits of its UNIQUE row key; its level
  * ℓmax(v) = 60 − bitlength(v) (60 for v = 0) says how many times the row
  * survives halving — `v < 2^(60−ℓ)` with probability 2^−ℓ, exactly the
  * geometric level assignment of the paper, and `bin()` being unpadded in
  * Spark and DuckDB alike makes bitlength a pure string-length op (the
  * HLL ρ precedent). The sketch at capacity k keeps the rows of the
  * SMALLEST level ℓ* whose survivor count is ≤ k; those survivors are a
  * uniform sample of the input (every row passes the same
  * hash-threshold), so the rank-r order statistic of the m ≤ k survivors
  * estimates quantile p at rank ⌈p·m⌉ with the sample's O(1/√m) rank
  * error — and when n ≤ k the sketch holds EVERYTHING and is exact.
  *
  * MERGE LAW (exact, spec-pinned as set equality): survivors carry
  * (v60, value), so for sketches A, B of disjoint shards,
  * merge = distinct-union of survivor rows re-thresholded at
  * ℓ' = min{ℓ ≥ max(ℓA, ℓB) : count(lmax ≥ ℓ) ≤ k}. Because
  * cnt_{A∪B}(ℓ) ≥ cnt_A(ℓ), the union's own level is ≥ both inputs', and
  * every union row at that level is present in one of the two survivor
  * tables — so merge(sketch(A), sketch(B)) EQUALS sketch(A ∪ B), level
  * included, with zero approximation introduced at merge time (the CMS
  * cell-sum / HLL register-max law, for quantiles). The distinct on
  * (v60, value) also makes the fold IDEMPOTENT BY CONTENT — replaying a
  * batch re-unions the same rows into a no-op (the HLL side of the
  * streaming-guard contrast family; see
  * [[graft.streaming.StreamingQuantile]]) — at the documented ~2^−60
  * per-pair collision risk of two distinct rows sharing (v60, value).
  *
  * Scale: level assignment is map-side; the level histogram shuffles
  * ≤ 61 rows per group per task (map-side combined); the level choice is
  * a ≤ 61×61 candidate frame (no window, no sort); survivors filter
  * map-side against a broadcast per-group level and collapse into ONE
  * bounded sorted array per group (≤ k elements — the TopKAgg bound
  * argument). Nothing anywhere is corpus-sized after the first
  * aggregation; groups hash independently.
  *
  * Requires k ≥ 16: the chosen level's survivor count concentrates in
  * (k/2, k] and the probability of an empty sketch (all mass skipping a
  * level) is astronomically small for any real k; quantiles of a group
  * whose every candidate level overflows k (> k rows at v60 = 0 — needs
  * 2^60 md5 collisions) would drop the group rather than mis-estimate. */
object QuantileSketch {

  private val Levels = 60

  /** 60-bit uniform integer from the row key (15 md5 hex digits). */
  private def v60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Survival level: 60 − bitlength(v), 60 at v = 0 — `bin()` is unpadded
    * in both engines, the HLL ρ discipline. */
  private def lmaxOf(v: Column): Column =
    when(v === 0L, lit(Levels))
      .otherwise(lit(Levels) - length(bin(v))).cast("int")

  /** (group, v60, value, lmax) row table — shared prelude. */
  private def leveled(df: DataFrame, groupCol: Option[String], keyCol: String,
                      valueCol: String): DataFrame =
    df.select(
        groupCol.map(col).getOrElse(lit("_all")).as("_grp"),
        v60(col(keyCol)).as("v60"),
        col(valueCol).cast("double").as("value"))
      .where(col("value").isNotNull)
      .withColumn("_lmax", lmaxOf(col("v60")))

  /** Per-group sketch level ℓ* = min{ℓ ≥ floor : cnt(lmax ≥ ℓ) ≤ k},
    * from a (group, lmax, count) histogram: a ≤ 61-candidate explode per
    * histogram row — dimension-sized, no window, no sort. */
  private def levelOf(hist: DataFrame, k: Int, floor: Column): DataFrame =
    hist
      .select(col("_grp"), col("_lmax"), col("_c"),
        explode(sequence(lit(0), lit(Levels))).as("_cl"))
      .where(col("_cl") >= floor && col("_lmax") >= col("_cl"))
      .groupBy(col("_grp"), col("_cl")).agg(sum(col("_c")).as("_n"))
      .where(col("_n") <= k)
      .groupBy(col("_grp")).agg(min(col("_cl")).as("level"))

  /** The lake-resident sketch table: (level, v60, value), ≤ k rows —
    * the mergeable artifact ([[merge]], [[graft.streaming.StreamingQuantile]]).
    * `keyCol` must be a unique row id (the md5-coin source). */
  def sketch(df: DataFrame, keyCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 16, s"quantile sketch needs k >= 16, got $k")
    val rl = leveled(df, None, keyCol, valueCol)
    val hist = rl.groupBy(col("_grp"), col("_lmax")).agg(count(lit(1)).as("_c"))
    val ls = levelOf(hist, k, lit(0))
    rl.join(broadcast(ls), Seq("_grp"))
      .where(col("_lmax") >= col("level"))
      .select(col("level"), col("v60"), col("value"))
  }

  /** Exact sketch merge (see the object scaladoc's merge law):
    * distinct-union of survivors, re-thresholded at the smallest
    * admissible level at or above both inputs' levels. Result is
    * row-identical to [[sketch]] of the concatenated inputs (spec-pinned),
    * and idempotent by content under replayed inputs. */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 16, s"quantile sketch needs k >= 16, got $k")
    val floor = a.select(col("level")).unionByName(b.select(col("level")))
      .agg(max(col("level")).as("_floor"))
    val u = a.unionByName(b).select(col("v60"), col("value")).distinct()
      .select(lit("_all").as("_grp"), col("v60"), col("value"),
        lmaxOf(col("v60")).as("_lmax"))
    val hist = u.groupBy(col("_grp"), col("_lmax")).agg(count(lit(1)).as("_c"))
      // bounded 1-row stats join: both sides are sketch-sized (≤ 61 rows /
      // 1 row) — the established 1-row-stats crossJoin class
      .crossJoin(broadcast(floor))
    val ls = levelOf(hist, k, col("_floor"))
    u.join(broadcast(ls), Seq("_grp"))
      .where(col("_lmax") >= col("level"))
      .select(col("level"), col("v60"), col("value"))
  }

  /** Quantile estimates straight from a data frame — per group when
    * `groupCol` is set. `psPermille` are integer per-mille ranks (500 =
    * median); the estimate is the survivor order statistic at
    * ⌈p·m⌉ = (p·m + 999) div 1000, all-integer, engine-exact given the
    * sample. Output: ([group,] p_permille, est, level, n_survivors,
    * n_rows). */
  def estimates(df: DataFrame, groupCol: Option[String], keyCol: String,
                valueCol: String, k: Int, psPermille: Seq[Int]): DataFrame = {
    require(k >= 16, s"quantile sketch needs k >= 16, got $k")
    require(psPermille.nonEmpty && psPermille.forall(p => p >= 1 && p <= 1000),
      s"psPermille must be in [1, 1000], got $psPermille")
    val rl = leveled(df, groupCol, keyCol, valueCol)
    val hist = rl.groupBy(col("_grp"), col("_lmax")).agg(count(lit(1)).as("_c"))
    // ONE candidates aggregate yields both the level and the group total
    // (cnt at candidate 0 IS n, every row having lmax >= 0) — a separate
    // n_rows histogram would re-scan the corpus and re-pay the md5 chain
    // (plan-read: it showed up as a third full scan)
    val ls = hist
      .select(col("_grp"), col("_lmax"), col("_c"),
        explode(sequence(lit(0), lit(Levels))).as("_cl"))
      .where(col("_lmax") >= col("_cl"))
      .groupBy(col("_grp"), col("_cl")).agg(sum(col("_c")).as("_n"))
      .groupBy(col("_grp")).agg(
        min(when(col("_n") <= k, col("_cl"))).as("level"),
        max(when(col("_cl") === 0, col("_n"))).as("n_rows"))
      .where(col("level").isNotNull)
    val packed = rl.join(broadcast(ls), Seq("_grp"))
      .where(col("_lmax") >= col("level"))
      .groupBy(col("_grp"), col("level"), col("n_rows"))
      // bounded collect: ≤ k survivors per group by the level choice
      .agg(sort_array(collect_list(col("value"))).as("_vals"),
        count(lit(1)).as("n_survivors"))
    val est = packed
      .select(col("_grp"), col("level"), col("n_survivors"), col("n_rows"),
        col("_vals"), explode(typedLit(psPermille)).as("p_permille"))
      .select(col("_grp"), col("p_permille").cast("int").as("p_permille"),
        element_at(col("_vals"),
          expr("CAST((p_permille * n_survivors + 999) div 1000 AS INT)")).as("est"),
        col("level"), col("n_survivors"), col("n_rows"))
    groupCol match {
      case Some(g) => est.withColumnRenamed("_grp", g)
      case None => est.drop("_grp")
    }
  }
}
