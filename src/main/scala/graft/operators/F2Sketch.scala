package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS "tug-of-war" second-frequency-moment sketch (Alon–Matias–Szegedy
  * 1996) — the JOIN-SIZE / skew sketch beside the frequency
  * ([[TextAnalysis.cmsSketch]]), cardinality ([[TextAnalysis.hllRegisters]]),
  * quantile ([[QuantileSketch]]) and overlap ([[Dedup.sourceOverlapSketch]])
  * sketches: F2 = Σ_k f_k² is EXACTLY the self-join size of the stream on
  * its key (and a·b-style sketches estimate binary equi-join sizes the same
  * way), the quantity a distributed planner needs to size shuffles and pick
  * broadcast-vs-exchange BEFORE running the join. The exact computation is
  * a full vocabulary groupBy (billions of distinct keys at corpus scale);
  * this sketch answers in 96 longs.
  *
  * Construction (derandomized the md5 way — the L29i/L29o convention): each
  * key VALUE draws 96 ±1 signs from the first 96 bits of md5(key) (three
  * 32-bit hex words, one bit per estimator — so every occurrence of a key
  * pulls the same sign on any engine/partitioning/retry), and estimator i
  * keeps the running signed sum Z_i = Σ_k f_k·s_i(k). E[Z²] = F2 and
  * Var(Z²) ≤ 2·F2², so averaging 16 estimators and taking the median of
  * the 6 group means concentrates the estimate (the paper's
  * median-of-means). Every Z_i is an INTEGER sum; group means divide by 16
  * and the even-median averages two doubles — all dyadic, single-op,
  * engine-exact, so the whole estimator replays bit-for-bit in SQL.
  *
  * Scale: the sign projection is map-side (one md5 + three word extracts
  * per row); the 96 sums partial-aggregate per task, so ≤ 96 longs per
  * task cross the shuffle — ONE corpus pass, state O(1) regardless of key
  * cardinality. MERGE LAW: the sketch is LINEAR, so cells merge by
  * estimator-wise SUM exactly like [[TextAnalysis.cmsSketch]] cells
  * (spec-pinned) — per-shard/per-day sketches roll up without re-reading
  * the stream, and a STREAMING fold would need the CMS-style `_bid` replay
  * guard (sums are not idempotent), the documented contrast with HLL's
  * max / the quantile sketch's distinct.
  *
  * NULL keys are dropped (a null never joins, so it contributes nothing
  * to a join size).
  */
object F2Sketch {

  /** 6 groups × 16 estimators — means are /16 (dyadic-exact) and the
    * median of 6 averages two order statistics (dyadic-exact). 96 total,
    * NOT md5's full 128 bits: the sums run as ONE wide whole-stage-codegen
    * aggregate, and 96 sum columns (+ group keys) stays under Spark's
    * spark.sql.codegen.maxFields = 100 — at 128 the stage drops to the
    * interpreted path and the scan goes ~8× slower (measured at sf0.1;
    * the explode-to-narrow-agg alternative was worse still: the Generate
    * materializes |rows|·128 tuples). */
  val Groups = 6
  val PerGroup = 16
  val Estimators: Int = Groups * PerGroup // 96 of md5's 128 bits

  /** The mergeable cell table: (groupCols..., _e, z) with _e in [0, 96) —
    * ≤ 96 rows per group at ANY stream size: ONE wide whole-stage-codegen
    * aggregate of 96 signed sums, then a bounded posexplode of the
    * per-group result row reshapes to cells (merge = sum over `z` grouped
    * by (group, _e) — the object scaladoc's merge law).
    *
    * The md5 and its three 32-bit words (hex digits [8j+1, 8j+8), each
    * < 2^63) materialize in their OWN projections before the aggregate:
    * inlining them into the 96 sign expressions re-evaluates the hash 96
    * times per row (no CSE across aggregate inputs — measured ~8× slower
    * at sf0.1), and CollapseProject keeps the split because a non-cheap
    * producer referenced more than once doesn't collapse. Sign of
    * estimator i = 1 − 2·bit(i), bit i read from word i/32 at offset
    * i%32 — per-row cost is one md5, three convs, and 96 shift-ands. */
  def f2Cells(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val g = groupCols.map(col)
    val nWords = Estimators / 32
    val withHash = df.where(col(keyCol).isNotNull)
      .select(g :+ md5(col(keyCol).cast("string")).as("_h"): _*)
    val withWords = withHash.select(g ++ (0 until nWords).map(j =>
      conv(substring(col("_h"), 8 * j + 1, 8), 16, 10).cast("long").as(s"_w$j")): _*)
    val sums = (0 until Estimators).map { i =>
      sum(lit(1L) - lit(2L) *
        (shiftright(col(s"_w${i / 32}"), i % 32) % 2L)).as(s"_z$i")
    }
    val wide = withWords.groupBy(g: _*).agg(sums.head, sums.tail: _*)
    wide.select(g :+ posexplode(array((0 until Estimators)
        .map(i => col(s"_z$i")): _*)).as(Seq("_e", "z")): _*)
  }

  /** Median-of-means estimate from a cell table: mean of Z² within each of
    * the 6 estimator groups (exact /16), median of the 6 means (exact
    * average of the 3rd and 4th order statistics). Output:
    * (groupCols..., f2_est). */
  def f2EstimateFromCells(cells: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    cells
      .groupBy(g :+ (col("_e") / lit(PerGroup)).cast("int").as("_g"): _*)
      .agg((sum(col("z") * col("z")).cast("double") / lit(PerGroup)).as("_mean"))
      .groupBy(g: _*)
      .agg(sort_array(collect_list(col("_mean"))).as("_ms")) // bounded: 6 doubles
      .select(g :+ ((element_at(col("_ms"), Groups / 2)
        + element_at(col("_ms"), Groups / 2 + 1)) / 2.0).as("f2_est"): _*)
  }

  /** AMS INNER-PRODUCT join-size estimate (the second half of the
    * tug-of-war paper): because the sign of a key value is the same on
    * BOTH sides, E[Z_a·Z_b] = Σ_k f_a(k)·f_b(k) — EXACTLY the output
    * cardinality of A ⋈ B on that key, the number that decides
    * broadcast-vs-shuffle and flags fan-out blowups BEFORE the join
    * runs. Each side is its own [[f2Cells]] table (96 longs, built
    * independently — per-table sketches are reusable planner statistics,
    * computed once and joined pairwise at negligible cost); the
    * median-of-means chain is [[f2EstimateFromCells]]'s with products in
    * place of squares. The verification surface pairs it with the exact
    * Σ c_a·c_b from two vocabulary passes. Output: one row (n_a, n_b,
    * join_exact, join_est, rel_err). */
  def joinSizeDiagnostics(a: DataFrame, keyA: String,
                          b: DataFrame, keyB: String): DataFrame = {
    val ca = f2Cells(a.select(col(keyA).as("_k")), Nil, "_k")
      .withColumnRenamed("z", "_za")
    val cb = f2Cells(b.select(col(keyB).as("_k")), Nil, "_k")
      .withColumnRenamed("z", "_zb")
    val est = ca.join(cb, "_e") // 96 rows x 96 rows on the estimator key
      .groupBy((col("_e") / lit(PerGroup)).cast("int").as("_g"))
      .agg((sum(col("_za") * col("_zb")).cast("double") / lit(PerGroup)).as("_mean"))
      .agg(sort_array(collect_list(col("_mean"))).as("_ms")) // bounded: 6 doubles
      .select(((element_at(col("_ms"), Groups / 2)
        + element_at(col("_ms"), Groups / 2 + 1)) / 2.0).as("join_est"))
    val ea = a.where(col(keyA).isNotNull)
      .groupBy(col(keyA).as("_k")).agg(count(lit(1)).as("_ca"))
    val eb = b.where(col(keyB).isNotNull)
      .groupBy(col(keyB).as("_k")).agg(count(lit(1)).as("_cb"))
    val stats = ea.join(eb, Seq("_k"), "outer")
      .agg(sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"),
        coalesce(sum(col("_ca") * col("_cb")), lit(0L)).as("join_exact"))
    stats.crossJoin(est) // 1 row x 1 row — the audited 1-row-stats class
      .select(col("n_a"), col("n_b"), col("join_exact"), col("join_est"),
        // NULL on an empty exact join (0/0 has no meaningful ratio; the
        // estimate is a signed double near zero — only the EXACT side
        // should gate on emptiness)
        when(col("join_exact") > 0,
          round((col("join_est") - col("join_exact")) / col("join_exact"), 6))
          .as("rel_err"))
  }

  /** The verification surface (the [[TextAnalysis.cmsCounts]] probe
    * discipline): sketch estimate beside the EXACT F2 from a full
    * vocabulary pass — production reads the sketch alone; the exact pass
    * exists to measure it. Output: (groupCols..., n_rows, n_keys,
    * f2_exact, f2_est, rel_err) with rel_err = round((est−exact)/exact, 6),
    * identically parenthesized in the SQL replay. */
  def f2Diagnostics(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val g = groupCols.map(col)
    val est = f2EstimateFromCells(f2Cells(df, groupCols, keyCol), groupCols)
    val exact = df.where(col(keyCol).isNotNull)
      .groupBy(g :+ col(keyCol).as("_k"): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(g: _*)
      .agg(sum(col("_c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(col("_c") * col("_c")).as("f2_exact"))
    val joined =
      if (groupCols.isEmpty) exact.crossJoin(est) // 1 row × 1 row
      else exact.join(est, groupCols)
    joined.select(g ++ Seq(col("n_rows"), col("n_keys"), col("f2_exact"),
      col("f2_est"),
      round((col("f2_est") - col("f2_exact")) / col("f2_exact"), 6)
        .as("rel_err")): _*)
  }
}
