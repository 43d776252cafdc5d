package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed data-quality rule engine with clean/error zone split.
  *
  * Re-expresses the reference's quality engine
  * (STEP3_QUALITY_ENGINE.py:107-178): per-row rule validation, duplicate
  * detection, and the clean/error zone split, plus the rejected-row audit
  * trail (main.py:273-326 FailedDataLogger) and per-zone monitoring stats
  * (dashboard.py:30-40).
  *
  * Scale design: the reference tracks duplicates with in-memory
  * `seen_ids`/`seen_emails` sets (STEP3_QUALITY_ENGINE.py:113-115) — a
  * driver-side pattern that cannot scale. Here duplicate detection is a
  * window function partitioned by the key (`row_number > 1`), so it shuffles
  * once on the key and scales horizontally. ALL rules for a row are evaluated
  * in a single pass (one projection, whole-stage codegen) — not one pass per
  * rule.
  */
object Quality {

  /** A named validation rule: `violated` is true when the row FAILS. */
  final case class Rule(name: String, violated: Column)

  /** Rule-builder vocabulary — the terse constructors that let a catalog of
    * reference-scale rule sets ("106 rules", STEP3_QUALITY_ENGINE.py) be
    * declared in a few lines. All are pure Column predicates: the whole
    * catalog still evaluates in ONE pass. */
  object Rules {
    import org.apache.spark.sql.functions._
    def notNull(c: String): Rule =
      Rule(s"null_$c", col(c).isNull)
    def nonEmpty(c: String): Rule =
      Rule(s"empty_$c", col(c).isNull || length(trim(col(c))) === 0)
    def inSet(c: String, allowed: Seq[String]): Rule =
      Rule(s"bad_$c", col(c).isNotNull && !col(c).isin(allowed: _*))
    def inRange(c: String, lo: Double, hi: Double): Rule =
      Rule(s"range_$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))
    def positive(c: String): Rule =
      Rule(s"nonpositive_$c", col(c).isNotNull && col(c) <= 0)
    def matches(c: String, pattern: String, label: String): Rule =
      Rule(label, col(c).isNotNull && !col(c).rlike(pattern))
    def maxLength(c: String, n: Int): Rule =
      Rule(s"too_long_$c", col(c).isNotNull && length(col(c)) > n)
  }

  val ErrorsCol = "_errors"

  /** Duplicate-key rule: flags every copy after the first, ordered by
    * `tieBreak` for determinism (reference keeps the first-seen row). */
  def duplicateKeyRule(name: String, key: Column, tieBreak: Seq[Column]): (DataFrame => DataFrame, Rule) = {
    val rnCol = s"_rn_$name"
    val add = (df: DataFrame) =>
      df.withColumn(rnCol, row_number().over(Window.partitionBy(key).orderBy(tieBreak: _*)))
    (add, Rule(name, col(rnCol) > 1))
  }

  /** Referential-integrity rule: flags rows whose non-null `fkCol` has no
    * match in the dimension. Implemented as a broadcast left join adding a
    * `_fk_ok_<name>` marker column; the returned Rule reads it. The
    * reference checks FKs row-at-a-time against the DB
    * (STEP4_TRANSFORM_LOAD.py lookups); here it is one broadcast join. */
  def fkRule(name: String, fkCol: Column, dim: DataFrame, dimKey: String): (DataFrame => DataFrame, Rule) = {
    val marker = s"_fk_ok_$name"
    val add = (df: DataFrame) => {
      val keys = dim.select(col(dimKey).as("_fk_key")).distinct()
        .withColumn(marker, org.apache.spark.sql.functions.lit(true))
      df.join(org.apache.spark.sql.functions.broadcast(keys),
        fkCol === col("_fk_key"), "left").drop("_fk_key")
    }
    (add, Rule(name, fkCol.isNotNull && col(marker).isNull))
  }

  /** Annotate every row with `_errors`: a ' | '-joined list of violated rule
    * names, empty string when the row is valid
    * (STEP3_QUALITY_ENGINE.py:147-150 error_row["_errors"]). */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val parts = rules.map(r => when(r.violated, lit(r.name)))
    df.withColumn(ErrorsCol, concat_ws(" | ", parts: _*))
  }

  /** Valid rows → clean zone (STEP3_QUALITY_ENGINE.py:131-134). */
  def cleanZone(annotated: DataFrame): DataFrame =
    annotated.where(col(ErrorsCol) === "").drop(ErrorsCol)

  /** Invalid rows + reasons → error zone (STEP3_QUALITY_ENGINE.py:144-150). */
  def errorZone(annotated: DataFrame): DataFrame =
    annotated.where(col(ErrorsCol) =!= "")

  /** Single-pass column profiling: null count, distinct count, min/max per
    * column (dashboard.py-style data monitoring, computed distributed). All
    * aggregates evaluate in ONE pass over the data; the per-column reshape
    * is a codegen'd `stack` over the single aggregate row. min/max surface
    * as strings for a uniform schema.
    *
    * Scale note: the EXACT multi-column distinct counts force Catalyst's
    * Expand strategy — the input is replicated once per distinct aggregate
    * and sort-aggregated twice. That is the correct distributed shape for
    * exact answers, and its cost is real partial-aggregation CPU, not
    * avoidable stages. At 100 TB, exact per-column distincts are the wrong
    * tool: use the HLL-based `approx_stats` surface (SparkEntry) — one
    * plain hash-aggregate pass, no Expand, ±2% — and reserve this exact
    * profile for dimension-sized tables and drift checks. */
  def profileColumns(df: DataFrame, columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = columns.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"_nn_$c"),
      countDistinct(col(c)).as(s"_nd_$c"),
      min(col(c)).cast("string").as(s"_mn_$c"),
      max(col(c)).cast("string").as(s"_mx_$c")))
    val base = df.agg(count(lit(1)).as("_n"), aggs: _*)
    // column names land in a quoted SQL literal AND in identifiers — SqlLit
    // escapes quotes+backslashes in the literal and backtick-quotes the
    // identifiers so hostile names profile instead of breaking the parse
    val stackExpr = s"stack(${columns.length}, " + columns.map { c =>
      def m(prefix: String) = SqlLit.ident(s"$prefix$c")
      s"${SqlLit.lit(c)}, ${m("_nn_")}, ${m("_nd_")}, ${m("_mn_")}, ${m("_mx_")}"
    }.mkString(", ") +
      ") as (col_name, n_nulls, n_distinct, min_value, max_value)"
    base.selectExpr("_n as n_rows", stackExpr)
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Snapshot profile drift: compare two snapshots' per-column profiles and
    * flag what changed — the schema/data-drift monitor run between staging
    * loads (the reference re-checks table structure every run;
    * STEP3/CHECK_TABLE_STRUCTURE). Each side is ONE aggregation pass
    * ([[profileColumns]]); the comparison joins the two dimension-sized
    * profile tables. Null-rate drift is compared in per-mille integers so
    * the flag never sits on a float boundary. */
  def profileDrift(before: DataFrame, after: DataFrame,
                   columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    // ONE side-tagged aggregate chain instead of two: profiling each
    // snapshot separately plans the whole Expand + multi-distinct
    // aggregate cascade twice and runs both chains' stages back to back
    // (the inputs are usually two slices of the same table, so the scans
    // were never the cost — the chains were). The union is profiled in a
    // single grouped pass, and the before/after comparison is a
    // conditional-aggregation pivot of the 2·|columns| stacked profile
    // rows — dimension-sized, no self-join, so the expensive subtree is
    // planned and executed exactly once.
    val keep = columns.map(col)
    val tagged = before.select(lit("a").as("_side") +: keep: _*)
      .unionByName(after.select(lit("b").as("_side") +: keep: _*))
    val aggs = columns.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"_nn_$c"),
      countDistinct(col(c)).as(s"_nd_$c"),
      min(col(c)).cast("string").as(s"_mn_$c"),
      max(col(c)).cast("string").as(s"_mx_$c")))
    val base = tagged.groupBy(col("_side")).agg(count(lit(1)).as("_n"), aggs: _*)
    val stackExpr = s"stack(${columns.length}, " + columns.map { c =>
      def m(prefix: String) = SqlLit.ident(s"$prefix$c")
      s"${SqlLit.lit(c)}, ${m("_nn_")}, ${m("_nd_")}, ${m("_mn_")}, ${m("_mx_")}"
    }.mkString(", ") +
      ") as (col_name, n_nulls, n_distinct, min_value, max_value)"
    val prof = base.selectExpr("_side", "_n as n_rows", stackExpr)
    // pivot a/b back into columns; coalesce the counts so an EMPTY
    // snapshot (no group row at all) behaves like profileColumns' global
    // aggregate over zero rows: n_rows/n_distinct 0, min/max null
    def side(s: String, c: String) = max(when(col("_side") === s, col(c)))
    // zero-rows guard: an empty snapshot otherwise yields 0/0 → NaN whose
    // ANSI cast to long throws instead of reporting the drift
    def permille(nulls: Column, rows: Column): Column =
      when(rows === 0, lit(0L))
        .otherwise(floor(nulls * 1000 / rows).cast("long"))
    val grouped = prof.groupBy(col("col_name"))
      .agg(
        coalesce(side("a", "n_rows"), lit(0L)).as("rows_before"),
        coalesce(side("b", "n_rows"), lit(0L)).as("rows_after"),
        (coalesce(side("b", "n_distinct"), lit(0L)) -
          coalesce(side("a", "n_distinct"), lit(0L))).as("distinct_delta"),
        (permille(side("b", "n_nulls"), coalesce(side("b", "n_rows"), lit(0L))) -
          permille(side("a", "n_nulls"), coalesce(side("a", "n_rows"), lit(0L))))
          .as("null_permille_delta"),
        (coalesce(side("a", "min_value"), lit("")) =!= coalesce(side("b", "min_value"), lit("")) ||
          coalesce(side("a", "max_value"), lit("")) =!= coalesce(side("b", "max_value"), lit("")))
          .as("range_changed"))
      .withColumn("drifted",
        col("distinct_delta") =!= 0 || col("null_permille_delta") =!= 0 ||
        col("range_changed"))
    // both-snapshots-empty degenerate case: the side-tagged groupBy has no
    // group rows AT ALL, so the fused chain would emit zero rows where the
    // former two-profile formulation (a global aggregate per side) still
    // reported one zero-drift row per column — and monitor_feed's
    // col_drift metric would silently vanish. Union a literal per-column
    // default table and resolve with max(struct(...)): the leading _real
    // flag makes any genuine row beat its default, the extra aggregate
    // runs over at most 2·|columns| rows (dimension-sized — no scan, no
    // join, no eager probe; limit-1 probes were measured at +0.3 s), and
    // the plan audit's no-join single-Expand shape is preserved.
    val s = before.sparkSession
    import s.implicits._
    val defaults = columns.map(c => (c, 0L, 0L, 0L, 0L, false, false))
      .toDF("col_name", "rows_before", "rows_after", "distinct_delta",
        "null_permille_delta", "range_changed", "drifted")
    val fields = Seq("rows_before", "rows_after", "distinct_delta",
      "null_permille_delta", "range_changed", "drifted")
    grouped.withColumn("_real", lit(1))
      .unionByName(defaults.withColumn("_real", lit(0)))
      .groupBy(col("col_name"))
      .agg(max(struct((col("_real") +: fields.map(col)): _*)).as("_r"))
      .select(col("col_name") +: fields.map(f => col(s"_r.$f").as(f)): _*)
  }

  /** Per-zone record counts (dashboard.py:30-40 pipeline stats). */
  def zoneStats(annotated: DataFrame, entity: String, keyCol: String): DataFrame =
    annotated
      .withColumn("zone", when(col(ErrorsCol) === "", lit("clean")).otherwise(lit("error")))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col(keyCol)).as("n_keys"))
      .withColumn("entity", lit(entity))

  /** Per-rule violation counts (FailedDataLogger-style audit rollup,
    * main.py:273-326). Explodes the joined reason string back into rules. */
  def ruleAudit(annotated: DataFrame): DataFrame =
    errorZone(annotated)
      .select(explode(split(col(ErrorsCol), " \\| ")).as("rule"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_violations"))

  /** LITERAL catalog audit: one output row per declared rule — including
    * rules with ZERO violations, which [[ruleAudit]]'s explode-the-reasons
    * form cannot report — so the control report proves the whole catalog
    * ran, not just the rules that fired. One aggregation pass (each rule's
    * predicate sums in the same projection; whole-stage codegen'd like
    * [[annotate]]), then a stack reshape of the single aggregate row.
    * Output: (entity, rule, n_violations). */
  def catalogCounts(df: DataFrame, rules: Seq[Rule], entity: String): DataFrame = {
    require(rules.nonEmpty, "catalogCounts needs at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(r.violated.cast("long")).as(s"_r$i")
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${rules.length}, " + rules.zipWithIndex.map { case (r, i) =>
      s"${SqlLit.lit(r.name)}, _r$i" }.mkString(", ") +
      ") as (rule, n_violations)"
    base.selectExpr(stackExpr)
      .select(lit(entity).as("entity"), col("rule"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
  }

  /** Unified monitoring feed — the data behind the reference's dashboard
    * (dashboard.py:30-40 renders zone counts, rule violations, drift and
    * hot keys on one page; the Flask/HTML layer is serving, this is the
    * one query it polls): each monitoring table contributes rows under its
    * metric name as (metric, key, value) — the long format a dashboard,
    * alerting rule, or metrics store ingests directly.
    *
    * Scale: every input is already dimension-sized by construction (zone
    * counts, per-rule counts, top-N hot keys, per-column flags), so the
    * feed is a union of tiny aggregates — the heavy lifting stays in the
    * source aggregations, each independently scale-safe. */
  def monitorFeed(parts: Seq[(String, DataFrame, Column, Column)]): DataFrame =
    parts.map { case (metric, df, key, value) =>
      df.select(lit(metric).as("metric"), key.cast("string").as("key"),
        value.cast("double").as("value"))
    }.reduce(_ unionByName _)

  /** The feed's zone_rows + rule_violations metrics fused into ONE pass
    * over the annotated table: each row emits its zone struct plus one
    * struct per violated rule, then a single explode + single (metric, key)
    * count. Feeding [[zoneStats]] and [[ruleAudit]] to [[monitorFeed]]
    * separately instead plans the whole annotate subtree (scan, dup-key
    * window, FK broadcast join) TWICE — under AQE the duplicated exchanges
    * may or may not be reused at runtime, and either way the explode and
    * both aggregate stages stay duplicated. Same output rows as the
    * two-part form (oracle-checked via `monitor_feed`). */
  def zoneRuleMetrics(annotated: DataFrame): DataFrame =
    annotated
      .select(explode(concat(
        array(struct(
          lit("zone_rows").as("metric"),
          when(col(ErrorsCol) === "", lit("clean")).otherwise(lit("error")).as("key"))),
        when(col(ErrorsCol) === "", array().cast("array<struct<metric:string,key:string>>"))
          .otherwise(transform(split(col(ErrorsCol), " \\| "),
            r => struct(lit("rule_violations").as("metric"), r.as("key"))))
      )).as("m"))
      .groupBy(col("m.metric").as("metric"), col("m.key").as("key"))
      .agg(count(lit(1)).cast("double").as("value"))

  /** Zone-file preview (dashboard.py:124-157 `get_file_content`): the
    * first `n` rows of a zone table in LONG format — one output row per
    * (row, column) cell as (rn, col_name, dtype, cell) — which is exactly
    * the reference endpoint's payload (`columns` list + row dicts) as a
    * relation instead of JSON. `dtype` pins the zone's schema into the
    * preview (the reference returns the column list; a typed preview is
    * strictly more useful and costs nothing).
    *
    * Determinism: "first N" is meaningless on a distributed table without
    * an order, so rows are the TOP-N under `orderCols` (callers pass a
    * unique composite — the driver's hash compare needs a deterministic
    * row SET). Scale: orderBy+limit plans as TakeOrderedAndProject (per-
    * partition top-N heaps, no global sort), the row_number window runs on
    * the already-LIMITed n-row frame (bounded — the vocab_top precedent),
    * and the per-cell explode multiplies n by the column count map-side.
    * Float cells print via DECIMAL(18,2) so both engines format
    * identically (testdata money columns are 2dp-exact doubles). */
  def zonePreview(zone: DataFrame, orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1 && n <= 10000, s"zonePreview needs 1 <= n <= 10000, got $n")
    val ord = orderCols.map(col)
    val head = zone.orderBy(ord: _*).limit(n)
      .withColumn("rn", row_number().over(Window.orderBy(ord: _*)))
    val cells = zone.schema.fields.toIndexedSeq.map { f =>
      val cell = f.dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          col(f.name).cast("decimal(18,2)").cast("string")
        case _ => col(f.name).cast("string")
      }
      struct(lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"), cell.as("cell"))
    }
    head.select(col("rn"), explode(array(cells: _*)).as("_c"))
      .select(col("rn"), col("_c.col_name").as("col_name"),
        col("_c.dtype").as("dtype"), col("_c.cell").as("cell"))
  }

  /** Error-audit tail (dashboard.py:207-224 `get_logs` over the reject
    * log, by way of the error zone): the LAST `n` rejected rows by stable
    * id — what a dashboard user tails after a run to see the newest
    * failures with their reasons. `orderCols` descending must be a unique
    * composite for a deterministic row set; plans as
    * TakeOrderedAndProject, never a global sort. */
  def auditTail(annotated: DataFrame, orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1 && n <= 10000, s"auditTail needs 1 <= n <= 10000, got $n")
    errorZone(annotated).orderBy(orderCols.map(col(_).desc): _*).limit(n)
  }

  /** Benford's-law first-significant-digit probabilities as pinned 6dp
    * literals — log10(1 + 1/d) for d = 1..9, rounded to 6dp (they sum to
    * exactly 1.000000 at this rounding), inlined IDENTICALLY into the
    * Spark plan and the oracle SQL so no engine ever evaluates log10. */
  private[graft] val BenfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** Benford's-law first-digit conformance test (Benford 1938; Nigrini's
    * forensic-accounting staple) — the data-QUALITY gate for naturally-
    * generated positive amounts: organic multi-scale quantities (prices,
    * populations, file sizes) follow P(d) = log10(1+1/d), while fabricated,
    * truncated, or default-filled columns don't — a spike at one leading
    * digit is the classic symptom of synthetic rows, capped fields, or a
    * unit mix-up. The digit histogram with per-digit χ² contributions;
    * [[benfordStat]] rolls it to the one-row verdict.
    *
    * Engine-exact: the first significant digit is extracted from the
    * DECIMAL(18,6) canonical string (both engines render the same fixed-
    * scale form — no float formatting), expected probabilities are pinned
    * 6dp literals (see [[BenfordP]]), and p_obs / χ² terms are fixed-
    * parenthesization single-op chains rounded to 6dp. Zero/NULL values
    * carry no leading digit and drop (documented: Benford applies to
    * nonzero magnitudes). Scale: one map-side digit projection + a 9-row
    * aggregate; the total rides an audited 1-row broadcast onto the 9-row
    * grid. Output: (digit, n_obs, p_obs, p_benford, chi_term), 9 rows. */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val obs = df
      .select(abs(col(valueCol)).cast("decimal(18,6)").cast("string").as("_s"))
      .where(col("_s").isNotNull)
      .select(regexp_extract(col("_s"), "[1-9]", 0).as("_d"))
      .where(col("_d") =!= "") // zero values have no significant digit
      .groupBy(col("_d").cast("int").as("digit"))
      .agg(count(lit(1)).as("_c"))
    val spark = df.sparkSession
    val grid = spark.range(1, 10).select(col("id").cast("int").as("digit"))
      .withColumn("p_benford",
        BenfordP.foldLeft(lit(null).cast("double")) { case (acc, (d, p)) =>
          when(col("digit") === d, lit(p)).otherwise(acc) })
    val tot = broadcast(obs.agg(sum(col("_c")).as("_n")))
    val joined = grid.join(obs, Seq("digit"), "left")
      .select(col("digit"), col("p_benford"),
        coalesce(col("_c"), lit(0L)).as("n_obs"))
      .crossJoin(tot) // 1-row total onto the 9-row grid — audited class
    val e = col("_n").cast("double") * col("p_benford")
    joined.select(col("digit"), col("n_obs"),
      round(col("n_obs").cast("double") / col("_n").cast("double"), 6).as("p_obs"),
      col("p_benford"),
      round((col("n_obs").cast("double") - e) * (col("n_obs").cast("double") - e) / e, 6)
        .as("chi_term"))
  }

  /** [[benfordDigits]] rolled to the one-row verdict: χ² = Σ chi_term
    * (8 degrees of freedom — reject conformance at 1% past 20.09, the
    * pinned critical value), and Nigrini's MAD = mean |p_obs − p_benford|
    * (his thresholds: < 0.006 close conformance, > 0.015 nonconformance).
    * The 6dp-rounded per-digit terms sum in DECIMAL (order-free), so both
    * statistics and the boolean are engine-exact.
    * Output: one row (n_values, chi2, mad, reject_1pct). */
  def benfordStat(df: DataFrame, valueCol: String): DataFrame = {
    val d = benfordDigits(df, valueCol)
    val chi2 = sum(col("chi_term").cast("decimal(18,6)")).cast("double")
    val mad = (sum(round(abs(col("p_obs") - col("p_benford")), 6)
      .cast("decimal(18,6)")).cast("double") / lit(9.0))
    d.agg(sum(col("n_obs")).as("n_values"), chi2.as("chi2"),
        round(mad, 6).as("mad"))
      .withColumn("reject_1pct", col("chi2") > lit(20.090))
  }

  /** Per-entity rule CATALOGS — the reference's "106 rules" registry
    * (STEP3_QUALITY_ENGINE.py:7, rule_registry.validate_row per entity;
    * the registry module itself ships only as an import, so the catalogs
    * re-derive the rule families its transformers and trackers imply:
    * identity/duplicate tracking via seen_ids/seen_emails
    * (STEP3_QUALITY_ENGINE.py:111-115,131-142), contact normalization —
    * digits-only sdt, lowercase email — and per-field presence/format from
    * data_transformer.py:14-45, numeric coercion-with-default from :57-66).
    *
    * Each catalog returns (prep, rules): `prep` installs any marker columns
    * (FK broadcast joins), `rules` is the pure-Column predicate set — the
    * whole catalog still evaluates in ONE pass through [[annotate]] or
    * [[catalogCounts]]. Entity names follow the reference's §3 mapping
    * (khach_hang=customer, dat_hang=orders, mon=part,
    * nha_cung_cap=supplier). */
  object Catalogs {
    /** khach_hang (customer): identity, name shape, contact formats
      * (email/phone are the reference's lowercase-email and digits-only-sdt
      * disciplines turned into validations), balance range, segment domain,
      * nation FK. Expects `c_email`/`c_phone` columns (synthesized upstream
      * when the source lacks them). */
    def customer(nation: DataFrame): (DataFrame => DataFrame, Seq[Rule]) = {
      val (addFk, fkNation) = fkRule("fk_nation", col("c_nationkey"), nation, "n_nationkey")
      (addFk, Seq(
        Rules.notNull("c_custkey"),
        Rules.nonEmpty("c_name"),
        Rules.maxLength("c_name", 30),
        Rules.matches("c_email", "^[A-Za-z0-9._-]+@[A-Za-z0-9.-]+$", "bad_email"),
        Rules.matches("c_phone", "^[0-9-]+$", "bad_phone"),
        Rules.inRange("c_acctbal", -999.99, 9999.99),
        Rules.inSet("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
        fkNation))
    }

    /** dat_hang (orders): customer FK + presence, price positivity, status
      * and priority domains, not-in-the-future date. */
    def orders(customer: DataFrame): (DataFrame => DataFrame, Seq[Rule]) = {
      val (addFk, fkCust) = fkRule("fk_customer", col("o_custkey"), customer, "c_custkey")
      (addFk, Seq(
        Rules.notNull("o_custkey"),
        fkCust,
        Rules.positive("o_totalprice"),
        Rules.inSet("o_orderstatus", Seq("O", "F", "P")),
        Rule("future_date",
          col("o_orderdate").isNotNull &&
            col("o_orderdate") > to_timestamp(lit("2002-01-01"))),
        Rules.matches("o_orderpriority", "^[1-5]-[A-Z ]+$", "bad_priority")))
    }

    /** mon (part): name presence, price positivity, size range, brand
      * format, type presence. */
    def part(): (DataFrame => DataFrame, Seq[Rule]) =
      (identity[DataFrame] _, Seq(
        Rules.nonEmpty("p_name"),
        Rules.positive("p_retailprice"),
        Rules.inRange("p_size", 1, 50),
        Rules.matches("p_brand", "^Brand#[0-9]+$", "bad_brand"),
        Rules.notNull("p_type")))

    /** nha_cung_cap (supplier): name presence, phone format, balance range,
      * nation FK. Expects an `s_phone` column. */
    def supplier(nation: DataFrame): (DataFrame => DataFrame, Seq[Rule]) = {
      val (addFk, fkNation) = fkRule("fk_nation", col("s_nationkey"), nation, "n_nationkey")
      (addFk, Seq(
        Rules.nonEmpty("s_name"),
        Rules.matches("s_phone", "^[0-9-]+$", "bad_phone"),
        Rules.inRange("s_acctbal", -999.99, 9999.99),
        fkNation))
    }

    /** loai_mon (category dimension — nation here): key presence, name
      * presence/length/shape (reference category names are a fixed
      * uppercase vocabulary), region FK. */
    def loaiMon(region: DataFrame): (DataFrame => DataFrame, Seq[Rule]) = {
      val (addFk, fkRegion) = fkRule("fk_region", col("n_regionkey"), region, "r_regionkey")
      (addFk, Seq(
        Rules.notNull("n_nationkey"),
        Rules.nonEmpty("n_name"),
        Rules.maxLength("n_name", 25),
        Rules.matches("n_name", "^[A-Z ]+$", "bad_n_name_shape"),
        fkRegion))
    }

    /** nguyen_lieu (inventory movements — lineitem here): part key
      * presence, supplier FK, quantity range, movement-code domains (the
      * reference's don_vi unit-domain discipline over returnflag and
      * linestatus), discount range, price positivity. */
    def nguyenLieu(supplier: DataFrame): (DataFrame => DataFrame, Seq[Rule]) = {
      val (addFk, fkSupp) = fkRule("fk_supplier", col("l_suppkey"), supplier, "s_suppkey")
      (addFk, Seq(
        Rules.notNull("l_partkey"),
        fkSupp,
        Rules.inRange("l_quantity", 1, 50),
        Rules.inSet("l_returnflag", Seq("A", "N", "R")),
        Rules.inSet("l_linestatus", Seq("O", "F")),
        Rules.inRange("l_discount", 0.0, 0.1),
        Rules.positive("l_extendedprice")))
    }
  }
}
