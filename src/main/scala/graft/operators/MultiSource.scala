package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-source merge, reconciliation, and per-source aggregation.
  *
  * Re-expresses the reference's merged views and cross-source checks
  * (sql/create_merged_views.sql:18-168 UNION-ALL-with-source-tag views;
  * :205-235 inner-join attribute compare and `NOT IN` only-in-one-source
  * queries). The `NOT IN` anti-semijoins become `left_anti` joins — NULL-safe
  * and broadcast/shuffle-hash eligible, unlike a `NOT IN` subquery which
  * degenerates at scale and silently drops rows when the subquery yields
  * NULLs.
  */
object MultiSource {

  /** Tag every row with its origin (create_merged_views.sql:21 `'CSV' as source`). */
  def tagged(df: DataFrame, source: String): DataFrame =
    df.select(lit(source).as("source") +: df.columns.toIndexedSeq.map(col): _*)

  /** UNION ALL of per-source frames, by column name. All frames must share a
    * schema (the merged views' contract). */
  def mergedUnion(sources: Map[String, DataFrame]): DataFrame =
    sources.toSeq.sortBy(_._1).map { case (tag, df) => tagged(df, tag) }
      .reduce(_.unionByName(_))

  /** Inner-join compare on a business key: rows present in both sources whose
    * compared attributes differ (create_merged_views.sql:205-214). Output has
    * `<key>, left_<attr>, right_<attr>...` columns. */
  def reconInner(left: DataFrame, right: DataFrame, key: String, attrs: Seq[String]): DataFrame = {
    val l = left.select((key +: attrs).map(col): _*).as("l")
    val r = right.select((key +: attrs).map(col): _*).as("r")
    val diff = attrs.map(a => !(col(s"l.$a") <=> col(s"r.$a"))).reduce(_ || _)
    l.join(r, col(s"l.$key") === col(s"r.$key"))
      .where(diff)
      .select(col(s"l.$key").as(key) +:
        attrs.flatMap(a => Seq(col(s"l.$a").as(s"left_$a"), col(s"r.$a").as(s"right_$a"))): _*)
  }

  /** Rows only present in `left` (create_merged_views.sql:228-231's
    * `NOT IN` → left_anti). */
  def reconOnlyIn(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right.select(col(key)), Seq(key), "left_anti")

  /** Corpus/table snapshot diff — the versioning audit between two
    * snapshots of the same entity: every key is classified added /
    * removed / changed / unchanged by comparing a CONTENT HASH of the
    * payload columns (computed map-side, so wide payloads — document
    * text — never cross the shuffle; only 8-byte ids and 32-hex digests
    * do). One full-outer join on the key is the whole plan: dataset
    * versioning at 100 TB costs one id-keyed co-partitioned pass.
    *
    * The hashed encoding is INJECTIVE over the payload tuple: each value
    * is tagged and length-prefixed (`N` for NULL, `V<bytes>:<value>`
    * otherwise), so a NULL→'' transition or a would-be separator byte
    * inside a value can never alias a different payload to the same
    * digest (a plain separator-joined concat hashes both identically and
    * silently misreports 'changed' rows as 'unchanged').
    *
    * Output: (keyCol, status). Assumes `keyCol` is unique within each
    * snapshot (the corpus invariant every upstream dedup stage enforces);
    * duplicate keys would fan the join out row-multiplicatively, counting
    * phantom changed/unchanged rows. Pass `failOnDuplicateKeys = true` to
    * make that loud: each snapshot gains a key-partitioned count window
    * (the SAME partitioning the join needs, so no extra exchange) and the
    * first duplicate key raises instead of fanning out. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   payloadCols: Seq[String],
                   failOnDuplicateKeys: Boolean = false): DataFrame = {
    require(payloadCols.nonEmpty, "snapshotDiff needs payload columns")
    def enc(c: String): Column = {
      val s = col(c).cast("string")
      when(s.isNull, lit("N"))
        .otherwise(concat(lit("V"), octet_length(s).cast("string"), lit(":"), s))
    }
    def digest(df: DataFrame, tag: String, as: String) = {
      val base = df.select(col(keyCol).as("_id"),
        md5(concat(payloadCols.map(enc): _*)).as(as))
      if (!failOnDuplicateKeys) base
      else {
        val cnt = count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("_id")))
        // the guard rides inside the digest column so pruning can't drop it
        base.select(col("_id"),
          when(cnt > 1, raise_error(concat(
            lit(s"snapshotDiff: duplicate $keyCol in $tag snapshot: "),
            col("_id").cast("string"))))
            .otherwise(col(as)).as(as))
      }
    }
    val o = digest(oldDf, "old", "_oh")
    val n = digest(newDf, "new", "_nh")
    o.join(n, Seq("_id"), "full_outer")
      .select(col("_id").as(keyCol),
        when(col("_oh").isNull, "added")
          .when(col("_nh").isNull, "removed")
          .when(col("_oh") =!= col("_nh"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Fuzzy record linkage — BLOCKED pairwise edit-distance matching, the
    * data-integration step above [[reconInner]]'s exact-key compare: when
    * two sources disagree on (or lack) a shared business key, records
    * link by name similarity instead. Candidates form ONLY inside blocks
    * (`blockCol`, a cheap recall-preserving key both sides compute —
    * phonetic code, zip, suffix digits), so the O(|name|²) Levenshtein
    * runs on block-local pairs and the all-pairs cross product never
    * exists — the same candidate-generation discipline as the LSH/prefix
    * dedup family, applied to entity resolution. Pairs keep when
    * levenshtein ≤ `maxDist` (0 = exact dupes across sources; small
    * positive = typos/truncations; case mutations and real differences
    * score past any small threshold and drop).
    *
    * Scale: one block-keyed equi-join (both sides shuffle on the block
    * key; skewed blocks are visible in [[graft.operators.Analytics]]'
    * skew profile and salt like any hot join key). Output:
    * (id_a, id_b, name_a, name_b, dist). */
  def fuzzyLinkage(left: DataFrame, right: DataFrame, idCol: String,
                   nameCol: String, blockCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"fuzzyLinkage needs maxDist >= 0; got $maxDist")
    val l = left.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      col(blockCol).as("_blk"))
    val r = right.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      col(blockCol).as("_blk"))
    // Single evaluation per candidate pair: `dist` is emitted through a
    // one-element explode, so it is a GENERATOR OUTPUT — Catalyst cannot
    // push the `dist <= maxDist` filter below the Generate (a plain
    // projected alias gets substituted into the pushed predicate and the
    // O(|name|²) levenshtein re-evaluates per pair in the join condition
    // AND the projection — the round-14 double-compute, same class as the
    // classifier's size(_grams) regression). Plan-pinned in the spec.
    l.join(r, "_blk")
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        explode(array(levenshtein(col("name_a"), col("name_b")).cast("int")))
          .as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** EXACT edit-distance self-join (Ed-Join, Xiao et al. VLDB'08 —
    * q-gram prefix filtering for edit similarity): EVERY pair of records
    * whose string's Levenshtein distance is ≤ `d`, with a COMPLETENESS
    * GUARANTEE — the tier above [[fuzzyLinkage]], whose blocking key
    * trades recall for locality (a typo IN the blocking key silently
    * loses the pair). Output: (id_a, id_b, dist), id_a < id_b.
    *
    * Candidate generation, never all-pairs:
    *  - q-gram prefix path: each edit destroys ≤ q of a string's
    *    positional q-grams, so ed(a,b) ≤ d ⟹ the gram multisets overlap
    *    in ≥ max(|Gₐ|,|G_b|) − q·d grams; whenever that bound is ≥ 1 the
    *    classic prefix principle applies — order gram OCCURRENCES by
    *    ascending corpus frequency (rarest first, ties (gram, pos)) and
    *    any qualifying pair must share a gram among each string's first
    *    q·d + 1 occurrences. Join keys are therefore the RAREST grams;
    *    the hot grams that would explode a naive gram join are exactly
    *    the ones excluded (the [[graft.operators.Dedup.setSimJoin]]
    *    df-ascending discipline, re-derived for edit distance).
    *  - short-string path: when BOTH strings have ≤ q·d grams (length
    *    ≤ q·d + q − 1) the overlap bound is vacuous and they may share
    *    no gram at all; that class pairs through a LENGTH-bucketed equi
    *    join instead (each short string probes the lengths within ±d —
    *    never a global cartesian). Its output is inherently dense (all
    *    1-char strings are pairwise within ed 2), which is a property of
    *    the PROBLEM, not the plan.
    *    Pairs of a short and a long string need no special path: either
    *    the length filter kills them (gramless vs >q·d-gram strings) or
    *    the long side's bound ≥ 1 re-enables the prefix principle and
    *    the short side's prefix is its whole gram list.
    *  - every candidate then passes |len(a) − len(b)| ≤ d and ONE exact
    *    `levenshtein` verification (the Generate-barrier single-eval
    *    shape from [[fuzzyLinkage]]).
    *
    * Shuffle inventory: one gram-keyed df aggregate, one id-partitioned
    * window (per-string occurrence rank — strings are short, partitions
    * are per-record), one gram-keyed prefix self-join whose two sides
    * are the same subtree, one short-class length join, one pair
    * distinct, two id-keyed verify joins.
    *
    * Choosing q (the round-18 scale-curve finding): completeness is
    * q-independent — q only sets candidate selectivity. On digit-heavy
    * key domains (TPC-H-style "Supplier#000000NNN" names) every 2-gram's
    * df grows linearly with n, so q=2 candidates grow ~quadratically
    * past ~5k strings; q=3 restored ~linear growth at byte-identical
    * matches (bench_logs/r18/SCALE_CURVE.md). Rule of thumb: q=2 below
    * ~5k strings, 3 to ~500k, 4 above. */
  def editJoin(df: DataFrame, idCol: String, strCol: String,
               d: Int, q: Int = 2): DataFrame = {
    require(d >= 0 && q >= 2, s"editJoin needs d >= 0, q >= 2; got d=$d q=$q")
    val s0 = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
      .where(col("_s").isNotNull)
    val prefixLen = q * d + 1
    val shortLen = q * d + q - 1 // both-sides-short ⇒ vacuous overlap bound
    // positional q-gram occurrences
    val grams = s0.where(length(col("_s")) >= q)
      .select(col("_id"),
        posexplode(transform(sequence(lit(1), length(col("_s")) - (q - 1)),
          i => col("_s").substr(i, lit(q)))).as(Seq("_pos", "_g")))
    val dfc = grams.groupBy(col("_g")).agg(count(lit(1)).as("_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_df"), col("_g"), col("_pos"))
    val prefix = grams.join(dfc, "_g")
      .withColumn("_rn", row_number().over(w)).where(col("_rn") <= prefixLen)
      .select(col("_id"), col("_g"))
    val gramCand = prefix.select(col("_id").as("id_a"), col("_g"))
      .join(prefix.select(col("_id").as("id_b"), col("_g")), "_g")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val shorts = s0.where(length(col("_s")) <= shortLen)
    val shortProbe = shorts.select(col("_id").as("id_a"),
      explode(sequence(greatest(lit(0), length(col("_s")) - d),
        length(col("_s")) + d)).as("_lk"))
    val shortCand = shortProbe
      .join(shorts.select(col("_id").as("id_b"), length(col("_s")).as("_lk")), "_lk")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // Explicit-N respread of the candidate pairs (exempt from AQE
    // coalescing): the pair table is BYTE-tiny (16 B/row) but each row
    // costs an O(|s|²) levenshtein downstream, so AQE's byte-based
    // coalesce otherwise collapses the verify to one task (measured
    // 1.8 s single-task at sf0.1). One extra exchange of 16 B rows buys
    // a guaranteed-parallel verify at every scale.
    val verify = gramCand.unionByName(shortCand).distinct()
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .join(s0.select(col("_id").as("id_a"), col("_s").as("_sa")), "id_a")
      .join(s0.select(col("_id").as("id_b"), col("_s").as("_sb")), "id_b")
      .where(abs(length(col("_sa")) - length(col("_sb"))) <= d)
    // Generate barrier: one levenshtein per candidate (see fuzzyLinkage)
    verify
      .select(col("id_a"), col("id_b"),
        explode(array(levenshtein(col("_sa"), col("_sb")).cast("int"))).as("dist"))
      .where(col("dist") <= d)
  }

  /** Per-group record counts with per-source breakdown
    * (create_merged_views.sql:172-202 `COUNT(*)` + `SUM(CASE WHEN source…)`).
    * Partial aggregation (map-side combine) applies automatically. */
  def perSourceAgg(merged: DataFrame, groupCols: Seq[String], sourceTags: Seq[String]): DataFrame = {
    val perSource = sourceTags.map(t =>
      sum(when(col("source") === t, 1).otherwise(0)).as(s"${t.toLowerCase}_count"))
    merged.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("total_count"), perSource: _*)
  }
}
