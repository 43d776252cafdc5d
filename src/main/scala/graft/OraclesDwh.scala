package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.IngestDiscovery
/** Oracle-SQL registry part 1 (see SparkEntry.oracleSql for the contract):
  * the trained-ANN and tokenizer replays (xxhash64 limb arithmetic,
  * recursive segmentation CTEs) plus the reference-ETL families — ingest,
  * merge/recon, quality, star/SCD2, warehouse analytics, the
  * monitoring/statistics family, and event analytics. */
private[graft] object OraclesDwh {
  import QueryShared._

  val entries: Map[String, String] = Map(
    // ann_ivf — the TRAINED-centroid IVF search, re-derived END-TO-END
    // including training (round 12; closes SURVEY §7.6's "k-means is not
    // SQL-oracle-able" question in the negative for THIS trainer):
    // trainCentroids is one deterministic hash-ordered sample (xxhash64
    // replayed bit-exact above) + seed selection (numCells smallest
    // hashes) + ONE k-means step (cosine assignment, tie to lowest cell;
    // per-dim means summed in SAMPLE order via list(... ORDER BY sp) +
    // list_reduce — matching the Scala fold order), with numCells/nprobe
    // derived from the corpus count exactly as adaptiveCells /
    // adaptiveProbes do — so even the ADAPTIVE SIZING is oracled. The
    // search tail is the ann_ivf_fixed chain under the computed centroids.
    "ann_ivf" ->
      s"""WITH $annQcCtes,
        |${xxhash64Ctes("c0", "neighbor_id")},
        |$ivfTrainCtes,
        |cand AS (SELECT query_id, neighbor_id FROM probes JOIN cell_of USING (cell)),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
        |    FROM cand JOIN q0 USING (query_id) JOIN c0 USING (neighbor_id)),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rank FROM s WHERE NOT isnan(sim))
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 10""".stripMargin,
    // ann_pq — the TRAINED-codebook flat PQ search, oracled with its
    // training (round 12): pqTrain's hash sample/seeds/one-k-means-step
    // replay via pqTrainCtes (per-subspace argmin-L2, sample-order means,
    // empty codes keep seeds), then the SAME ADC chain as ann_pq_fixed.
    "ann_pq" ->
      s"""WITH $annQcCtes,
        |${xxhash64Ctes("c0", "neighbor_id")},
        |tsrc AS (SELECT neighbor_id, cv AS tv FROM c0),
        |${pqTrainCtes("tsrc")},
        |${adcSearchCtes("(SELECT query_id, neighbor_id FROM q0, c0) AS cand")}""".stripMargin,
    // ann_ivfpq — trained centroids routing trained global codebooks:
    // both trainings replay (they share the xxhash64 chain — the sample
    // selections hash the same id column), candidates are the probed-cell
    // pairs, the ADC chain is shared with ann_pq/ann_pq_fixed.
    "ann_ivfpq" ->
      s"""WITH $annQcCtes,
        |${xxhash64Ctes("c0", "neighbor_id")},
        |$ivfTrainCtes,
        |tsrc AS (SELECT neighbor_id, cv AS tv FROM c0),
        |${pqTrainCtes("tsrc")},
        |${adcSearchCtes("(SELECT query_id, neighbor_id FROM probes JOIN cell_of USING (cell)) AS cand")}""".stripMargin,
    // ann_ivfpq_res — the residual refinement, oracled end-to-end:
    // residuals (x − centroid(cell), zero-padded zip) feed the SAME
    // pqTrainCtes; the search scores inner-product ADC — per-(query,
    // cell) ⟨q,c⟩ scalar + per-query LUT over the residual codes —
    // against each row's EXACT norm, with the vnorm>0 NaN guard the
    // Scala path applies, then the shared shortlist/re-rank tail.
    "ann_ivfpq_res" ->
      s"""WITH $annQcCtes,
        |${xxhash64Ctes("c0", "neighbor_id")},
        |$ivfTrainCtes,
        |res AS (SELECT c0.neighbor_id AS neighbor_id,
        |      [coalesce(cv[i], 0.0) - coalesce(cv0[i], 0.0)
        |       for i in range(1, greatest(len(cv), len(cv0)) + 1)] AS tv
        |    FROM c0 JOIN cell_of USING (neighbor_id) JOIN cents ON cents.cid = cell_of.cell),
        |${pqTrainCtes("res")},
        |enc AS (SELECT res.neighbor_id AS neighbor_id, j, c, row_number() OVER (PARTITION BY res.neighbor_id, j
        |      ORDER BY list_reduce(
        |        [(coalesce(tv[j*8+i], 0.0) - bv[i]) * (coalesce(tv[j*8+i], 0.0) - bv[i])
        |         for i in range(1, 9)], (a, b) -> a + b) ASC, c ASC) AS rn
        |    FROM res, books),
        |codes AS (SELECT neighbor_id, j, c AS code FROM enc WHERE rn = 1),
        |vn AS (SELECT neighbor_id, sqrt(list_reduce([x * x for x in cv], (a, b) -> a + b)) AS vnorm FROM c0),
        |qn AS (SELECT query_id, sqrt(list_reduce([x * x for x in qv], (a, b) -> a + b)) AS qnorm FROM q0),
        |qdc AS (SELECT query_id, cell,
        |      list_reduce([coalesce(qv[i], 0.0) * coalesce(cv0[i], 0.0)
        |        for i in range(1, greatest(len(qv), len(cv0)) + 1)], (a, b) -> a + b) AS qdotc
        |    FROM probes JOIN cents ON cents.cid = probes.cell JOIN q0 USING (query_id)),
        |cand AS (SELECT query_id, neighbor_id, cell FROM probes JOIN cell_of USING (cell)),
        |pj AS (SELECT cand.query_id, cand.neighbor_id, codes.j AS j,
        |      list_reduce([coalesce(qv[codes.j*8+i], 0.0) * bv[i] for i in range(1, 9)],
        |        (a, b) -> a + b) AS lj
        |    FROM cand
        |      JOIN codes ON codes.neighbor_id = cand.neighbor_id
        |      JOIN books ON books.j = codes.j AND books.c = codes.code
        |      JOIN q0 ON q0.query_id = cand.query_id),
        |adc AS (SELECT query_id, neighbor_id, list_reduce(list(lj ORDER BY j), (a, b) -> a + b) AS adcsum
        |    FROM pj GROUP BY query_id, neighbor_id),
        |sc AS (SELECT adc.query_id AS query_id, adc.neighbor_id AS neighbor_id,
        |      CASE WHEN vnorm > 0 THEN (qdotc + adcsum) / (qnorm * vnorm) ELSE NULL END AS asim
        |    FROM adc
        |      JOIN cand ON cand.query_id = adc.query_id AND cand.neighbor_id = adc.neighbor_id
        |      JOIN qdc ON qdc.query_id = adc.query_id AND qdc.cell = cand.cell
        |      JOIN qn ON qn.query_id = adc.query_id
        |      JOIN vn ON vn.neighbor_id = adc.neighbor_id),
        |short AS (SELECT query_id, neighbor_id FROM (
        |      SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |        ORDER BY asim DESC, neighbor_id) AS srn
        |      FROM sc WHERE asim IS NOT NULL AND NOT isnan(asim)) WHERE srn <= 80),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
        |    FROM short JOIN q0 USING (query_id) JOIN c0 USING (neighbor_id)),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rank FROM s WHERE NOT isnan(sim))
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 10""".stripMargin,
    // PQ search under the pinned seeded codebooks, re-derived end-to-end
    // (see pqFixedOracle): every corpus row is a candidate for every query
    // (flat PQ — no routing), exactly pqTopKWith's crossJoin.
    "ann_pq_fixed" -> pqFixedOracle("",
      "(SELECT query_id, neighbor_id FROM q0, c0) AS cand"),
    // IVF-PQ under pinned centroids AND codebooks: candidates are the
    // probed-cell pairs (cell = argmax cosine, tie to lowest cell id;
    // probes = each query's top-4 cells — the exact ann_ivf_fixed routing
    // CTEs), then the same ADC → shortlist → re-rank chain.
    "ann_ivfpq_fixed" -> {
      val centRows = graft.operators.Similarity.seededCentroids(16, 64)
        .map { case (cid, v) => s"($cid, [${v.mkString(", ")}])" }
        .mkString(",\n        ")
      pqFixedOracle(
        s"""
          |cents(cid, cv0) AS (VALUES
          |        $centRows),
          |casim AS (SELECT neighbor_id, cid,
          |    row_number() OVER (PARTITION BY neighbor_id
          |      ORDER BY list_cosine_similarity(cv, cv0) DESC, cid) AS crn
          |    FROM c0, cents),
          |cell_of AS (SELECT neighbor_id, cid AS cell FROM casim WHERE crn = 1),
          |probes AS (SELECT query_id, cid AS cell FROM (
          |    SELECT query_id, cid, row_number() OVER (PARTITION BY query_id
          |      ORDER BY list_cosine_similarity(qv, cv0) DESC, cid) AS qrn
          |    FROM q0, cents) WHERE qrn <= 4),""".stripMargin,
        "(SELECT query_id, neighbor_id FROM probes JOIN cell_of USING (cell)) AS cand")
    },
    // BPE segmentation under the pinned merge list, replayed as a per-word
    // rewrite system: distinct words seed a recursive state machine
    // (syms, active pair) — while the active pair occurs, merge its
    // LEFTMOST occurrence (iterated leftmost single-merge ≡ one
    // non-overlapping left-to-right pass, because merging (a,b) can never
    // create a NEW (a,b) adjacency: the merged symbol a||b is distinct
    // from both a and b, so remaining occurrences are exactly the
    // original non-overlapped ones); when the active pair is exhausted,
    // re-derive the lowest-rank pair present — the same syms state at
    // which the Scala expression recomputes after each full pass. Docs
    // reassemble by word position; wordless docs keep n_pieces=0 via the
    // LEFT JOIN.
    "bpe_segment_fixed" ->
      s"""WITH $bpeFixedCtes,
        |agg AS (SELECT doc_id, CAST(sum(len(syms)) AS INT) AS n_pieces,
        |      flatten(list(syms ORDER BY wi)) AS pieces
        |    FROM wd JOIN fin USING (w) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_pieces, 0) AS n_pieces,
        |  coalesce(array_to_string(a.pieces[1:12], ' '), '') AS head_pieces
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // Same pinned-merge segmentation machinery, aggregated per language:
    // fertility is one double division of exactly-summed integer counts.
    "bpe_fertility" ->
      s"""WITH $bpeFixedCtes,
        |agg AS (SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS np,
        |      CAST(count(*) AS BIGINT) AS nw
        |    FROM wd JOIN fin USING (w) GROUP BY doc_id)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(coalesce(a.nw, 0)) AS BIGINT) AS n_words,
        |  CAST(SUM(coalesce(a.np, 0)) AS BIGINT) AS n_pieces,
        |  CAST(SUM(coalesce(a.np, 0)) AS DOUBLE) / SUM(coalesce(a.nw, 0))
        |    AS fertility
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |GROUP BY d.lang""".stripMargin,
    // The SAME integer Viterbi DP as Bpe.unigramSegment, as a recursive
    // CTE over word prefixes: state = cost·1024+pieces combined integers
    // (one per prefix), piece lookups via a generated CASE chain from the
    // pinned inventory, list_min skipping not-in-inventory NULLs exactly
    // as Spark's array_min does. Float-free end to end.
    "unigram_segment" -> {
      val pieceCase = graft.operators.Bpe.pinnedPieces
        .map { case (p, c) => s"WHEN '$p' THEN $c" }.mkString(" ")
      // shared DP constants interpolated from Bpe — a default change there
      // reaches this CTE automatically (ADVICE r15: no silent desync)
      val base = graft.operators.Bpe.PieceScoreBase
      val maxW = graft.operators.Bpe.MaxWordLen
      val fb = graft.operators.Bpe.DefaultFallbackCost
      val mpl = graft.operators.Bpe.DefaultMaxPieceLen
      s"""WITH d0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
        |tw AS (SELECT doc_id, u AS w FROM
        |    (SELECT doc_id, unnest(toks) AS u FROM d0)
        |  WHERE u <> '' AND length(u) < $maxW),
        |w0 AS (SELECT DISTINCT w FROM tw),
        |dp AS (
        |  WITH RECURSIVE st(w, i, best) AS (
        |    SELECT w, 0, [CAST(0 AS BIGINT)] FROM w0
        |    UNION ALL
        |    SELECT w, i + 1,
        |      best || [list_min([best[j+1] +
        |        (CASE WHEN i + 1 - j = 1
        |              THEN coalesce(CASE substr(w, j+1, 1) $pieceCase END, $fb)
        |              ELSE CASE substr(w, j+1, i+1-j) $pieceCase END END) * $base + 1
        |        for j in range(greatest(0, i + 1 - $mpl), i + 1)])]
        |    FROM st WHERE i < length(w))
        |  SELECT w, best[length(w) + 1] AS fin FROM st WHERE i = length(w)),
        |seg AS (SELECT w, fin % $base AS np,
        |    CAST((fin - fin % $base) / $base AS BIGINT) AS cost FROM dp)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(s.np) AS BIGINT) AS n_pieces,
        |  CAST(sum(s.cost) AS BIGINT) AS total_cost
        |FROM tw t JOIN seg s USING (w) GROUP BY t.doc_id""".stripMargin
    },
    // WordPiece: the greedy automaton replays as a recursive CTE — state
    // (pos, np, unk) advances by the longest in-vocab match (list_max
    // over the j candidates, ##-prefixed past position 0); a NULL best
    // sets unk and halts (pos goes NULL, failing the recursion guard);
    // final rows are exactly (unk OR pos = L). Vocabulary and maxPieceLen
    // interpolate from Bpe.pinnedWordPieces / DefaultMaxPieceLen — the
    // unigram_segment no-desync rule.
    "wordpiece_segment" -> {
      val vocabList = graft.operators.Bpe.pinnedWordPieces
        .map(p => s"'$p'").mkString(", ")
      val mpl = graft.operators.Bpe.DefaultMaxPieceLen
      val js = (1 to mpl).mkString(", ")
      val maxW = graft.operators.Bpe.MaxWordLen
      s"""WITH d0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
        |tw AS (SELECT doc_id, u AS w FROM
        |    (SELECT doc_id, unnest(toks) AS u FROM d0)
        |  WHERE u <> '' AND length(u) < $maxW),
        |w0 AS (SELECT DISTINCT w FROM tw),
        |fin AS (
        |  WITH RECURSIVE st(w, L, pos, np, unk) AS (
        |    SELECT w, CAST(length(w) AS INT), 0, CAST(0 AS BIGINT), FALSE FROM w0
        |    UNION ALL
        |    SELECT w, L, CAST(pos + b AS INT), np + 1, b IS NULL FROM (
        |      SELECT w, L, pos, np,
        |        list_max([CASE WHEN pos + j <= L AND list_contains([$vocabList],
        |            CASE WHEN pos = 0 THEN substr(w, 1, j)
        |                 ELSE '##' || substr(w, pos + 1, j) END)
        |          THEN j END for j in [$js]]) AS b
        |      FROM st WHERE pos < L AND NOT unk) q)
        |  SELECT w, CASE WHEN unk THEN CAST(1 AS BIGINT) ELSE np END AS np, unk
        |  FROM st WHERE unk OR pos = L)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(f.np) AS BIGINT) AS n_pieces,
        |  CAST(sum(CASE WHEN f.unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
        |FROM tw t JOIN fin f USING (w) GROUP BY t.doc_id""".stripMargin
    },
    // ann_lsh re-derived end-to-end: the SAME 8×64 hyperplane constants
    // (java.util.Random(7) — deterministic across JVMs) rebuild every
    // signature as a bit-int; the multiprobe candidate set (query bucket
    // flipped in ≤2 positions) is EXACTLY the corpus rows within hamming
    // distance 2, so a bit_count(xor) join replaces probe enumeration;
    // cosine + (sim DESC, id) rank as in ann_topk. Sign parity of the dot
    // products holds because both engines sum index-ascending in doubles
    // and a sign flip would need |dot| below the last-ulp rounding gap.
    // DUCKDB-VERSION SENSITIVITY: this and ann_ivf_fixed lean on
    // list_dot_product / list_cosine_similarity summing index-ascending
    // in plain doubles (true of DuckDB 1.x's scalar implementation); a
    // future DuckDB that vectorizes them (pairwise/SIMD summation) could
    // flip a near-zero hyperplane dot's sign or a near-tie rank with NO
    // Spark-side change — triage a sudden red here as oracle-engine
    // drift first, not a Spark regression. (ann_pq_fixed/ann_ivfpq_fixed
    // are immune where they use list_reduce, which pins the order, but
    // share the exposure through list_cosine_similarity re-ranks.)
    "ann_lsh" -> {
      val planeRows = graft.operators.Similarity.hyperplanes(8, 64).zipWithIndex
        .map { case (p, i) => s"($i, [${p.mkString(", ")}])" }
        .mkString(",\n        ")
      s"""WITH planes(pid, pv) AS (VALUES
        |        $planeRows),
        |q0 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |    FROM embeddings WHERE vec_id < 5),
        |c0 AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |    FROM embeddings WHERE vec_id >= 5),
        |qs AS (SELECT query_id, bit_or(CASE WHEN list_dot_product(qv, pv) >= 0
        |      THEN (1::UBIGINT << pid) ELSE 0::UBIGINT END) AS sig
        |    FROM q0, planes GROUP BY query_id),
        |cs AS (SELECT neighbor_id, bit_or(CASE WHEN list_dot_product(cv, pv) >= 0
        |      THEN (1::UBIGINT << pid) ELSE 0::UBIGINT END) AS sig
        |    FROM c0, planes GROUP BY neighbor_id),
        |cand AS (SELECT query_id, neighbor_id FROM qs JOIN cs
        |    ON bit_count(xor(qs.sig, cs.sig)) <= 2),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
        |    FROM cand JOIN q0 USING (query_id) JOIN c0 USING (neighbor_id)),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rank FROM s WHERE NOT isnan(sim))
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 10""".stripMargin
    },
    "normalize_strings" ->
      """SELECT c_custkey,
        |  regexp_replace(trim(c_name), '\s+', ' ', 'g') AS name_norm,
        |  nullif(regexp_replace(c_name, '[^0-9]', '', 'g'), '') AS id_digits,
        |  lower(trim(c_mktsegment)) AS seg_norm
        |FROM customer""".stripMargin,
    "coerce_types" ->
      """SELECT event_id,
        |  regexp_extract(props, '[0-9]+', 0) AS k_raw,
        |  coalesce(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS INT), 0) AS k_int,
        |  coalesce(TRY_CAST(event_type AS INT), -1) AS bad_int,
        |  coalesce(TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS DOUBLE), 0.0) AS k_dbl
        |FROM events""".stripMargin,
    "parse_timestamps" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS parsed,
        |  TIMESTAMP '1970-01-01 00:00:00' AS parsed_fallback
        |FROM events""".stripMargin,
    "dual_format_dispatch" ->
      """SELECT p_partkey AS id, trim(p_name) AS ten_mon, CAST(NULL AS INT) AS loai_id,
        |  p_retailprice AS gia, 'csv' AS fmt FROM part WHERE p_partkey % 2 = 0
        |UNION ALL
        |SELECT p_partkey AS id, trim(p_name) AS ten_mon, CAST(p_size AS INT) AS loai_id,
        |  p_retailprice AS gia, 'sql' AS fmt FROM part WHERE p_partkey % 2 = 1""".stripMargin,
    "staged_read" ->
      """SELECT *, 'csv' AS _source, 'run_001' AS _run_id,
        |  TIMESTAMP '2026-01-01 00:00:00' AS _extract_time FROM customer""".stripMargin,
    "corpus_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 19 = 0),
        |o AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN 'N'
        |  ELSE 'V' || CAST(strlen(text) AS VARCHAR) || ':' || text END) AS oh
        |  FROM documents),
        |n AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN 'N'
        |  ELSE 'V' || CAST(strlen(text) AS VARCHAR) || ':' || text END) AS nh
        |  FROM v2)
        |SELECT doc_id,
        |  CASE WHEN oh IS NULL THEN 'added'
        |       WHEN nh IS NULL THEN 'removed'
        |       WHEN oh <> nh THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n USING (doc_id)""".stripMargin,
    "merged_union" -> (SrcCte +
      """
        |SELECT 'CSV' AS source, * FROM src_a
        |UNION ALL
        |SELECT 'SQL' AS source, * FROM src_b""".stripMargin),
    "recon_fuzzy" -> (SrcCte +
      """,
        |a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |    CAST(c_nationkey AS VARCHAR) || ':' || right(c_name, 6) AS blk FROM src_a),
        |b0 AS (SELECT c_custkey, CASE WHEN c_custkey % 7 = 0
        |      THEN substr(c_name, 1, 4) || substr(c_name, 6, 1000) ELSE c_name END AS c_name,
        |    c_nationkey FROM src_b),
        |b AS (SELECT c_custkey AS id_b, c_name AS name_b,
        |    CAST(c_nationkey AS VARCHAR) || ':' || right(c_name, 6) AS blk FROM b0)
        |SELECT id_a, id_b, name_a, name_b,
        |  CAST(levenshtein(name_a, name_b) AS INT) AS dist
        |FROM a JOIN b USING (blk)
        |WHERE levenshtein(name_a, name_b) <= 2""".stripMargin),
    // The literal definition: brute-force all pairs under the length
    // prefilter — completeness is exactly what the Spark side's prefix
    // filtering must reproduce.
    "edit_join" -> EditJoinSql,
    // edit_join_wide (q = 3) answers to the IDENTICAL brute-force oracle:
    // Ed-Join's q only prunes candidates, never matches (the r18
    // scale-curve adjudication, certified here in the driver gate).
    "edit_join_wide" -> EditJoinSql,
    "recon_inner" -> (SrcCte +
      """
        |SELECT a.c_custkey AS c_custkey,
        |  a.c_name AS left_c_name, b.c_name AS right_c_name,
        |  a.c_acctbal AS left_c_acctbal, b.c_acctbal AS right_c_acctbal
        |FROM src_a a JOIN src_b b ON a.c_custkey = b.c_custkey
        |WHERE a.c_name IS DISTINCT FROM b.c_name
        |   OR a.c_acctbal IS DISTINCT FROM b.c_acctbal""".stripMargin),
    "recon_only_left" -> (SrcCte +
      """
        |SELECT c_custkey, c_name, c_mktsegment FROM src_a a
        |WHERE NOT EXISTS (SELECT 1 FROM src_b b WHERE b.c_custkey = a.c_custkey)""".stripMargin),
    "recon_only_right" -> (SrcCte +
      """
        |SELECT c_custkey, c_name, c_mktsegment FROM src_b b
        |WHERE NOT EXISTS (SELECT 1 FROM src_a a WHERE a.c_custkey = b.c_custkey)""".stripMargin),
    "per_source_agg" -> (SrcCte + """,
        |merged AS (SELECT 'CSV' AS source, * FROM src_a UNION ALL SELECT 'SQL' AS source, * FROM src_b)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS total_count,
        |  CAST(SUM(CASE WHEN source = 'CSV' THEN 1 ELSE 0 END) AS BIGINT) AS csv_count,
        |  CAST(SUM(CASE WHEN source = 'SQL' THEN 1 ELSE 0 END) AS BIGINT) AS sql_count
        |FROM merged GROUP BY c_mktsegment""".stripMargin),
    "quality_clean" -> (DirtyCte +
      """
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src
        |FROM annotated WHERE _errors = ''""".stripMargin),
    "quality_errors" -> (DirtyCte +
      """
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src, _errors
        |FROM annotated WHERE _errors <> ''""".stripMargin),
    "pipeline_stats" -> (DirtyCte +
      """
        |SELECT CASE WHEN _errors = '' THEN 'clean' ELSE 'error' END AS zone,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
        |  'orders' AS entity
        |FROM annotated GROUP BY 1""".stripMargin),
    "error_audit" -> (DirtyCte +
      """
        |SELECT rule, CAST(count(*) AS BIGINT) AS n_violations FROM (
        |  SELECT unnest(string_split(_errors, ' | ')) AS rule
        |  FROM annotated WHERE _errors <> '') GROUP BY rule""".stripMargin),
    // Preview replay: same deterministic top-50 under the (o_orderkey, src)
    // unique composite, same long-format unpivot; double cells print via
    // DECIMAL(18,2) on both engines (2dp-exact money values), dtype strings
    // are Spark simpleString names pinned as literals.
    "zone_preview" -> (DirtyCte + """,
        |z AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src
        |  FROM annotated WHERE _errors = ''
        |  ORDER BY o_orderkey, src LIMIT 50),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY o_orderkey, src) AS INT) AS rn, * FROM z)
        |SELECT rn, 'o_orderkey' AS col_name, 'bigint' AS dtype,
        |  CAST(o_orderkey AS VARCHAR) AS cell FROM r
        |UNION ALL SELECT rn, 'o_custkey', 'bigint', CAST(o_custkey AS VARCHAR) FROM r
        |UNION ALL SELECT rn, 'o_totalprice', 'double',
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM r
        |UNION ALL SELECT rn, 'o_orderstatus', 'string', o_orderstatus FROM r
        |UNION ALL SELECT rn, 'src', 'int', CAST(src AS VARCHAR) FROM r""".stripMargin),
    "audit_tail" -> (DirtyCte +
      """
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, src, _errors
        |FROM annotated WHERE _errors <> ''
        |ORDER BY o_orderkey DESC, src DESC LIMIT 50""".stripMargin),
    "monitor_feed" -> (DirtyCte + "," + SrcCte.stripPrefix("WITH") + """,
        |pa AS (
        |  SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_value, CAST(max(c_custkey) AS VARCHAR) AS max_value FROM src_a
        |  UNION ALL SELECT 'c_name', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM src_a
        |  UNION ALL SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_acctbal) AS BIGINT),
        |    CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM src_a
        |  UNION ALL SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM src_a),
        |pb AS (
        |  SELECT 'c_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_value, CAST(max(c_custkey) AS VARCHAR) AS max_value FROM src_b
        |  UNION ALL SELECT 'c_name', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_name) AS BIGINT),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR) FROM src_b
        |  UNION ALL SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_acctbal) AS BIGINT),
        |    CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR) FROM src_b
        |  UNION ALL SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM src_b),
        |drift AS (
        |  SELECT pa.col_name AS col_name,
        |    (pb.n_distinct - pa.n_distinct <> 0
        |     OR (CASE WHEN pb.n_rows = 0 THEN 0 ELSE CAST(floor(pb.n_nulls * 1000 / pb.n_rows) AS BIGINT) END)
        |        - (CASE WHEN pa.n_rows = 0 THEN 0 ELSE CAST(floor(pa.n_nulls * 1000 / pa.n_rows) AS BIGINT) END) <> 0
        |     OR coalesce(pa.min_value, '') <> coalesce(pb.min_value, '')
        |     OR coalesce(pa.max_value, '') <> coalesce(pb.max_value, '')) AS drifted
        |  FROM pa JOIN pb ON pa.col_name = pb.col_name),
        |ck AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows FROM orders GROUP BY o_custkey),
        |hot AS (SELECT o_custkey, n_rows FROM ck ORDER BY n_rows DESC, o_custkey LIMIT 10)
        |SELECT 'zone_rows' AS metric,
        |  CASE WHEN _errors = '' THEN 'clean' ELSE 'error' END AS key,
        |  CAST(count(*) AS DOUBLE) AS value
        |FROM annotated GROUP BY 1, 2
        |UNION ALL SELECT 'rule_violations', rule, CAST(count(*) AS DOUBLE) FROM (
        |  SELECT unnest(string_split(_errors, ' | ')) AS rule
        |  FROM annotated WHERE _errors <> '') GROUP BY 1, 2
        |UNION ALL SELECT 'col_drift', col_name,
        |  CAST(CASE WHEN drifted THEN 1 ELSE 0 END AS DOUBLE) FROM drift
        |UNION ALL SELECT 'hot_key_rows', CAST(o_custkey AS VARCHAR),
        |  CAST(n_rows AS DOUBLE) FROM hot""".stripMargin),
    "quality_catalog" ->
      """WITH dc AS (SELECT
        |    CASE WHEN c_custkey % 113 = 0 THEN NULL ELSE c_custkey END AS c_custkey,
        |    CASE WHEN c_custkey % 107 = 0 THEN '  '
        |         WHEN c_custkey % 149 = 0 THEN rpad(c_name, 40, 'x') ELSE c_name END AS c_name,
        |    CASE WHEN c_custkey % 109 = 0 THEN 'bad email'
        |         ELSE 'cust' || CAST(c_custkey AS VARCHAR) || '@shop.vn' END AS c_email,
        |    CASE WHEN c_custkey % 127 = 0 THEN 'x' || lpad(CAST(c_custkey AS VARCHAR), 8, '0')
        |         ELSE lpad(CAST(c_custkey AS VARCHAR), 8, '0') END AS c_phone,
        |    CASE WHEN c_custkey % 131 = 0 THEN c_acctbal + 20000 ELSE c_acctbal END AS c_acctbal,
        |    CASE WHEN c_custkey % 137 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 139 = 0 THEN 99 ELSE c_nationkey END AS c_nationkey
        |  FROM customer),
        |dord AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |         WHEN o_orderkey % 79 = 0 THEN -1 ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 89 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 83 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 103 = 0 THEN TIMESTAMP '2099-01-01' ELSE o_orderdate END AS o_orderdate,
        |    CASE WHEN o_orderkey % 71 = 0 THEN '9-BOGUS' ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders),
        |dp AS (SELECT p_partkey,
        |    CASE WHEN p_partkey % 67 = 0 THEN '' ELSE p_name END AS p_name,
        |    CASE WHEN p_partkey % 59 = 0 THEN 'brandX' ELSE p_brand END AS p_brand,
        |    CASE WHEN p_partkey % 53 = 0 THEN NULL ELSE p_type END AS p_type,
        |    CASE WHEN p_partkey % 73 = 0 THEN 999 ELSE p_size END AS p_size,
        |    CASE WHEN p_partkey % 61 = 0 THEN 0.0 ELSE p_retailprice END AS p_retailprice
        |  FROM part),
        |ds AS (SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 29 = 0 THEN ' ' ELSE s_name END AS s_name,
        |    CASE WHEN s_suppkey % 17 = 0 THEN 'abc'
        |         ELSE '84-' || lpad(CAST(s_suppkey AS VARCHAR), 7, '0') END AS s_phone,
        |    CASE WHEN s_suppkey % 19 = 0 THEN s_acctbal + 20000 ELSE s_acctbal END AS s_acctbal,
        |    CASE WHEN s_suppkey % 23 = 0 THEN 99 ELSE s_nationkey END AS s_nationkey
        |  FROM supplier),
        |dn AS (SELECT
        |    CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey END AS n_nationkey,
        |    CASE WHEN n_nationkey % 5 = 0 THEN ' '
        |         WHEN n_nationkey % 11 = 0 THEN lower(n_name)
        |         WHEN n_nationkey % 13 = 0 THEN rpad(n_name, 30, 'X') ELSE n_name END AS n_name,
        |    CASE WHEN n_nationkey % 17 = 0 THEN 99 ELSE n_regionkey END AS n_regionkey
        |  FROM nation),
        |dl AS (SELECT
        |    CASE WHEN l_orderkey % 43 = 0 THEN NULL ELSE l_partkey END AS l_partkey,
        |    CASE WHEN l_orderkey % 23 = 0 THEN 999999 ELSE l_suppkey END AS l_suppkey,
        |    CASE WHEN l_orderkey % 19 = 0 THEN 999.0 ELSE l_quantity END AS l_quantity,
        |    CASE WHEN l_orderkey % 29 = 0 THEN 'X' ELSE l_returnflag END AS l_returnflag,
        |    CASE WHEN l_orderkey % 31 = 0 THEN 'Z' ELSE l_linestatus END AS l_linestatus,
        |    CASE WHEN l_orderkey % 37 = 0 THEN 0.9 ELSE l_discount END AS l_discount,
        |    CASE WHEN l_orderkey % 41 = 0 THEN -l_extendedprice ELSE l_extendedprice END AS l_extendedprice
        |  FROM lineitem)
        |SELECT 'khach_hang' AS entity, 'null_c_custkey' AS rule,
        |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM dc
        |UNION ALL SELECT 'khach_hang', 'empty_c_name',
        |  CAST(SUM(CASE WHEN c_name IS NULL OR length(trim(c_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'too_long_c_name',
        |  CAST(SUM(CASE WHEN c_name IS NOT NULL AND length(c_name) > 30 THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'bad_email',
        |  CAST(SUM(CASE WHEN c_email IS NOT NULL
        |    AND NOT regexp_matches(c_email, '^[A-Za-z0-9._-]+@[A-Za-z0-9.-]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'bad_phone',
        |  CAST(SUM(CASE WHEN c_phone IS NOT NULL
        |    AND NOT regexp_matches(c_phone, '^[0-9-]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'range_c_acctbal',
        |  CAST(SUM(CASE WHEN c_acctbal IS NOT NULL
        |    AND (c_acctbal < -999.99 OR c_acctbal > 9999.99) THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'bad_c_mktsegment',
        |  CAST(SUM(CASE WHEN c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
        |    ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'khach_hang', 'fk_nation',
        |  CAST(SUM(CASE WHEN c_nationkey IS NOT NULL
        |    AND c_nationkey NOT IN (SELECT n_nationkey FROM nation) THEN 1 ELSE 0 END) AS BIGINT) FROM dc
        |UNION ALL SELECT 'dat_hang', 'null_o_custkey',
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'fk_customer',
        |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'nonpositive_o_totalprice',
        |  CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'bad_o_orderstatus',
        |  CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
        |    AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'future_date',
        |  CAST(SUM(CASE WHEN o_orderdate IS NOT NULL
        |    AND o_orderdate > TIMESTAMP '2002-01-01' THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'dat_hang', 'bad_priority',
        |  CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
        |    AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dord
        |UNION ALL SELECT 'mon', 'empty_p_name',
        |  CAST(SUM(CASE WHEN p_name IS NULL OR length(trim(p_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'mon', 'nonpositive_p_retailprice',
        |  CAST(SUM(CASE WHEN p_retailprice IS NOT NULL AND p_retailprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'mon', 'range_p_size',
        |  CAST(SUM(CASE WHEN p_size IS NOT NULL AND (p_size < 1 OR p_size > 50) THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'mon', 'bad_brand',
        |  CAST(SUM(CASE WHEN p_brand IS NOT NULL
        |    AND NOT regexp_matches(p_brand, '^Brand#[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'mon', 'null_p_type',
        |  CAST(SUM(CASE WHEN p_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dp
        |UNION ALL SELECT 'nha_cung_cap', 'empty_s_name',
        |  CAST(SUM(CASE WHEN s_name IS NULL OR length(trim(s_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM ds
        |UNION ALL SELECT 'nha_cung_cap', 'bad_phone',
        |  CAST(SUM(CASE WHEN s_phone IS NOT NULL
        |    AND NOT regexp_matches(s_phone, '^[0-9-]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM ds
        |UNION ALL SELECT 'nha_cung_cap', 'range_s_acctbal',
        |  CAST(SUM(CASE WHEN s_acctbal IS NOT NULL
        |    AND (s_acctbal < -999.99 OR s_acctbal > 9999.99) THEN 1 ELSE 0 END) AS BIGINT) FROM ds
        |UNION ALL SELECT 'nha_cung_cap', 'fk_nation',
        |  CAST(SUM(CASE WHEN s_nationkey IS NOT NULL
        |    AND s_nationkey NOT IN (SELECT n_nationkey FROM nation) THEN 1 ELSE 0 END) AS BIGINT) FROM ds
        |UNION ALL SELECT 'loai_mon', 'null_n_nationkey',
        |  CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'loai_mon', 'empty_n_name',
        |  CAST(SUM(CASE WHEN n_name IS NULL OR length(trim(n_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'loai_mon', 'too_long_n_name',
        |  CAST(SUM(CASE WHEN n_name IS NOT NULL AND length(n_name) > 25 THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'loai_mon', 'bad_n_name_shape',
        |  CAST(SUM(CASE WHEN n_name IS NOT NULL
        |    AND NOT regexp_matches(n_name, '^[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'loai_mon', 'fk_region',
        |  CAST(SUM(CASE WHEN n_regionkey IS NOT NULL
        |    AND n_regionkey NOT IN (SELECT r_regionkey FROM region) THEN 1 ELSE 0 END) AS BIGINT) FROM dn
        |UNION ALL SELECT 'nguyen_lieu', 'null_l_partkey',
        |  CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'fk_supplier',
        |  CAST(SUM(CASE WHEN l_suppkey IS NOT NULL
        |    AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier) THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'range_l_quantity',
        |  CAST(SUM(CASE WHEN l_quantity IS NOT NULL
        |    AND (l_quantity < 1 OR l_quantity > 50) THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'bad_l_returnflag',
        |  CAST(SUM(CASE WHEN l_returnflag IS NOT NULL
        |    AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'bad_l_linestatus',
        |  CAST(SUM(CASE WHEN l_linestatus IS NOT NULL
        |    AND l_linestatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'range_l_discount',
        |  CAST(SUM(CASE WHEN l_discount IS NOT NULL
        |    AND (l_discount < 0.0 OR l_discount > 0.1) THEN 1 ELSE 0 END) AS BIGINT) FROM dl
        |UNION ALL SELECT 'nguyen_lieu', 'nonpositive_l_extendedprice',
        |  CAST(SUM(CASE WHEN l_extendedprice IS NOT NULL
        |    AND l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM dl""".stripMargin,
    "dim_date" ->
      """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS full_date FROM orders)
        |SELECT CAST(year(full_date)*10000 + month(full_date)*100 + dayofmonth(full_date) AS INT) AS date_key,
        |  full_date,
        |  CAST(isodow(full_date) AS INT) AS iso_dow,
        |  dayname(full_date) AS day_name,
        |  CAST(dayofmonth(full_date) AS INT) AS day_of_month,
        |  CAST(dayofyear(full_date) AS INT) AS day_of_year,
        |  CAST(weekofyear(full_date) AS INT) AS week_of_year,
        |  CAST(month(full_date) AS INT) AS month,
        |  monthname(full_date) AS month_name,
        |  CAST(quarter(full_date) AS INT) AS quarter,
        |  CAST(year(full_date) AS INT) AS year,
        |  isodow(full_date) >= 6 AS is_weekend
        |FROM d""".stripMargin,
    "star_fact" ->
      """WITH dim_c AS (SELECT c_custkey, dense_rank() OVER (ORDER BY c_custkey) AS customer_key FROM customer),
        |dim_p AS (SELECT p_partkey, dense_rank() OVER (ORDER BY p_partkey) AS part_key FROM part)
        |SELECT l.l_orderkey, l.l_linenumber,
        |  CAST(dc.customer_key AS BIGINT) AS customer_key,
        |  CAST(dp.part_key AS BIGINT) AS part_key,
        |  CAST(year(o.o_orderdate)*10000 + month(o.o_orderdate)*100 + dayofmonth(o.o_orderdate) AS INT) AS date_key,
        |  l.l_quantity AS quantity,
        |  l.l_extendedprice AS ext_price,
        |  l.l_extendedprice * (1 - l.l_discount) AS revenue,
        |  o.o_orderstatus AS status
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |LEFT JOIN dim_c dc ON o.o_custkey = dc.c_custkey
        |LEFT JOIN dim_p dp ON l.l_partkey = dp.p_partkey""".stripMargin,
    "star_full" ->
      """WITH dim_c AS (SELECT c_custkey, dense_rank() OVER (ORDER BY c_custkey) AS customer_key FROM customer),
        |dim_p AS (SELECT p_partkey, dense_rank() OVER (ORDER BY p_partkey) AS part_key FROM part),
        |dim_s AS (SELECT s_suppkey, dense_rank() OVER (ORDER BY s_suppkey) AS supplier_key FROM supplier),
        |dim_n AS (SELECT n_nationkey, dense_rank() OVER (ORDER BY n_nationkey) AS nation_key FROM nation)
        |SELECT l.l_orderkey, l.l_linenumber,
        |  CAST(dc.customer_key AS BIGINT) AS customer_key,
        |  CAST(dp.part_key AS BIGINT) AS part_key,
        |  CAST(ds.supplier_key AS BIGINT) AS supplier_key,
        |  CAST(dn.nation_key AS BIGINT) AS nation_key,
        |  CAST(year(o.o_orderdate)*10000 + month(o.o_orderdate)*100 + dayofmonth(o.o_orderdate) AS INT) AS date_key,
        |  l.l_quantity AS quantity,
        |  l.l_extendedprice * (1 - l.l_discount) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |LEFT JOIN dim_c dc ON o.o_custkey = dc.c_custkey
        |LEFT JOIN dim_p dp ON l.l_partkey = dp.p_partkey
        |LEFT JOIN dim_s ds ON l.l_suppkey = ds.s_suppkey
        |LEFT JOIN dim_n dn ON s.s_nationkey = dn.n_nationkey""".stripMargin,
    "star_orders_fact" ->
      """WITH dim_c AS (SELECT c_custkey, dense_rank() OVER (ORDER BY c_custkey) AS customer_key FROM customer)
        |SELECT o.o_orderkey,
        |  CAST(dc.customer_key AS BIGINT) AS customer_key,
        |  CAST(year(o.o_orderdate)*10000 + month(o.o_orderdate)*100 + dayofmonth(o.o_orderdate) AS INT) AS date_key,
        |  o.o_totalprice AS total_price,
        |  o.o_orderstatus AS status
        |FROM orders o
        |LEFT JOIN dim_c dc ON o.o_custkey = dc.c_custkey""".stripMargin,
    "star_inventory_fact" ->
      """WITH dim_p AS (SELECT p_partkey, dense_rank() OVER (ORDER BY p_partkey) AS part_key FROM part),
        |dim_s AS (SELECT s_suppkey, dense_rank() OVER (ORDER BY s_suppkey) AS supplier_key FROM supplier),
        |m AS (SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |    CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END AS qty_delta
        |  FROM lineitem)
        |SELECT CAST(dp.part_key AS BIGINT) AS part_key,
        |  CAST(ds.supplier_key AS BIGINT) AS supplier_key,
        |  CAST(year(m.l_shipdate)*10000 + month(m.l_shipdate)*100 + dayofmonth(m.l_shipdate) AS INT) AS date_key,
        |  m.l_orderkey, m.l_linenumber, m.qty_delta,
        |  CAST(SUM(CAST(m.qty_delta AS DECIMAL(18,2))) OVER (
        |    PARTITION BY m.l_partkey, m.l_suppkey
        |    ORDER BY m.l_shipdate, m.l_orderkey, m.l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS stock_balance
        |FROM m
        |LEFT JOIN dim_p dp ON m.l_partkey = dp.p_partkey
        |LEFT JOIN dim_s ds ON m.l_suppkey = ds.s_suppkey""".stripMargin,
    "star_rollup" ->
      """SELECT CAST(year(o.o_orderdate) AS INT) AS year,
        |  CAST(month(o.o_orderdate) AS INT) AS month,
        |  c.c_mktsegment AS segment,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "scd2_dim" ->
      """WITH snap1 AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
        |    DATE '2024-01-01' AS snap_date FROM customer),
        |snap2 AS (SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |    DATE '2024-06-01' AS snap_date FROM customer),
        |snaps AS (SELECT * FROM snap1 UNION ALL SELECT * FROM snap2),
        |v AS (SELECT *,
        |    lag(c_name) OVER w AS p_name, lag(c_mktsegment) OVER w AS p_seg,
        |    lag(c_acctbal) OVER w AS p_bal, (lag(snap_date) OVER w) IS NULL AS is_first
        |  FROM snaps WINDOW w AS (PARTITION BY c_custkey ORDER BY snap_date)),
        |kept AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal, snap_date FROM v
        |  WHERE is_first OR c_name IS DISTINCT FROM p_name
        |     OR c_mktsegment IS DISTINCT FROM p_seg OR c_acctbal IS DISTINCT FROM p_bal)
        |SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
        |  snap_date AS valid_from,
        |  lead(snap_date) OVER w2 AS valid_to,
        |  (lead(snap_date) OVER w2) IS NULL AS is_current
        |FROM kept WINDOW w2 AS (PARTITION BY c_custkey ORDER BY snap_date)""".stripMargin,
    "topn_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "topn_agg" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "rollup_revenue" ->
      """WITH f AS (SELECT CAST(year(o.o_orderdate) AS INT) AS year,
        |    c.c_mktsegment AS segment,
        |    l.l_extendedprice * (1 - l.l_discount) AS rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT year, segment, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM f GROUP BY ROLLUP(year, segment)""".stripMargin,
    "asof_last_error" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(max(CASE WHEN event_type = 'error' THEN ts END) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS TIMESTAMP) AS last_error_ts
        |FROM events""".stripMargin,
    "range_join" ->
      """WITH e AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800.0
        |    THEN 1 ELSE 0 END AS new_s FROM e),
        |g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id FROM f),
        |sessions AS (SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |    min(ts) AS session_start, max(ts) AS session_end
        |  FROM g GROUP BY user_id, session_id)
        |SELECT ev.event_id, ev.user_id, s.session_id
        |FROM events ev JOIN sessions s
        |  ON ev.user_id = s.user_id
        | AND ev.ts BETWEEN s.session_start AND s.session_end""".stripMargin,
    "salted_agg" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey AS suppkey,
        |  l.l_quantity, s.s_name, s.s_nationkey
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey""".stripMargin,
    "neardup_embedding" -> (EmbCorpusCte +
      """
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |FROM emb_corpus a JOIN emb_corpus b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.9""".stripMargin),
    // Margin mining replay (ann_lsh pinned-planes precedent): the same
    // 16x64 hyperplane constants rebuild every signature as a bit-int;
    // the per-band hamming<=1 multiprobe is EXACTLY "some 4-bit band of
    // the xor has popcount <= 1" (band masks 0xF << 4b); cosines round
    // 6dp before use, mu_k sums run over DECIMAL(18,6) and divide once
    // in doubles — margins match bit-for-bit. Shares ann_lsh's
    // documented DuckDB float-summation-order sensitivity.
    "margin_mine" -> {
      val planeRows = graft.operators.Similarity.hyperplanes(16, 64).zipWithIndex
        .map { case (p, i) => s"($i, [${p.mkString(", ")}])" }
        .mkString(",\n        ")
      val bandCond = (0 until 4)
        .map(b => s"bit_count(xor(a.sig, b.sig) & ${15L << (4 * b)}::UBIGINT) <= 1")
        .mkString(" OR ")
      s"""WITH planes(pid, pv) AS (VALUES
        |        $planeRows),
        |v AS (SELECT vec_id, CASE WHEN label % 2 = 0 THEN 'a' ELSE 'b' END AS side,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sg AS (SELECT vec_id, bit_or(CASE WHEN list_dot_product(v.v, pv) >= 0
        |      THEN (1::UBIGINT << pid) ELSE 0::UBIGINT END) AS sig
        |    FROM v, planes GROUP BY vec_id),
        |sv AS (SELECT v.vec_id, v.side, v.v, sg.sig FROM v JOIN sg USING (vec_id)),
        |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |  FROM sv a JOIN sv b ON a.side < b.side AND ($bandCond)
        |  WHERE NOT isnan(list_cosine_similarity(a.v, b.v))),
        |ranked AS (SELECT *,
        |    row_number() OVER (PARTITION BY vec_a ORDER BY cos_sim DESC, vec_b) AS ra,
        |    row_number() OVER (PARTITION BY vec_b ORDER BY cos_sim DESC, vec_a) AS rb
        |  FROM cand),
        |mua AS (SELECT vec_a, CAST(SUM(CAST(cos_sim AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS mu_a
        |  FROM ranked WHERE ra <= 4 GROUP BY vec_a),
        |mub AS (SELECT vec_b, CAST(SUM(CAST(cos_sim AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS mu_b
        |  FROM ranked WHERE rb <= 4 GROUP BY vec_b)
        |SELECT vec_a, vec_b, cos_sim,
        |  round(cos_sim / ((mu_a + mu_b) / 2), 6) AS margin
        |FROM ranked JOIN mua USING (vec_a) JOIN mub USING (vec_b)
        |WHERE (ra = 1 OR rb = 1)
        |  AND round(cos_sim / ((mu_a + mu_b) / 2), 6) >= 1.0""".stripMargin
    },
    "semantic_dedup" -> (embCorpusCte(withLabel = true) +
      """,
        |dup AS (SELECT DISTINCT x.vec_id
        |  FROM emb_corpus x JOIN emb_corpus y
        |    ON x.label = y.label AND x.vec_id > y.vec_id
        |  WHERE NOT isnan(list_cosine_similarity(x.v, y.v))
        |    AND round(list_cosine_similarity(x.v, y.v), 6) >= 0.9)
        |SELECT p.vec_id, p.label AS cell, (d.vec_id IS NULL) AS keep
        |FROM emb_corpus p LEFT JOIN dup d ON p.vec_id = d.vec_id""".stripMargin),
    // semantic_dedup_cells — the SCALE-PATH SemDeDup (round 18): clusters
    // are the DERIVED occupancy-bounded IVF cells, so the oracle replays
    // the full ann_ivf training chain (xxhash64 sample order, seeds, one
    // fold-order-pinned k-means step, cosine-DESC/lowest-cid assignment of
    // EVERY vector via cell_of) and then the within-cell pairwise keep
    // decisions at the 6dp-rounded 0.9 threshold. q0 is an empty stub:
    // ivfTrainCtes' probes CTE references it but nothing downstream here
    // does, so it never executes.
    "semantic_dedup_cells" ->
      s"""WITH c0 AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |    FROM embeddings),
        |q0 AS (SELECT neighbor_id AS query_id, cv AS qv FROM c0 WHERE false),
        |${xxhash64Ctes("c0", "neighbor_id")},
        |$ivfTrainCtes,
        |dup AS (SELECT DISTINCT x.neighbor_id AS vec_id
        |  FROM cell_of x JOIN cell_of y
        |    ON x.cell = y.cell AND x.neighbor_id > y.neighbor_id
        |  JOIN c0 cx ON cx.neighbor_id = x.neighbor_id
        |  JOIN c0 cy ON cy.neighbor_id = y.neighbor_id
        |  WHERE NOT isnan(list_cosine_similarity(cx.cv, cy.cv))
        |    AND round(list_cosine_similarity(cx.cv, cy.cv), 6) >= 0.9)
        |SELECT c.neighbor_id AS vec_id, CAST(co.cell AS INT) AS cell,
        |  (d.vec_id IS NULL) AS keep
        |FROM c0 c JOIN cell_of co USING (neighbor_id)
        |LEFT JOIN dup d ON d.vec_id = c.neighbor_id""".stripMargin,
    // The oracle brute-forces the true nearest neighbor of each perturbed
    // query; both approximate paths must have retrieved exactly it.
    "ann_recall" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, list_concat([v[1] * 1.5], v[2:64]) AS qv
        |  FROM base WHERE vec_id < 5),
        |s AS (SELECT query_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv, b.v) AS sim FROM q, base b),
        |r AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM s)
        |SELECT query_id, neighbor_id AS lsh_nn, neighbor_id AS ivf_nn,
        |  neighbor_id AS pq_nn, neighbor_id AS ivfpq_nn,
        |  neighbor_id AS ivfpqr_nn
        |FROM r WHERE rn = 1""".stripMargin,
    // IVF search under the pinned seeded centroids, re-derived end-to-end:
    // same 16×64 constants as the Spark query; cell = argmax cosine (tie
    // to lowest cell id), probes = each query's top-4 cells, candidates =
    // corpus rows in probed cells, then exact cosine top-10 as in ann_topk.
    "ann_ivf_fixed" -> ivfFixedSql("vec_id >= 5"),
    // Index-staleness replay: cell assignment re-derives from the SAME
    // pinned centroid literals (the ivfFixedSql idiom), occupancy counts
    // group the assignments, and the weighted-KS tail is the ks_drift
    // machinery over the cell-id axis; stale compares the ROUNDED d.
    "ann_index_stale" -> {
      val centRows = graft.operators.Similarity.seededCentroids(16, 64)
        .map { case (cid, v) => s"($cid, [${v.mkString(", ")}])" }
        .mkString(",\n        ")
      s"""WITH cents(cid, cv) AS (VALUES
        |        $centRows),
        |c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    (vec_id % 4 = 0) AS isnew FROM embeddings),
        |asg AS (SELECT vec_id, isnew, cid FROM (
        |    SELECT vec_id, isnew, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS rn
        |    FROM c0, cents) WHERE rn = 1),
        |base AS (SELECT cid AS v, count(*) AS ca FROM asg WHERE NOT isnew GROUP BY 1),
        |cur AS (SELECT cid AS v, count(*) AS cb FROM asg GROUP BY 1),
        |u AS (SELECT coalesce(base.v, cur.v) AS v,
        |    coalesce(base.ca, 0) AS ca, coalesce(cur.cb, 0) AS cb
        |  FROM base FULL OUTER JOIN cur ON base.v = cur.v),
        |c AS (SELECT v,
        |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        |  FROM u),
        |agg AS (SELECT CAST(max(na) AS BIGINT) AS n_train,
        |    CAST(max(nb) AS BIGINT) AS n_now,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    round(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS d_stat
        |  FROM c)
        |SELECT n_train, n_now, n_cells, d_stat, d_stat > 0.1 AS stale FROM agg""".stripMargin
    },
    // Filtered vector search: the SAME pinned-centroid IVF replay with the
    // metadata predicate pushed into the corpus scan (pre-filtering — the
    // index sees only qualifying rows, so top-k can never starve).
    "ann_filtered" -> ivfFixedSql("vec_id >= 5 AND label IN (2, 3, 5)"),
    // Winnowing fingerprints re-derived end-to-end (md5 token-hash
    // variant): per-token top-8-md5-bytes as HUGEINT, the rolling chain
    // h = (h*B + t) mod 2^64 replayed by list_reduce (B = 1000003 < 2^20
    // keeps every product under HUGEINT range), then RE-SIGNED to BIGINT
    // BEFORE the window-min — the expression's min compares SIGNED longs,
    // so the unsigned mod-2^64 value would pick a different minimum in any
    // window mixing "negative" (>= 2^63) and positive hashes. Window-min
    // of each w=4 window (the rightmost-tie rule affects positions, never
    // the selected VALUE, so plain list_min matches), distinct.
    "winnow_fingerprint" ->
      """WITH tw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents),
        |th AS (SELECT doc_id,
        |    [CAST(('0x' || substr(md5(t), 1, 16))::UBIGINT AS HUGEINT) for t in toks] AS h
        |  FROM tw),
        |kg0 AS (SELECT doc_id,
        |    [list_reduce(h[i:i+4], (a, b) -> (a * 1000003 + b) % 18446744073709551616)
        |     for i in range(1, len(h) - 3)] AS g0
        |  FROM th WHERE len(h) >= 5),
        |kg AS (SELECT doc_id,
        |    [CASE WHEN m >= 9223372036854775808
        |          THEN CAST(m - 18446744073709551616 AS BIGINT)
        |          ELSE CAST(m AS BIGINT) END for m in g0] AS g
        |  FROM kg0),
        |sel AS (SELECT doc_id, CASE WHEN len(g) <= 4 THEN [list_min(g)]
        |    ELSE [list_min(g[s:s+3]) for s in range(1, len(g) - 2)] END AS mins FROM kg)
        |SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM sel""".stripMargin,
    // Winnowing position-robustness invariant: every sampled doc must share
    // fingerprints with its prefix-shifted copy (and have a non-empty set).
    "winnow_overlap" ->
      """SELECT doc_id, true AS has_fps, true AS prefix_overlap
        |FROM documents
        |WHERE doc_id % 20 = 0
        |  AND len(string_split_regex(trim(text), '\s+')) >= 16""".stripMargin,
    "upsert_latest" ->
      """WITH existing AS (SELECT o_orderkey, o_totalprice, o_orderstatus, 1 AS batch FROM orders),
        |updates AS (SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
        |    'F' AS o_orderstatus, 2 AS batch FROM orders WHERE o_orderkey % 7 = 0),
        |merged AS (SELECT * FROM existing UNION ALL SELECT * FROM updates),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY batch DESC, o_totalprice DESC) AS rn FROM merged)
        |SELECT o_orderkey, o_totalprice, o_orderstatus, batch
        |FROM ranked WHERE rn = 1""".stripMargin,
    "anomaly_zscore" ->
      """WITH h AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |    CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1, 2),
        |s AS (SELECT *, avg(n_events) OVER (PARTITION BY event_type) AS m,
        |    stddev_pop(n_events) OVER (PARTITION BY event_type) AS sd FROM h)
        |SELECT hour, event_type, n_events,
        |  round((n_events - m) / nullif(sd, 0), 6) AS z,
        |  coalesce(abs(round((n_events - m) / nullif(sd, 0), 6)) > 2.0, false) AS is_anomaly
        |FROM s""".stripMargin,
    // Lower-median convention on BOTH sides: row_number over (value, id)
    // then the ⌈n/2⌉ rank — actual data values, no interpolation, so the
    // dev/rscore doubles replay exactly.
    "anomaly_mad" ->
      """WITH base AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |medr AS (SELECT source, v,
        |    row_number() OVER (PARTITION BY source ORDER BY v, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n FROM base),
        |med AS (SELECT source, v AS med FROM medr WHERE rn = (n + 1) // 2),
        |dev AS (SELECT b.doc_id, b.source, b.v, m.med, abs(b.v - m.med) AS d
        |  FROM base b JOIN med m USING (source)),
        |madr AS (SELECT source, d,
        |    row_number() OVER (PARTITION BY source ORDER BY d, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n FROM dev),
        |mad AS (SELECT source, d AS mad FROM madr WHERE rn = (n + 1) // 2)
        |SELECT dev.doc_id, dev.source, dev.v AS n_tokens, dev.med, mad.mad,
        |  round((dev.v - dev.med) / mad.mad, 6) AS rscore
        |FROM dev JOIN mad USING (source)
        |WHERE mad.mad > 0.0 AND dev.d > 2.0 * mad.mad""".stripMargin,
    // Each per-point double is the same two correctly-rounded ops from
    // identical integers in both engines, so the MAX is engine-exact.
    "ks_drift" ->
      """WITH base AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |ca AS (SELECT v, count(*) AS ca FROM base WHERE doc_id % 2 = 0 GROUP BY v),
        |cb AS (SELECT v, count(*) AS cb FROM base WHERE doc_id % 2 = 1 GROUP BY v),
        |u AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |c AS (SELECT v,
        |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        |  FROM u)
        |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_points,
        |  round(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
        |    - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS d_stat
        |FROM c""".stripMargin,
    // Binned-KS replay: the bin index is floor((v − lo)/(hi − lo)·1024)
    // clamped to 1023 — each step one correctly-rounded double op,
    // parenthesized identically to the Column expression, so the integer
    // grid (and everything after it, the ks_drift tail) is engine-exact.
    "ks_binned" ->
      """WITH v0 AS (SELECT event_type, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(v) AS lo, max(v) AS hi FROM v0),
        |ba AS (SELECT CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 1024), 1023) END AS INT) AS v
        |  FROM v0, st WHERE event_type = 'purchase'),
        |bb AS (SELECT CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 1024), 1023) END AS INT) AS v
        |  FROM v0, st WHERE event_type <> 'purchase'),
        |ca AS (SELECT v, count(*) AS ca FROM ba GROUP BY v),
        |cb AS (SELECT v, count(*) AS cb FROM bb GROUP BY v),
        |u AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |c AS (SELECT v,
        |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        |  FROM u)
        |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_points,
        |  round(max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
        |    - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS d_stat
        |FROM c""".stripMargin,
    // Grouped binned-KS replay: ks_binned's grid prelude (identical
    // parenthesization) feeding ks_by_source's set-based per-source tail.
    "ks_binned_by_source" ->
      """WITH v0 AS (SELECT event_type AS source, CAST(value AS DOUBLE) AS v0v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(v0v) AS lo, max(v0v) AS hi FROM v0),
        |base AS (SELECT source, CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v0v - lo) / (hi - lo) * 1024), 1023) END AS INT) AS v
        |  FROM v0, st),
        |cnt AS (SELECT source, v, count(*) AS c FROM base GROUP BY source, v),
        |gv AS (SELECT v, count(*) AS g FROM base GROUP BY v),
        |srcs AS (SELECT DISTINCT source FROM cnt),
        |grid AS (SELECT s.source, gv.v, gv.g, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN gv
        |  LEFT JOIN cnt c ON c.source = s.source AND c.v = gv.v),
        |cum AS (SELECT source,
        |    sum(c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cin,
        |    sum(g - c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crest,
        |    sum(c) OVER (PARTITION BY source) AS nin,
        |    sum(g - c) OVER (PARTITION BY source) AS nrest
        |  FROM grid)
        |SELECT source, CAST(max(nin) AS BIGINT) AS n_in,
        |  CAST(max(nrest) AS BIGINT) AS n_rest,
        |  round(max(abs(CAST(cin AS DOUBLE) / CAST(nin AS DOUBLE)
        |    - CAST(crest AS DOUBLE) / CAST(nullif(nrest, 0) AS DOUBLE))), 6) AS d_stat
        |FROM cum GROUP BY source""".stripMargin,
    // Mann–Whitney replay: integer midranks (2·mr = 2·|below| + t + 1) off
    // the same (value, count) histogram, then the identically-parenthesized
    // u/z chain — every double step one correctly-rounded op (IEEE sqrt
    // included), so z is engine-exact before its display round.
    "mann_whitney" ->
      """WITH base AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |ca AS (SELECT v, count(*) AS ca FROM base WHERE doc_id % 2 = 0 GROUP BY v),
        |cb AS (SELECT v, count(*) AS cb FROM base WHERE doc_id % 2 = 1 GROUP BY v),
        |u AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |r AS (SELECT ca, cb, ca + cb AS t,
        |    2 * (sum(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (ca + cb))
        |      + (ca + cb) + 1 AS mr2
        |  FROM u),
        |a AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(ca * mr2) AS BIGINT) AS r2a,
        |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS t3 FROM r),
        |f AS (SELECT na, nb,
        |    (CAST(r2a AS DOUBLE) - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0)) / 2.0 AS u_stat,
        |    CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
        |      ((CAST(na + nb AS DOUBLE) + 1.0) - CAST(t3 AS DOUBLE)
        |        / (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1.0))) AS sig2
        |  FROM a)
        |SELECT na AS n_a, nb AS n_b, u_stat,
        |  CASE WHEN sig2 > 0 THEN round((u_stat
        |    - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) / sqrt(sig2), 6) END AS z_stat
        |FROM f""".stripMargin,
    // PSI replay: the ks_binned 64-bin grid, Jeffreys add-1/2 smoothing
    // over the occupied-union bins, ln 6dp-DECIMAL per the lmScore
    // convention, order-free DECIMAL term sum.
    "psi_drift" ->
      """WITH v0 AS (SELECT event_type, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(v) AS lo, max(v) AS hi FROM v0),
        |ba AS (SELECT CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 64), 63) END AS INT) AS bin
        |  FROM v0, st WHERE event_type = 'purchase'),
        |bb AS (SELECT CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 64), 63) END AS INT) AS bin
        |  FROM v0, st WHERE event_type <> 'purchase'),
        |ca AS (SELECT bin, count(*) AS ca FROM ba GROUP BY bin),
        |cb AS (SELECT bin, count(*) AS cb FROM bb GROUP BY bin),
        |u AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS k FROM u),
        |pq AS (SELECT na, nb, k,
        |    (CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + CAST(k AS DOUBLE) * 0.5) AS p,
        |    (CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + CAST(k AS DOUBLE) * 0.5) AS q
        |  FROM u, tot),
        |terms AS (SELECT na, nb, k,
        |    CAST(round((p - q) * CAST(CAST(round(ln(p / q), 6) AS DECIMAL(18,6))
        |      AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
        |  FROM pq)
        |SELECT max(na) AS n_a, max(nb) AS n_b, max(k) AS n_bins,
        |  CAST(sum(term) AS DOUBLE) AS psi
        |FROM terms""".stripMargin,
    // Grouped PSI replay: psi_drift's smoothing over the ks_by_source
    // source-vs-rest grid (global occupied-bin support).
    "psi_by_source" ->
      """WITH v0 AS (SELECT event_type AS source, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT min(v) AS lo, max(v) AS hi FROM v0),
        |base AS (SELECT source, CAST(CASE WHEN hi = lo THEN 0
        |      ELSE least(floor((v - lo) / (hi - lo) * 64), 63) END AS INT) AS bin
        |  FROM v0, st),
        |cnt AS (SELECT source, bin, count(*) AS c FROM base GROUP BY source, bin),
        |gv AS (SELECT bin, count(*) AS g FROM base GROUP BY bin),
        |srcs AS (SELECT DISTINCT source FROM cnt),
        |grid AS (SELECT s.source, gv.g, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN gv
        |  LEFT JOIN cnt c ON c.source = s.source AND c.bin = gv.bin),
        |wt AS (SELECT source, g, c,
        |    sum(c) OVER (PARTITION BY source) AS nin,
        |    sum(g - c) OVER (PARTITION BY source) AS nrest,
        |    count(*) OVER (PARTITION BY source) AS k
        |  FROM grid),
        |pq AS (SELECT source, nin, nrest,
        |    (CAST(c AS DOUBLE) + 0.5) / (CAST(nin AS DOUBLE) + CAST(k AS DOUBLE) * 0.5) AS p,
        |    (CAST(g - c AS DOUBLE) + 0.5) / (CAST(nrest AS DOUBLE) + CAST(k AS DOUBLE) * 0.5) AS q
        |  FROM wt),
        |terms AS (SELECT source, nin, nrest,
        |    CAST(round((p - q) * CAST(CAST(round(ln(p / q), 6) AS DECIMAL(18,6))
        |      AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
        |  FROM pq)
        |SELECT source, CAST(max(nin) AS BIGINT) AS n_in,
        |  CAST(max(nrest) AS BIGINT) AS n_rest,
        |  CASE WHEN max(nrest) > 0 THEN CAST(sum(term) AS DOUBLE) END AS psi
        |FROM terms GROUP BY source""".stripMargin,
    // Jackknife replay: integer group sums, the same single-op loo/var
    // chains, θ and squared deviations 6dp-DECIMAL for order-free
    // cross-group sums; mean/se/ci emitted UNROUNDED (every step one
    // correctly-rounded op — no display-rounding boundary to disagree on).
    "jackknife_mean" ->
      """WITH base AS (SELECT source AS g,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |grp AS (SELECT g, count(*) AS n, SUM(v) AS s FROM base GROUP BY g),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
        |    CAST(count(*) AS BIGINT) AS gg FROM grp),
        |loo AS (SELECT nn, ss, gg,
        |    CAST(round(CAST(ss - s AS DOUBLE) / CAST(nullif(nn - n, 0) AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS t6
        |  FROM grp, tot),
        |a0 AS (SELECT nn, ss, gg, SUM(t6) AS tsum, CAST(count(t6) AS BIGINT) AS gok
        |  FROM loo GROUP BY nn, ss, gg),
        |dev AS (SELECT l.nn, l.ss, l.gg, a0.gok,
        |    CAST(round((CAST(t6 AS DOUBLE) - CAST(tsum AS DOUBLE) / CAST(gok AS DOUBLE))
        |      * (CAST(t6 AS DOUBLE) - CAST(tsum AS DOUBLE) / CAST(gok AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS d2
        |  FROM loo l JOIN a0 USING (nn, ss, gg)),
        |f AS (SELECT nn, ss, gg, gok, SUM(d2) AS d2sum FROM dev GROUP BY nn, ss, gg, gok),
        |r AS (SELECT gg AS n_groups, nn AS n_rows,
        |    CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) AS mean,
        |    CASE WHEN gok >= 2 THEN sqrt((CAST(gok AS DOUBLE) - 1.0) / CAST(gok AS DOUBLE)
        |      * CAST(d2sum AS DOUBLE)) END AS se_jack
        |  FROM f)
        |SELECT n_groups, n_rows, mean, se_jack,
        |  mean - 1.96 * se_jack AS ci_lo, mean + 1.96 * se_jack AS ci_hi
        |FROM r""".stripMargin,
    // Bootstrap replay: the SAME md5 coins (52-bit dyadic u — the
    // sample_priority idiom), the SAME pinned Poisson(1) CDF literals,
    // unrounded replicate means into exact order statistics.
    "bootstrap_ci" ->
      """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |ex AS (SELECT id, v, CAST(unnest(range(1, 41)) AS INT) AS rep FROM base),
        |uu AS (SELECT rep, v,
        |    (CAST(('0x' || substr(md5(id || ':' || CAST(rep AS VARCHAR)), 1, 13))::UBIGINT
        |      AS DOUBLE) + 0.5) / 4503599627370496.0 AS u
        |  FROM ex),
        |ww AS (SELECT rep, v,
        |    CASE WHEN u <= 0.3678794412 THEN 0 WHEN u <= 0.7357588823 THEN 1
        |         WHEN u <= 0.9196986029 THEN 2 WHEN u <= 0.9810118431 THEN 3
        |         WHEN u <= 0.9963401532 THEN 4 WHEN u <= 0.9994058152 THEN 5
        |         WHEN u <= 0.9999167589 THEN 6 WHEN u <= 0.9999897508 THEN 7
        |         WHEN u <= 0.9999988748 THEN 8 ELSE 9 END AS w
        |  FROM uu),
        |r AS (SELECT rep, CASE WHEN SUM(w) > 0
        |    THEN CAST(SUM(w * v) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) END AS m
        |  FROM ww GROUP BY rep),
        |tot AS (SELECT CAST(SUM(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM base),
        |ms AS (SELECT list_sort(list(m)) AS ms, CAST(count(m) AS BIGINT) AS b
        |  FROM r WHERE m IS NOT NULL)
        |SELECT CAST(b AS INT) AS n_reps,
        |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |  CASE WHEN b > 0 THEN ms[CAST(ceil(0.025 * CAST(b AS DOUBLE)) AS INT)] END AS boot_lo,
        |  CASE WHEN b > 0 THEN ms[CAST(ceil(0.975 * CAST(b AS DOUBLE)) AS INT)] END AS boot_hi
        |FROM ms, tot""".stripMargin,
    // DOW replay: the daily/spine prelude, ISO weekday on both engines
    // (Spark weekday()+1 == DuckDB isodow — their dayofweek defaults
    // disagree on Sunday), unrounded single-division outputs.
    "dow_profile" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT CAST(isodow(s.day) AS INT) AS dow,
        |    coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |bydow AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days, SUM(rev) AS sm
        |  FROM filled GROUP BY dow),
        |tot AS (SELECT SUM(sm) AS tt FROM bydow)
        |SELECT dow, n_days, CAST(sm AS DOUBLE) AS dow_total,
        |  CAST(sm AS DOUBLE) / CAST(n_days AS DOUBLE) AS dow_mean,
        |  CAST(sm AS DOUBLE) / CAST(tt AS DOUBLE) AS share
        |FROM bydow, tot""".stripMargin,
    // ACF replay: the moving_avg daily/spine prelude (global series), mean
    // off the exact DECIMAL daily sum, demeaned products 6dp-DECIMAL so
    // numerator/denominator sums are order-free, lag pairs by date+k join.
    "acf_daily" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.day, coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |st AS (SELECT SUM(rev) AS sm, CAST(count(*) AS BIGINT) AS n FROM filled),
        |dev AS (SELECT day, CAST(rev AS DOUBLE) - CAST(sm AS DOUBLE) / n AS d
        |  FROM filled, st),
        |den AS (SELECT SUM(CAST(round(d * d, 6) AS DECIMAL(18,6))) AS den FROM dev),
        |pairs AS (SELECT l.lag, a.d AS d1, b.d AS d2
        |  FROM dev a CROSS JOIN (SELECT CAST(unnest(range(1, 15)) AS INT) AS lag) l
        |  JOIN dev b ON b.day = a.day + l.lag),
        |num AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    SUM(CAST(round(d1 * d2, 6) AS DECIMAL(18,6))) AS num
        |  FROM pairs GROUP BY lag)
        |SELECT CAST(lag AS INT) AS lag, n_pairs,
        |  CASE WHEN den > 0 THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS acf
        |FROM num, den""".stripMargin,
    // Ljung-Box replay: the acf chain, then the Q fold — per-term
    // r²/n_pairs (n - k == n_pairs on the gap-filled spine) rounded to
    // 6dp DECIMAL before the order-free sum, the (n·(n+2))·Σ chain
    // identically parenthesized, the pinned χ² literal on both sides.
    "ljung_box" -> (
      s"""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.day, coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |st AS (SELECT SUM(rev) AS sm, CAST(count(*) AS BIGINT) AS n FROM filled),
        |dev AS (SELECT day, CAST(rev AS DOUBLE) - CAST(sm AS DOUBLE) / n AS d
        |  FROM filled, st),
        |den AS (SELECT SUM(CAST(round(d * d, 6) AS DECIMAL(18,6))) AS den FROM dev),
        |pairs AS (SELECT l.lag, a.d AS d1, b.d AS d2
        |  FROM dev a CROSS JOIN (SELECT CAST(unnest(range(1, 15)) AS INT) AS lag) l
        |  JOIN dev b ON b.day = a.day + l.lag),
        |num AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    SUM(CAST(round(d1 * d2, 6) AS DECIMAL(18,6))) AS num
        |  FROM pairs GROUP BY lag),
        |r AS (SELECT CAST(lag AS INT) AS lag, n_pairs,
        |    CASE WHEN den > 0 THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS acf
        |  FROM num, den),
        |q AS (SELECT CAST(max(n_pairs + lag) AS BIGINT) AS n,
        |    CAST(max(lag) AS INT) AS h,
        |    SUM(CAST(round(acf * acf / n_pairs, 6) AS DECIMAL(18,6))) AS terms
        |  FROM r)
        |SELECT n AS n_days, h AS max_lag,
        |  CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * CAST(terms AS DOUBLE) AS q_stat,
        |  CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * CAST(terms AS DOUBLE)
        |    > $LjungBoxCrit14 AS reject
        |FROM q""".stripMargin),
    // Runs-test replay: exact lower median via floor((n+1)/2) rank (a
    // double->int CAST would round on DuckDB and truncate on Spark),
    // median-equal days dropped, R = sign changes + 1 via lag, the
    // mu/sigma/z chain identically parenthesized over 2*n1*n2 carried
    // exactly.
    "runs_test" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.day, coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nall FROM filled),
        |rk AS (SELECT rev, row_number() OVER (ORDER BY rev, day) AS rk FROM filled),
        |med AS (SELECT rev AS med FROM rk, tot WHERE rk = floor((nall + 1) / 2)),
        |signed AS (SELECT day, CAST(rev > med AS INT) AS s
        |  FROM filled, med WHERE rev <> med),
        |marks AS (SELECT s,
        |    CASE WHEN lag(s) OVER (ORDER BY day) IS NULL THEN 1
        |         WHEN lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS newrun
        |  FROM signed),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(s) AS BIGINT) AS n1, CAST(SUM(1 - s) AS BIGINT) AS n2,
        |    CAST(SUM(newrun) AS BIGINT) AS r
        |  FROM marks),
        |f AS (SELECT n, n1, n2, r,
        |    CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) * 2.0 AS p FROM agg)
        |SELECT n AS n_days, n1 AS n_above, n2 AS n_below, r AS n_runs,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND n > 1
        |        AND p * (p - CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) > 0
        |    THEN round((CAST(r AS DOUBLE) - (p / CAST(n AS DOUBLE) + 1.0))
        |      / sqrt(p * (p - CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
        |  END AS z_stat
        |FROM f""".stripMargin,
    // CUSUM replay: demeaned terms round to 6dp DECIMAL before the
    // cumulative (association-free), argmax tie-breaks to earliest day,
    // the m-statistic chain identically parenthesized.
    "cusum_daily" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.day, coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |st AS (SELECT SUM(rev) AS sm, CAST(count(*) AS BIGINT) AS n FROM filled),
        |dev AS (SELECT day, n, CAST(rev AS DOUBLE) - CAST(sm AS DOUBLE) / n AS d
        |  FROM filled, st),
        |r0 AS (SELECT day, n, CAST(round(d * d, 6) AS DECIMAL(18,6)) AS sq,
        |    sum(CAST(round(d, 6) AS DECIMAL(18,6))) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dev),
        |r1 AS (SELECT day, n, sq, abs(cum) AS ab FROM r0),
        |st2 AS (SELECT max(ab) AS smax, SUM(sq) AS ssq FROM r1),
        |one AS (SELECT CAST(max(n) AS BIGINT) AS n_days,
        |    min(CASE WHEN ab = smax THEN day END) AS cp_day,
        |    max(smax) AS smax, max(ssq) AS ssq
        |  FROM r1, st2)
        |SELECT n_days, cp_day, CAST(smax AS DOUBLE) AS s_max,
        |  CASE WHEN ssq > 0 THEN round(CAST(smax AS DOUBLE) /
        |    (sqrt(CAST(ssq AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      * sqrt(CAST(n_days AS DOUBLE))), 6) END AS m_stat
        |FROM one""".stripMargin,
    "ks_by_source" ->
      """WITH base AS (SELECT source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |cnt AS (SELECT source, v, count(*) AS c FROM base GROUP BY source, v),
        |gv AS (SELECT v, count(*) AS g FROM base GROUP BY v),
        |srcs AS (SELECT DISTINCT source FROM cnt),
        |grid AS (SELECT s.source, gv.v, gv.g, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN gv
        |  LEFT JOIN cnt c ON c.source = s.source AND c.v = gv.v),
        |cum AS (SELECT source,
        |    sum(c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cin,
        |    sum(g - c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crest,
        |    sum(c) OVER (PARTITION BY source) AS nin,
        |    sum(g - c) OVER (PARTITION BY source) AS nrest
        |  FROM grid)
        |SELECT source, CAST(max(nin) AS BIGINT) AS n_in,
        |  CAST(max(nrest) AS BIGINT) AS n_rest,
        |  round(max(abs(CAST(cin AS DOUBLE) / CAST(nin AS DOUBLE)
        |    - CAST(crest AS DOUBLE) / CAST(nullif(nrest, 0) AS DOUBLE))), 6) AS d_stat
        |FROM cum GROUP BY source""".stripMargin,
    "pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS year,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
        |FROM orders GROUP BY 1""".stripMargin,
    "pctl_prices" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(min(o_totalprice), 4) AS p_min,
        |  round(max(o_totalprice), 4) AS p_max
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "event_route" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  CAST(min(ts) AS TIMESTAMP) AS first_ts,
        |  CAST(max(ts) AS TIMESTAMP) AS last_ts
        |FROM events GROUP BY event_type""".stripMargin,
    "sessionize" ->
      """WITH e AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800.0
        |    THEN 1 ELSE 0 END AS new_s FROM e),
        |g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(max(ts) AS TIMESTAMP) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        |FROM g GROUP BY user_id, session_id""".stripMargin,
    // Bit-exact replay of the integer fixed-point power iteration: the 8
    // rounds unroll as chained CTEs, every step a truncating integer
    // division on nonnegative operands (DuckDB's floor // == Spark's
    // truncating div there), so no float ever accumulates.
    "event_pagerank" -> {
      val base = "((1000000000000 // (SELECT nn FROM nn)) * 15) // 100"
      val rounds = (1 to 8).map { i =>
        s"""pr$i AS (SELECT n.node,
           |    $base + (85 * coalesce(c.cs, 0)) // 100 AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.to_type AS node, SUM((p.pr * e.p6) // 1000000) AS cs
           |    FROM pr${i - 1} p JOIN e ON e.from_type = p.node GROUP BY 1) c
           |  USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
         |  FROM events),
         |ec AS (SELECT from_type, event_type AS to_type, count(*) AS n
         |  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
         |eo AS (SELECT from_type, SUM(n) AS out_n FROM ec GROUP BY 1),
         |e AS (SELECT ec.from_type, ec.to_type,
         |    (ec.n * 1000000) // eo.out_n AS p6
         |  FROM ec JOIN eo USING (from_type)),
         |nodes AS (SELECT DISTINCT event_type AS node FROM events),
         |nn AS (SELECT count(*) AS nn FROM nodes),
         |pr0 AS (SELECT node, 1000000000000 // (SELECT nn FROM nn) AS pr FROM nodes),
         |$rounds
         |SELECT node AS event_type, CAST(pr AS BIGINT) AS pagerank FROM pr8""".stripMargin
    },
    "event_transitions" ->
      """WITH e AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |c AS (SELECT from_type, event_type AS to_type, count(*) AS n
        |  FROM e WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM c""".stripMargin,
    "window_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
