package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.IngestDiscovery
/** Oracle-SQL registry part 3: profiling (Benford/columns), text quality
  * and language ID, retrieval ranking, the remaining warehouse analytics,
  * lake layout + the two end-to-end pipeline counts-oracles, and mixture
  * design (TF-IDF/DSIR/epochs/deciles). */
private[graft] object OraclesTextMix {
  import QueryShared._

  val entries: Map[String, String] = Map(
    "profile_columns" ->
      """SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_value,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_value FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |  CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders""".stripMargin,
    // Benford replay: the first significant digit comes off the
    // DECIMAL(18,6) canonical string on BOTH engines (fixed-scale render,
    // no float formatting), expected probabilities are the SAME pinned 6dp
    // literals, and the p_obs/χ² chains are identically parenthesized.
    "benford_digits" ->
      """WITH s0 AS (SELECT CAST(CAST(abs(o_totalprice) AS DECIMAL(18,6)) AS VARCHAR) AS s
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |d0 AS (SELECT regexp_extract(s, '[1-9]', 0) AS d FROM s0),
        |obs AS (SELECT CAST(d AS INT) AS digit, count(*) AS c FROM d0
        |  WHERE d IS NOT NULL AND d <> '' GROUP BY 1),
        |grid AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
        |pb AS (SELECT digit, CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
        |    WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910 WHEN 5 THEN 0.079181
        |    WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
        |    ELSE 0.045757 END AS DOUBLE) AS p_benford FROM grid),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM obs),
        |j AS (SELECT pb.digit, pb.p_benford, CAST(coalesce(obs.c, 0) AS BIGINT) AS n_obs
        |  FROM pb LEFT JOIN obs USING (digit))
        |SELECT digit, n_obs,
        |  round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_obs, p_benford,
        |  round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford)
        |    * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford)
        |    / (CAST(n AS DOUBLE) * p_benford), 6) AS chi_term
        |FROM j, tot""".stripMargin,
    // Rolled verdict: 6dp-rounded per-digit terms sum in DECIMAL
    // (order-free), the χ² critical value and MAD /9 pinned both sides.
    "benford_stat" ->
      """WITH s0 AS (SELECT CAST(CAST(abs(o_totalprice) AS DECIMAL(18,6)) AS VARCHAR) AS s
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |d0 AS (SELECT regexp_extract(s, '[1-9]', 0) AS d FROM s0),
        |obs AS (SELECT CAST(d AS INT) AS digit, count(*) AS c FROM d0
        |  WHERE d IS NOT NULL AND d <> '' GROUP BY 1),
        |grid AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
        |pb AS (SELECT digit, CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
        |    WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910 WHEN 5 THEN 0.079181
        |    WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
        |    ELSE 0.045757 END AS DOUBLE) AS p_benford FROM grid),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM obs),
        |j AS (SELECT pb.digit, pb.p_benford, CAST(coalesce(obs.c, 0) AS BIGINT) AS n_obs
        |  FROM pb LEFT JOIN obs USING (digit)),
        |dd AS (SELECT n_obs, p_benford,
        |    round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_obs,
        |    round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford)
        |      * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford)
        |      / (CAST(n AS DOUBLE) * p_benford), 6) AS chi_term
        |  FROM j, tot),
        |f AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_values,
        |    CAST(sum(CAST(chi_term AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
        |    round(CAST(sum(CAST(round(abs(p_obs - p_benford), 6) AS DECIMAL(18,6)))
        |      AS DOUBLE) / 9.0, 6) AS mad
        |  FROM dd)
        |SELECT n_values, chi2, mad, chi2 > 20.090 AS reject_1pct FROM f""".stripMargin,
    "unicode_norm" ->
      """SELECT doc_id, CAST(length(nfc_normalize(text)) AS INT) AS len_nfc,
        |  nfc_normalize(text) = text AS unchanged
        |FROM documents""".stripMargin,
    "text_quality" -> (s"""WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS INT) AS len_chars,
        |  CAST(len(w) AS INT) AS n_tokens,
        |  CAST(len(list_filter(w, x -> x IN $Stop)) AS INT) AS n_stopwords,
        |  round(CAST(len(list_filter(w, x -> x IN $Stop)) AS DOUBLE) / len(w), 6) AS stop_ratio,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
        |  round(CAST(list_aggregate([length(x) for x in w], 'sum') AS DOUBLE) / len(w), 6) AS mean_token_len
        |FROM t""".stripMargin),
    "lang_id" -> {
      val en = TextAnalysis.EnStop.mkString("('", "','", "')")
      val fr = TextAnalysis.FrStop.mkString("('", "','", "')")
      val de = TextAnalysis.DeStop.mkString("('", "','", "')")
      val es = TextAnalysis.EsStop.mkString("('", "','", "')")
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(len(list_filter(w, x -> x IN $en)) AS INT) AS n_en,
        |    CAST(len(list_filter(w, x -> x IN $fr)) AS INT) AS n_fr,
        |    CAST(len(list_filter(w, x -> x IN $de)) AS INT) AS n_de,
        |    CAST(len(list_filter(w, x -> x IN $es)) AS INT) AS n_es
        |  FROM t)
        |SELECT doc_id, n_en, n_fr, n_de, n_es,
        |  CASE WHEN n_en > 0 AND n_en >= n_fr AND n_en >= n_de AND n_en >= n_es THEN 'en'
        |       WHEN n_fr > 0 AND n_fr >= n_de AND n_fr >= n_es THEN 'fr'
        |       WHEN n_de > 0 AND n_de >= n_es THEN 'de'
        |       WHEN n_es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred
        |FROM c""".stripMargin
    },
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens
        |FROM documents""".stripMargin,
    "doc_fingerprint" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM toks WHERE len(w) >= 3)
        |SELECT doc_id, list_aggregate([md5(x) for x in s], 'min') AS fingerprint FROM sh""".stripMargin,
    "rep_filter" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |grams AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
        |  FROM toks WHERE len(w) >= 2),
        |per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_grams,
        |    CAST(max(cnt) AS BIGINT) AS top_cnt
        |  FROM per GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_distinct_grams,
        |  round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) AS dup_gram_fraction,
        |  round(CAST(top_cnt AS DOUBLE) / n_grams, 6) AS top_gram_fraction,
        |  round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) <= 0.2 AS keep
        |FROM agg""".stripMargin,
    "bm25_topk" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |lens AS (SELECT doc_id, len(w) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
        |post AS (SELECT doc_id, unnest(w) AS term FROM toks),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM post GROUP BY doc_id, term),
        |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(w[1:6])) AS term
        |  FROM toks WHERE doc_id % 97 = 0),
        |dfq AS (SELECT t.term, count(*) AS df FROM tf t
        |  WHERE t.term IN (SELECT DISTINCT term FROM qt) GROUP BY t.term),
        |contrib AS (SELECT qt.query_id, t.doc_id,
        |    CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
        |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6)
        |      AS DECIMAL(18,6)) AS c
        |  FROM tf t JOIN qt ON t.term = qt.term JOIN dfq d ON t.term = d.term
        |  JOIN lens l ON t.doc_id = l.doc_id CROSS JOIN stats s),
        |scored AS (SELECT query_id, doc_id, CAST(SUM(c) AS DOUBLE) AS score
        |  FROM contrib GROUP BY query_id, doc_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS rn FROM scored)
        |SELECT query_id, doc_id, score, CAST(rn AS INT) AS rank
        |FROM ranked WHERE rn <= 10""".stripMargin,
    // Hybrid RRF: both rankers replay end-to-end (the bm25_topk and
    // ann_topk oracle chains verbatim, same query ids), then the fusion —
    // 1/(60+rank) rounded to 6dp, DECIMAL-summed, re-ranked (score desc,
    // doc asc). Only RANKS cross from the rankers into the fusion, so
    // last-ulp cosine differences cannot reach the fused hash.
    "hybrid_rrf" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |lens AS (SELECT doc_id, len(w) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
        |post AS (SELECT doc_id, unnest(w) AS term FROM toks),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM post GROUP BY doc_id, term),
        |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(w[1:6])) AS term
        |  FROM toks WHERE doc_id % 97 = 0),
        |dfq AS (SELECT t.term, count(*) AS df FROM tf t
        |  WHERE t.term IN (SELECT DISTINCT term FROM qt) GROUP BY t.term),
        |contrib AS (SELECT qt.query_id, t.doc_id,
        |    CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
        |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6)
        |      AS DECIMAL(18,6)) AS c
        |  FROM tf t JOIN qt ON t.term = qt.term JOIN dfq d ON t.term = d.term
        |  JOIN lens l ON t.doc_id = l.doc_id CROSS JOIN stats s),
        |scored AS (SELECT query_id, doc_id, CAST(SUM(c) AS DOUBLE) AS score
        |  FROM contrib GROUP BY query_id, doc_id),
        |sranked AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS rn FROM scored),
        |sparse AS (SELECT query_id, doc_id, CAST(rn AS INT) AS rank FROM sranked WHERE rn <= 10),
        |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 97 = 0),
        |cv AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sims AS (SELECT query_id, doc_id, list_cosine_similarity(qv, v) AS sim FROM q, cv),
        |dranked AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, doc_id) AS rn FROM sims),
        |dense AS (SELECT query_id, doc_id, CAST(rn AS INT) AS rank FROM dranked WHERE rn <= 10),
        |u AS (SELECT query_id, doc_id, rank FROM sparse
        |  UNION ALL SELECT query_id, doc_id, rank FROM dense),
        |fc AS (SELECT query_id, doc_id,
        |    CAST(round(CAST(1 AS DOUBLE) / (60 + rank), 6) AS DECIMAL(18,6)) AS c FROM u),
        |fused AS (SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_lists,
        |    CAST(SUM(c) AS DOUBLE) AS rrf_score FROM fc GROUP BY query_id, doc_id),
        |fr AS (SELECT query_id, doc_id, n_lists, rrf_score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rn
        |  FROM fused)
        |SELECT query_id, doc_id, n_lists, rrf_score, CAST(rn AS INT) AS rank
        |FROM fr WHERE rn <= 10""".stripMargin,
    // Funnel: per-user milestone times computed sequentially; comparisons run
    // on microsecond-truncated timestamps on BOTH sides (Spark's converted
    // events ts is micros; DuckDB raw parquet ts is nanos).
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t FROM e GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 ON e.user_id = s1.user_id
        |  AND e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s2 ON e.user_id = s2.user_id
        |  AND e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
        |SELECT CAST(1 AS INT) AS step_index, 'view' AS step,
        |  CAST(count(t) AS BIGINT) AS n_users FROM s1
        |UNION ALL SELECT CAST(2 AS INT), 'click', CAST(count(t) AS BIGINT) FROM s2
        |UNION ALL SELECT CAST(3 AS INT), 'purchase', CAST(count(t) AS BIGINT) FROM s3""".stripMargin,
    "cohort_retention" ->
      """WITH f AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM f),
        |c AS (SELECT user_id,
        |    date_trunc('week', first_ts) AS cohort_week,
        |    CAST(floor((epoch(date_trunc('week', ts)) - epoch(date_trunc('week', first_ts)))
        |      / 604800.0) AS INT) AS week_offset
        |  FROM g)
        |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM c GROUP BY cohort_week, week_offset""".stripMargin,
    "cube_revenue" ->
      """WITH f AS (SELECT CAST(year(o.o_orderdate) AS INT) AS year,
        |    c.c_mktsegment AS segment,
        |    l.l_extendedprice * (1 - l.l_discount) AS rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT year, segment, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM f GROUP BY CUBE(year, segment)""".stripMargin,
    "winsorize_prices" ->
      """WITH b AS (SELECT o_orderpriority,
        |    quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
        |  round(greatest(b.lo, least(b.hi, o.o_totalprice)), 6) AS w_price
        |FROM orders o JOIN b USING (o_orderpriority)""".stripMargin,
    "gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY user_id, day),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
        |spine AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span)
        |SELECT s.user_id, s.day, d.day_value,
        |  (SELECT dd.day_value FROM daily dd
        |   WHERE dd.user_id = s.user_id AND dd.day <= s.day
        |   ORDER BY dd.day DESC LIMIT 1) AS filled_value,
        |  d.day_value IS NULL AS is_filled
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day""".stripMargin,
    "heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok),
        |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occ FROM tok GROUP BY token)
        |SELECT token, n_occ, round(CAST(n_occ AS DOUBLE) / t.n, 6) AS share
        |FROM cnt, tot t WHERE n_occ * 40 > t.n""".stripMargin,
    "shard_assign" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR) AS skey
        |  FROM documents),
        |c AS (SELECT *, coalesce(SUM(n_tokens) OVER (ORDER BY skey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        |    SUM(n_tokens) OVER () AS total FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(least(floor(cum_before / ceil(total / 16.0)), 15) AS INT) AS shard
        |FROM c""".stripMargin,
    "centroid_outliers" ->
      """WITH u AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |pe AS (SELECT label, unnest(
        |    [{'pos': i, 'x': v[i]} for i in range(1, len(v) + 1)]) AS e FROM u),
        |agg AS (SELECT label, e.pos AS pos, count(*) AS n,
        |    SUM(CAST(e.x AS DECIMAL(28,12))) AS s FROM pe GROUP BY label, e.pos),
        |cpos AS (SELECT label, pos, round(CAST(s AS DOUBLE) / n, 6) AS c FROM agg),
        |cent AS (SELECT label, list(c ORDER BY pos) AS centroid FROM cpos GROUP BY label)
        |SELECT u.vec_id, u.label,
        |  round(list_cosine_similarity(u.v, cent.centroid), 6) AS cos_centroid,
        |  round(list_cosine_similarity(u.v, cent.centroid), 6) < 0.0 AS is_outlier
        |FROM u JOIN cent USING (label)""".stripMargin,
    "skew_profile" ->
      """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM orders GROUP BY o_custkey),
        |s AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_keys FROM c)
        |SELECT o_custkey, n_rows,
        |  round(CAST(n_rows AS DOUBLE) / s.total, 6) AS share,
        |  round(n_rows * s.n_keys / CAST(s.total AS DOUBLE), 4) AS skew_vs_mean
        |FROM c, s ORDER BY n_rows DESC, o_custkey LIMIT 10""".stripMargin,
    "len_histogram" ->
      """WITH t AS (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT CAST(length(bin(greatest(n, 1))) - 1 AS INT) AS bucket, n FROM t)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
        |  CAST(min(n) AS BIGINT) AS min_tokens,
        |  CAST(max(n) AS BIGINT) AS max_tokens,
        |  CAST(1 << bucket AS BIGINT) AS band_lo
        |FROM b GROUP BY bucket""".stripMargin,
    "schema_drift" -> (SrcCte + """,
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
        |    CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR) FROM src_b)
        |SELECT pa.col_name AS col_name,
        |  pa.n_rows AS rows_before, pb.n_rows AS rows_after,
        |  pb.n_distinct - pa.n_distinct AS distinct_delta,
        |  (CASE WHEN pb.n_rows = 0 THEN 0 ELSE CAST(floor(pb.n_nulls * 1000 / pb.n_rows) AS BIGINT) END)
        |    - (CASE WHEN pa.n_rows = 0 THEN 0 ELSE CAST(floor(pa.n_nulls * 1000 / pa.n_rows) AS BIGINT) END) AS null_permille_delta,
        |  (coalesce(pa.min_value, '') <> coalesce(pb.min_value, '')
        |    OR coalesce(pa.max_value, '') <> coalesce(pb.max_value, '')) AS range_changed,
        |  (pb.n_distinct - pa.n_distinct <> 0
        |    OR (CASE WHEN pb.n_rows = 0 THEN 0 ELSE CAST(floor(pb.n_nulls * 1000 / pb.n_rows) AS BIGINT) END)
        |       - (CASE WHEN pa.n_rows = 0 THEN 0 ELSE CAST(floor(pa.n_nulls * 1000 / pa.n_rows) AS BIGINT) END) <> 0
        |    OR coalesce(pa.min_value, '') <> coalesce(pb.min_value, '')
        |    OR coalesce(pa.max_value, '') <> coalesce(pb.max_value, '')) AS drifted
        |FROM pa JOIN pb ON pa.col_name = pb.col_name""".stripMargin),
    "source_cap" ->
      """WITH r AS (SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR)) AS INT) AS src_rank
        |  FROM documents)
        |SELECT doc_id, source, src_rank FROM r WHERE src_rank <= 10""".stripMargin,
    // blocklist_gate — token-granularity replay of the same filter; the
    // hit list, its length, and the sorted-distinct join are all
    // integer/string ops, engine-exact by construction
    "blocklist_gate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |h AS (SELECT doc_id,
        |    list_filter(w, x -> x IN ('a', 'dup', 'slow', 'vile')) AS hits
        |  FROM t)
        |SELECT doc_id, CAST(len(hits) AS INT) AS n_blocked,
        |  -- empty hit list: array_to_string yields NULL in DuckDB where
        |  -- Spark's concat_ws yields '' — pin the clean-doc spelling
        |  coalesce(array_to_string(list_sort(list_distinct(hits)), ','), '') AS blocked_terms,
        |  (len(hits) = 0) AS keep
        |FROM h""".stripMargin,
    "corpus_gate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |q AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    round(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
        |      AS DOUBLE) / len(w), 6) AS stop_ratio
        |  FROM t),
        |grams AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
        |  FROM t WHERE len(w) >= 2),
        |per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_grams FROM per GROUP BY doc_id),
        |dupf AS (SELECT doc_id,
        |    round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) AS df
        |  FROM agg)
        |SELECT q.doc_id, q.n_tokens, q.stop_ratio,
        |  coalesce(dupf.df, 0.0) AS dup_fraction,
        |  concat_ws(' | ',
        |    CASE WHEN q.n_tokens < 30 THEN 'too_short' END,
        |    CASE WHEN q.stop_ratio < 0.05 THEN 'low_stopword_ratio' END,
        |    CASE WHEN coalesce(dupf.df, 0.0) > 0.2 THEN 'repetitive' END) AS _reasons,
        |  (concat_ws(' | ',
        |    CASE WHEN q.n_tokens < 30 THEN 'too_short' END,
        |    CASE WHEN q.stop_ratio < 0.05 THEN 'low_stopword_ratio' END,
        |    CASE WHEN coalesce(dupf.df, 0.0) > 0.2 THEN 'repetitive' END) = '') AS keep
        |FROM q LEFT JOIN dupf ON q.doc_id = dupf.doc_id""".stripMargin,
    // zorder_cluster — bucketing replayed with the identical exact
    // integer arithmetic ((v-min)*(2^16-1) // max(range,1)) and the
    // interleave generated from the SAME (bit, column) loop as
    // Layout.interleave, so the 32 shift/mask terms agree by construction.
    "zorder_cluster" -> {
      val terms = (for { j <- 0 until 16; i <- 0 until 2 } yield {
        val b = if (i == 0) "bp" else "bs"
        s"((($b >> $j) & 1) << ${j * 2 + i})"
      }).mkString(" | ")
      s"""WITH b AS (SELECT CAST(min(l_partkey) AS BIGINT) AS mnp, CAST(max(l_partkey) AS BIGINT) AS mxp,
        |    CAST(min(l_suppkey) AS BIGINT) AS mns, CAST(max(l_suppkey) AS BIGINT) AS mxs FROM lineitem),
        |v AS (SELECT l_orderkey, l_linenumber,
        |    ((CAST(l_partkey AS BIGINT) - mnp) * 65535) // greatest(mxp - mnp, 1) AS bp,
        |    ((CAST(l_suppkey AS BIGINT) - mns) * 65535) // greatest(mxs - mns, 1) AS bs
        |  FROM lineitem, b)
        |SELECT l_orderkey, l_linenumber, bp AS zb_part, bs AS zb_supp,
        |  CAST($terms AS BIGINT) AS zval
        |FROM v""".stripMargin
    },
    // pipeline_report — the DWH pipeline's per-stage row counts re-derived:
    // quality replays Pipeline.runAll's 4-rule engine (null/FK/price checks
    // + the duplicate-key window; rn without ORDER BY is safe because the
    // count only depends on WHICH row is rn=1 when a dup group is
    // heterogeneous on the other rules — orderkeys are unique at every SF,
    // verified), transform_load is the two facts' grains (clean orders +
    // their lineitems), report is the zone-stats row count (zones present).
    "pipeline_report" ->
      """WITH ann AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderkey) AS rn FROM orders),
        |flg AS (SELECT o_orderkey, (o_custkey IS NOT NULL
        |    AND o_custkey IN (SELECT c_custkey FROM customer)
        |    AND (o_totalprice > 0 OR o_totalprice IS NULL) AND rn = 1) AS is_clean FROM ann),
        |cl AS (SELECT CAST(count(*) AS BIGINT) AS n FROM flg WHERE is_clean),
        |li AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem l
        |    JOIN flg f ON f.o_orderkey = l.l_orderkey AND f.is_clean),
        |zz AS (SELECT CAST(count(DISTINCT CASE WHEN is_clean THEN 'clean' ELSE 'error' END)
        |    AS BIGINT) AS n FROM flg)
        |SELECT 'stage_raw' AS stage, CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows
        |UNION ALL SELECT 'quality', (SELECT n FROM cl)
        |UNION ALL SELECT 'transform_load', (SELECT n FROM cl) + (SELECT n FROM li)
        |UNION ALL SELECT 'report', (SELECT n FROM zz)""".stripMargin,
    // corpus_report — the curation pipeline's per-stage counts re-derived
    // end-to-end: the corpus_gate thresholds (30/0.05/0.2, 6dp-rounded
    // signals), the source_cap md5 rank at 120, exact dedup's
    // normalized-text min-id grouping, then the dedup_cluster oracle's
    // all-pairs 3-shingle Jaccard >= 0.8 + recursive-reach fixpoint over
    // the capped survivors (representative = cluster min). The annotate-
    // only stages (span scrub, tokenizer, ppl buckets, shard write) carry
    // the dedup count through — pinned as never-drops in PipelineSpec.
    "corpus_report" ->
      """WITH RECURSIVE
        |d0 AS (SELECT doc_id, source, nfc_normalize(text) AS text FROM documents),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM d0),
        |q AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    round(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
        |      AS DOUBLE) / len(w), 6) AS stop_ratio FROM t),
        |grams AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
        |  FROM t WHERE len(w) >= 2),
        |per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_grams FROM per GROUP BY doc_id),
        |gated AS (SELECT d0.doc_id, d0.source, d0.text FROM d0
        |  JOIN q ON q.doc_id = d0.doc_id LEFT JOIN agg ON agg.doc_id = d0.doc_id
        |  WHERE NOT coalesce(q.n_tokens < 30, FALSE)
        |    AND NOT coalesce(q.stop_ratio < 0.05, FALSE)
        |    AND NOT coalesce(round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) > 0.2, FALSE)),
        |cap AS (SELECT doc_id, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR)) AS rk FROM gated),
        |capped AS (SELECT g.* FROM gated g JOIN cap ON cap.doc_id = g.doc_id WHERE cap.rk <= 120),
        |ex AS (SELECT min(doc_id) AS doc_id FROM capped
        |  GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g')),
        |exd AS (SELECT c.* FROM capped c JOIN ex ON ex.doc_id = c.doc_id),
        |tw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM exd),
        |sh AS (SELECT doc_id,
        |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
        |  FROM tw WHERE len(w) >= 3),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach(src, node) AS (
        |  SELECT doc_id AS src, doc_id AS node FROM exd
        |  UNION
        |  SELECT r.src, e.dst AS node FROM reach r JOIN edges e ON e.src = r.node),
        |kept AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING min(node) = src),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM kept)
        |SELECT 'ingest' AS stage, CAST((SELECT count(*) FROM d0) AS BIGINT) AS n_rows
        |UNION ALL SELECT 'quality_gate', CAST((SELECT count(*) FROM gated) AS BIGINT)
        |UNION ALL SELECT 'source_cap', CAST((SELECT count(*) FROM capped) AS BIGINT)
        |UNION ALL SELECT 'dedup', (SELECT n FROM nd)
        |UNION ALL SELECT 'span_scrub', (SELECT n FROM nd)
        |UNION ALL SELECT 'tokenizer', (SELECT n FROM nd)
        |UNION ALL SELECT 'ppl_buckets', (SELECT n FROM nd)
        |UNION ALL SELECT 'shard_write', (SELECT n FROM nd)""".stripMargin,
    "tfidf_top" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token),
        |d AS (SELECT *, CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df,
        |    (SELECT count(*) FROM documents) AS n_docs FROM tf),
        |s AS (SELECT doc_id, token, tf, df,
        |    round(tf * round(ln(CAST(n_docs AS DOUBLE) / df), 6), 6) AS tfidf FROM d),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, token) AS INT) AS rank FROM s)
        |SELECT doc_id, token, tf, df, tfidf, rank FROM r WHERE rank <= 5""".stripMargin,
    "mix_weights" ->
      """WITH t AS (SELECT lang, len(string_split_regex(trim(text), '\s+')) AS n_tok FROM documents),
        |p AS (SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM t GROUP BY lang),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS _total FROM p)
        |SELECT stratum, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / _total, 6) AS actual_share,
        |  round(CASE stratum WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2 WHEN 'fr' THEN 0.1
        |    WHEN 'es' THEN 0.1 WHEN 'de' THEN 0.1 ELSE 0.0 END, 6) AS target_share,
        |  round((CASE stratum WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2 WHEN 'fr' THEN 0.1
        |    WHEN 'es' THEN 0.1 WHEN 'de' THEN 0.1 ELSE 0.0 END)
        |    / (CAST(n_tokens AS DOUBLE) / _total), 6) AS weight
        |FROM p, tot""".stripMargin,
    // Epoch thresholds are floor(frac(w)*2^32) as 8-hex (the
    // sample_weighted convention): 1.6->99999999, 2.3->4ccccccc,
    // 0.5->80000000, 0.25->40000000, 1.0->00000000 (never keeps).
    "mix_epochs" ->
      """WITH e AS (SELECT doc_id, lang,
        |    CAST(CASE lang WHEN 'en' THEN 1 WHEN 'zh' THEN 2 WHEN 'es' THEN 0
        |         WHEN 'fr' THEN 0 ELSE 1 END AS INT) AS full_e,
        |    CASE lang WHEN 'en' THEN '99999999' WHEN 'zh' THEN '4ccccccc'
        |         WHEN 'es' THEN '80000000' WHEN 'fr' THEN '40000000'
        |         ELSE '00000000' END AS thr
        |  FROM documents)
        |SELECT doc_id, lang, CAST(e AS INT) AS epoch
        |FROM (SELECT doc_id, lang, full_e, thr,
        |        unnest(range(0, full_e + 1)) AS e FROM e) u
        |WHERE e < full_e OR substr(md5(doc_id || ':' || e), 1, 8) < thr""".stripMargin,
    // DSIR replay: identical hashed-bucket model (MD5-top-32-bit mod 1024),
    // identical add-1 smoothing, the per-bucket log-ratio as ONE double
    // expression rounded to 6dp, and the per-doc sum in DECIMAL — the
    // lm_score float-summation discipline.
    "dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang = 'en' AS t,
        |    string_split_regex(trim(text), '\s+') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, t, unnest(w) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, t,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM toks),
        |fb AS (SELECT doc_id, t,
        |    ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS b FROM feats),
        |stats AS (SELECT b, SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
        |    count(*) AS cr FROM fb GROUP BY b),
        |tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM stats),
        |ratio AS (SELECT b,
        |    CAST(round(ln((CAST(ct + 1 AS DOUBLE) / (nt + 1024))
        |      * (CAST(nr + 1024 AS DOUBLE) / (cr + 1))), 6)
        |      AS DECIMAL(18,6)) AS lr
        |  FROM stats, tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |  round(CAST(SUM(lr) AS DOUBLE), 6) AS dsir_logw
        |FROM fb JOIN ratio USING (b) GROUP BY doc_id""".stripMargin,
    // Integer replay of the pinned dyadic weights: Spark folds
    // w_i = (k_i - 2^31)/2^32 (each partial sum exact in double), so
    // summing the k_i as integers and applying (SUM(k) - n·2^31)/2^32/n
    // reconstructs the identical double — one exact subtraction, two
    // divisions whose operands are exactly representable.
    "quality_classify" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, unnest(w) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM toks),
        |fk AS (SELECT doc_id,
        |    ((('0x' || substr(md5(g), 1, 8))::BIGINT % 1024)
        |      * 2654435761) % 4294967296 AS k
        |  FROM feats),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |    CAST(SUM(k) - count(*) * 2147483648 AS DOUBLE)
        |      / 4294967296.0 / count(*) AS logit
        |  FROM fk GROUP BY doc_id)
        |SELECT doc_id, n_feats, logit, logit > 0.0 AS kept FROM agg""".stripMargin,
    // Per-source rollup of the same integer-replayed classifier verdicts;
    // both ratios are one double division of exactly-summed integers.
    "domain_gate" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, unnest(w) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM toks),
        |fk AS (SELECT doc_id,
        |    ((('0x' || substr(md5(g), 1, 8))::BIGINT % 1024)
        |      * 2654435761) % 4294967296 AS k
        |  FROM feats),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(k) - count(*) * 2147483648 AS DOUBLE)
        |      / 4294967296.0 / count(*) AS logit
        |  FROM fk GROUP BY doc_id),
        |j AS (SELECT d.source, d.n_chars, a.logit > 0.0 AS kept
        |  FROM documents d JOIN agg a USING (doc_id)),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS DOUBLE) / count(*) AS mean_chars,
        |    CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*) AS keep_rate
        |  FROM j GROUP BY source)
        |SELECT source, n_docs, mean_chars, keep_rate,
        |  n_docs >= 10 AND keep_rate > 0.5 AS src_kept
        |FROM g""".stripMargin,
    // Spearman replay: the classifier logit chain, the mann_whitney
    // doubled-midrank construction per variable, moment sums in HUGEINT,
    // the identically-parenthesized double chain (IEEE sqrt included).
    "quality_length_corr" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |feats AS (
        |  SELECT doc_id, unnest(w) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM toks),
        |fk AS (SELECT doc_id,
        |    ((('0x' || substr(md5(g), 1, 8))::BIGINT % 1024)
        |      * 2654435761) % 4294967296 AS k
        |  FROM feats),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(k) - count(*) * 2147483648 AS DOUBLE)
        |      / 4294967296.0 / count(*) AS logit
        |  FROM fk GROUP BY doc_id),
        |base AS (SELECT CAST(d.n_chars AS DOUBLE) AS x, a.logit AS y
        |  FROM documents d JOIN agg a USING (doc_id)),
        |pairs AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY x, y),
        |cx AS (SELECT x, SUM(c) AS t FROM pairs GROUP BY x),
        |rx AS (SELECT x, 2 * (sum(t) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) + t + 1 AS rxv
        |  FROM cx),
        |cy AS (SELECT y, SUM(c) AS t FROM pairs GROUP BY y),
        |ry AS (SELECT y, 2 * (sum(t) OVER (ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) + t + 1 AS ryv
        |  FROM cy),
        |wr AS (SELECT p.c, rx.rxv, ry.ryv
        |  FROM pairs p JOIN rx USING (x) JOIN ry USING (y)),
        |m AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    SUM(CAST(c AS HUGEINT) * rxv) AS sx,
        |    SUM(CAST(c AS HUGEINT) * ryv) AS sy,
        |    SUM(CAST(c AS HUGEINT) * rxv * rxv) AS sxx,
        |    SUM(CAST(c AS HUGEINT) * ryv * ryv) AS syy,
        |    SUM(CAST(c AS HUGEINT) * rxv * ryv) AS sxy
        |  FROM wr)
        |SELECT n,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS rho
        |FROM m""".stripMargin,
    // Kappa replay: the corpus_gate keep chain + the quality_classify
    // kept chain joined per doc, the 2x2 contingency, and kappa in its
    // cleared-denominator integer form carried in HUGEINT (products of
    // two row counts overflow BIGINT past ~3B rows), one terminal
    // division per output double.
    "gate_agreement" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |q AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    round(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
        |      AS DOUBLE) / len(w), 6) AS stop_ratio
        |  FROM t),
        |grams AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
        |  FROM t WHERE len(w) >= 2),
        |per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
        |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_grams FROM per GROUP BY doc_id),
        |dupf AS (SELECT doc_id,
        |    round(CAST(n_grams - n_distinct_grams AS DOUBLE) / n_grams, 6) AS df
        |  FROM agg),
        |ga AS (SELECT q.doc_id,
        |    (concat_ws(' | ',
        |      CASE WHEN q.n_tokens < 30 THEN 'too_short' END,
        |      CASE WHEN q.stop_ratio < 0.05 THEN 'low_stopword_ratio' END,
        |      CASE WHEN coalesce(dupf.df, 0.0) > 0.2 THEN 'repetitive' END) = '') AS a
        |  FROM q LEFT JOIN dupf ON q.doc_id = dupf.doc_id),
        |cfeats AS (
        |  SELECT doc_id, unnest(w) AS g FROM t
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |  FROM t),
        |cfk AS (SELECT doc_id,
        |    ((('0x' || substr(md5(g), 1, 8))::BIGINT % 1024)
        |      * 2654435761) % 4294967296 AS k
        |  FROM cfeats),
        |cagg AS (SELECT doc_id,
        |    CAST(SUM(k) - count(*) * 2147483648 AS DOUBLE)
        |      / 4294967296.0 / count(*) AS logit
        |  FROM cfk GROUP BY doc_id),
        |j AS (SELECT ga.a AS a, cagg.logit > 0.0 AS b
        |  FROM ga JOIN cagg USING (doc_id)),
        |x AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS yy,
        |    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS yn,
        |    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS ny,
        |    CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS nn
        |  FROM j),
        |f AS (SELECT n, yy, nn, yn, ny,
        |    CAST(yy + yn AS HUGEINT) * (yy + ny)
        |      + CAST(ny + nn AS HUGEINT) * (yn + nn) AS pe_num
        |  FROM x)
        |SELECT n, yy AS n_both_keep, nn AS n_both_drop,
        |  yn AS n_only_a, ny AS n_only_b,
        |  CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE) AS p_o,
        |  CAST(pe_num AS DOUBLE) / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS p_e,
        |  CASE WHEN CAST(n AS HUGEINT) * n <> pe_num
        |    THEN CAST(CAST(n AS HUGEINT) * (yy + nn) - pe_num AS DOUBLE)
        |         / CAST(CAST(n AS HUGEINT) * n - pe_num AS DOUBLE) END AS kappa
        |FROM f""".stripMargin,
    "quality_deciles" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(ntile(10) OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS INT) AS decile
        |FROM documents""".stripMargin,
    "moving_avg" ->
      """WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (SELECT event_type, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.event_type, s.day,
        |    coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS rev,
        |    CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events
        |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
        |w AS (SELECT event_type, day, n_events, rev,
        |    SUM(rev) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS wsum,
        |    count(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS wn
        |  FROM filled)
        |SELECT event_type, day, n_events,
        |  CAST(rev AS DOUBLE) AS day_value, CAST(wsum AS DOUBLE) AS win_sum,
        |  round(CAST(wsum AS DOUBLE) / wn, 6) AS win_avg
        |FROM w""".stripMargin,
    // EWMA: the generated term chain is IDENTICAL on both sides — each
    // lag scaled by an exact power-of-two literal, summed left-assoc,
    // renormalized by the (exactly-summed dyadic) present-weight total;
    // the spike compare is one exact multiply.
    "ewma_daily" -> {
      val W = 16
      def wt(k: Int) = math.pow(2.0, -(k + 1)).toString
      val num = (0 until W)
        .map(k => s"coalesce(lag(xv, $k) OVER wspec * ${wt(k)}, 0)").mkString(" + ")
      val den = (0 until W)
        .map(k => s"coalesce(CASE WHEN lag(xv, $k) OVER wspec IS NOT NULL THEN ${wt(k)} END, 0)")
        .mkString(" + ")
      s"""WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (SELECT event_type, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |filled AS (SELECT s.event_type, s.day,
        |    CAST(coalesce(d.rev, CAST(0 AS DECIMAL(18,4))) AS DOUBLE) AS xv,
        |    CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events
        |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
        |e AS (SELECT event_type, day, n_events, xv,
        |    ($num) / ($den) AS ewma
        |  FROM filled WINDOW wspec AS (PARTITION BY event_type ORDER BY day)),
        |p AS (SELECT event_type, day, n_events, xv, ewma,
        |    lag(ewma, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM e)
        |SELECT event_type, day, n_events, xv AS day_value, ewma,
        |  coalesce(xv > 4.0 * prev, FALSE) AS spike
        |FROM p""".stripMargin
    },
    "ppl_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |n AS (SELECT count(*) AS n_total FROM tok),
        |lm AS (SELECT doc_id,
        |    round(CAST(SUM(tf * CAST(round(ln(CAST(cnt AS DOUBLE) / n_total), 6)
        |      AS DECIMAL(18,6))) AS DOUBLE) / SUM(tf), 6) AS avg_logprob
        |  FROM tf JOIN vocab USING (token), n GROUP BY doc_id),
        |j AS (SELECT d.doc_id, d.lang, lm.avg_logprob
        |  FROM documents d JOIN lm USING (doc_id))
        |SELECT doc_id, lang, avg_logprob,
        |  CAST(ntile(3) OVER (PARTITION BY lang
        |    ORDER BY avg_logprob, doc_id) AS INT) AS ppl_bucket
        |FROM j""".stripMargin
  )
}
