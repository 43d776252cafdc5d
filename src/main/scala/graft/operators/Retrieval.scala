package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse (inverted-index) ranked retrieval over a document corpus — the
  * lexical complement to the dense-vector ANN operators in [[Similarity]]:
  * training-data curation uses it for targeted corpus probes ("find the
  * documents about X") and as the first stage of retrieval-augmented
  * pipelines.
  *
  * Scale design: the full corpus NEVER crosses a shuffle. The token stream
  * is pruned to the COLLECTED query vocabulary (bounded — it is the query)
  * map-side, immediately after the explode and before the (doc_id, term)
  * partial agg, so the postings shuffle carries only query-term hits;
  * document frequencies are a re-agg of that same hits table (its rows ARE
  * distinct (doc, term) pairs — one exchange, reused). Corpus scalars
  * (N, avgdl) need no explode at all: a second corpus scan computes
  * per-doc token counts as a pure map-side projection into a scalar agg —
  * zero shuffle. Two corpus scans total, one of them explode-free, no
  * full-postings exchange anywhere. The per-query re-rank goes through the
  * bounded-heap [[graft.functions.TopKAgg]] so only K docs per query cross
  * the final shuffle.
  */
object Retrieval {

  /** BM25 top-k: for each query (a bag of terms, treated as a set), score
    * every document containing at least one query term with
    * `sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` where
    * `idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)` (Robertson/Sparck-Jones,
    * the Lucene formulation), and keep the k best (score desc, doc id asc).
    *
    * Per-term contributions are rounded to 6dp and summed as
    * DECIMAL(18,6) so the score is independent of accumulation order —
    * bit-stable across partitionings and engines.
    *
    * Output: (query_id, doc_id, score, rank).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
               vocabInlineLimit: Int = 1000): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // Corpus scalars (N, avgdl): an explode-free projection into a 1-row
    // scalar agg with EXACT count(*) semantics — every row counts toward
    // n_docs (null id or null text included) and a null text contributes
    // null dl (skipped by SUM but in the denominator), matching what any
    // SQL engine computes for count(*) / SUM(dl)/count(*).
    //
    // dl carries a provably-zero pmod(xxhash64(id), 1) term purely so the
    // id column stays in this branch's REQUIRED set: that makes the
    // required columns {id, text}, identical to the postings branch's, so
    // when the input carries an exchange (e.g. a spread repartition over a
    // few-row-group parquet) both branches canonicalize to the same
    // exchange and the corpus is scanned + shuffled ONCE for the whole
    // query. A bare `0 * id` term is folded away by the multiply-by-zero
    // simplification (and count(id) both diverges from count(*) on null
    // ids and gets rewritten to count(1) on non-nullable schemas);
    // pmod-by-one has no folding rule, and value/nullability are
    // untouched (x + 0 = x, null + 0 = null). On an exchange-free scan
    // the only cost is reading the id column alongside text. (Collecting
    // these two scalars eagerly instead measures SLOWER: the standalone
    // action can't share the exchange and can't overlap the postings
    // stage.)
    val dlExpr = size(toks) + pmod(xxhash64(col(idCol)), lit(1L)).cast("int")
    val stats = docs
      .select(dlExpr.as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // Query terms: DISTINCT terms per query (query-as-set BM25), COLLECTED
    // once — bounded by |queries| * query length, the same discipline as
    // the IVF centroid literals. One driver-side pass yields BOTH the
    // (query_id, term) join side (re-created as a LocalRelation, so its
    // broadcast is a no-scan job) and the distinct vocabulary for the
    // map-side prune — previously the vocab collect and the qterms
    // broadcast each re-scanned the queries input.
    val qtermRows = queries.select(col(qIdCol).as("query_id"),
        explode(array_distinct(TextAnalysis.tokens(col(qTextCol)))).as("term"))
    val collected = qtermRows.collect()
    val qterms = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(collected: _*), qtermRows.schema)
    val vocab: Array[Any] = collected.map(_.get(1)).distinct
    // Map-side prune of the token stream. Small vocabularies inline as an
    // InSet literal (zero joins); past `vocabInlineLimit` distinct terms an
    // inlined list would bloat the plan (analysis + codegen cost scales
    // with literal count), so the prune becomes a broadcast SEMI join on
    // term — same shuffle profile (the broadcast replaces the literal set;
    // the stream still never shuffles unpruned), no plan blowup.
    val inlineVocab = vocab.length <= vocabInlineLimit
    // Query-term postings: the ONE explode — pruned to the query vocabulary
    // BEFORE the (doc_id, term) partial agg, so only query-term hits ever
    // cross the shuffle (at corpus scale the full postings table is the
    // biggest intermediate in a naive BM25; it never exists here). dl rides
    // in the group key so no second join against a lengths table.
    val exploded = docs
      .select(col(idCol).as("doc_id"), size(toks).as("dl"), explode(toks).as("term"))
    val pruned =
      if (vocab.isEmpty) exploded.where(lit(false))
      else if (inlineVocab) exploded.where(col("term").isin(vocab.toIndexedSeq: _*))
      else exploded.join(broadcast(qterms.select(col("term")).distinct()),
        Seq("term"), "left_semi")
    val hits = pruned
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // Document frequency of query terms: hits rows are distinct (doc, term)
    // pairs (the vocab filter is on term alone, so every doc containing a
    // query term is still present), hence df(term) = count(*) — a re-agg of
    // the hits table whose exchange is planned once and REUSED. The count
    // argument is deliberately a NULLABLE expression that requires tf:
    // a bare count(tf) gets rewritten to count(1) (tf is non-nullable),
    // after which column pruning specializes this consumer's copy of the
    // hits aggregate to a no-function distinct — canonically UNEQUAL to
    // the contrib branch's copy, so the AQE stage cache stops sharing the
    // exchange and the corpus is tokenized+exploded twice (observed as two
    // concurrent full-scan jobs). when(tf > 0, true) is non-null on every
    // row (tf >= 1 by construction), so df is still count(*), but the
    // rewrite can't fire and both consumers plan the identical child.
    val dfq = hits
      .groupBy(col("term")).agg(count(when(col("tf") > 0, true)).as("df"))
    val contrib = hits
      .join(broadcast(qterms), "term")
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))),
          6).cast("decimal(18,6)").as("c"))
    val scored = contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).cast("double").as("score"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topKPairs(
        struct(col("score").as("ord"), col("doc_id").as("id")), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        col("col.ord").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }
}
