package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sparse (inverted-index) ranked retrieval over a document corpus — the
  * lexical complement to the dense-vector ANN operators in [[Similarity]]:
  * training-data curation uses it for targeted corpus probes ("find the
  * documents about X") and as the first stage of retrieval-augmented
  * pipelines.
  *
  * Scale design: the full corpus NEVER crosses a shuffle, and the corpus
  * postings table never exists — per-document term frequencies for the
  * (bounded) query vocabulary are computed MAP-SIDE by a native expression
  * ([[graft.functions.QueryTfExpr]]: one compiled hash-lookup pass per
  * document, O(|tokens|) regardless of vocabulary size), so `explode` of
  * its result IS the query-term hits table. Corpus statistics (N, avgdl)
  * and per-term document frequencies — both tiny, vocabulary-bounded
  * aggregates — come from ONE eager pre-pass over the corpus and ride into
  * the scoring projection as literals / LocalRelation columns. The main
  * query is then three stages: scan+tf+explode+broadcast-join+partial-sum,
  * the (query_id, doc_id) score aggregation, and the bounded-heap
  * [[graft.functions.TopKAgg]] re-rank (only K docs per query cross the
  * final shuffle). Past `vocabInlineLimit` distinct query terms the
  * operator switches to the shared-exchange postings pipeline (see
  * [[bm25TopKShared]]) whose prune is a broadcast semi-join.
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
    // Query terms: DISTINCT terms per query (query-as-set BM25), COLLECTED
    // once — bounded by |queries| * query length, the same discipline as
    // the IVF centroid literals. One driver-side pass yields the
    // (query_id, term) join side, the distinct vocabulary, and (inline
    // path) the slots the df column re-joins onto.
    val qtermRows = queries.select(col(qIdCol).as("query_id"),
        explode(array_distinct(TextAnalysis.tokens(col(qTextCol)))).as("term"))
    val collected = qtermRows.collect()
    val vocab: Array[String] =
      collected.map(_.getString(1)).distinct
    if (vocab.length > vocabInlineLimit)
      return bm25TopKShared(docs, idCol, textCol, queries, qtermRows.schema,
        collected, k, k1, b)

    val toks = TextAnalysis.tokens(col(textCol))
    val hs = graft.functions.NativeExprs.queryTf(col("_w"), vocab.toSeq)
    // ONE eager corpus pass computes every global the scoring projection
    // needs — corpus size, total token length, and per-term document
    // frequency — as a vocabulary-bounded (≤ |vocab|+1 rows) collect:
    // posexplode_outer emits each document's query-term hits plus exactly
    // one (null pos, null term) row for hit-less documents, so within each
    // term group `pos = 0 OR pos IS NULL` marks every document exactly
    // once. n_docs/avgdl keep exact count(*) semantics (null text → null
    // dl: skipped by SUM, counted by COUNT — what any SQL engine computes
    // for count(*) / SUM(dl)/count(*)). Making these literals removes the
    // stats-branch scalar aggregate, its broadcast, the df re-aggregate,
    // and TWO broadcast joins from the main query: what remains is a
    // straight-line three-stage plan. (The pre-pass re-reads the corpus,
    // but the previous shared-exchange design also paid a second pass over
    // the exchanged corpus for its stats branch — same two passes, minus
    // four scheduled stages.)
    val grouped = docs
      .select(toks.as("_w"))
      .select(size(col("_w")).as("_dl"), posexplode_outer(hs))
      .groupBy(col("col.term").as("term"))
      .agg(count(when(col("pos") === 0 || col("pos").isNull, 1)).as("n0"),
        sum(when(col("pos") === 0 || col("pos").isNull, col("_dl"))).as("s0"),
        count(lit(1)).as("df"))
      .collect()
    var nDocs = 0L
    var sumDl = 0L
    val dfByTerm = new scala.collection.mutable.HashMap[String, Long]()
    grouped.foreach { r =>
      nDocs += r.getLong(1)
      if (!r.isNullAt(2)) sumDl += r.getLong(2)
      if (!r.isNullAt(0)) dfByTerm.put(r.getString(0), r.getLong(3))
    }
    // identical float shape to the aggregate it replaces:
    // cast(sum as double) / cast(count as double)
    val avgdl = sumDl.toDouble / nDocs.toDouble

    // (query_id, term, df) LocalRelation: df joins back by VALUE so idf
    // still evaluates from long columns inside the projection — the exact
    // arithmetic shape (long subtraction, then one double cast) the
    // column-fed formulation had, so scores hash-match the oracle.
    val qtSchema = StructType(qtermRows.schema.fields :+
      StructField("df", LongType, nullable = false))
    val qtRows: Array[Row] = collected.map(r =>
      Row(r.get(0), r.getString(1), dfByTerm.getOrElse(r.getString(1), 0L)))
    val qterms = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(qtRows: _*), qtSchema)

    // Main query: the ONLY corpus pass in the plan. The token array is
    // materialized once per row in the projection below the Generate, so
    // dl and the tf entries come from one split() evaluation.
    val hits = docs
      .select(col(idCol).as("doc_id"), toks.as("_w"))
      .select(col("doc_id"), size(col("_w")).as("dl"), explode(hs).as("_h"))
      .select(col("doc_id"), col("dl"), col("_h.term").as("term"),
        col("_h.tf").cast("long").as("tf"))
    val contrib = hits
      .join(broadcast(qterms), "term")
      .select(col("query_id"), col("doc_id"),
        round(
          log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))),
          6).cast("decimal(18,6)").as("c"))
    rank(contrib, k)
  }

  /** Shared tail: sum per-term contributions into scores and keep the k
    * best per query via the bounded-heap aggregate. */
  private def rank(contrib: DataFrame, k: Int): DataFrame = {
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

  /** Large-vocabulary (> vocabInlineLimit) fallback: the shared-exchange
    * postings pipeline. The token stream is pruned by a broadcast SEMI
    * join against the query vocabulary (an inlined InSet or a per-task
    * hash map would both hold the full vocabulary; past the limit the
    * semi-join keeps plan and task-closure size flat), then aggregated to
    * (doc_id, term) postings whose exchange is planned once and REUSED by
    * the document-frequency re-aggregate. Corpus scalars stay an
    * explode-free scalar aggregate over the same exchange.
    */
  private def bm25TopKShared(docs: DataFrame, idCol: String, textCol: String,
                             queries: DataFrame, qtSchema: StructType,
                             collected: Array[Row],
                             k: Int, k1: Double, b: Double): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // Corpus scalars (N, avgdl): an explode-free projection into a 1-row
    // scalar agg with EXACT count(*) semantics — every row counts toward
    // n_docs (null id or null text included) and a null text contributes
    // null dl (skipped by SUM but in the denominator).
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
    // untouched (x + 0 = x, null + 0 = null).
    val dlExpr = size(toks) + pmod(xxhash64(col(idCol)), lit(1L)).cast("int")
    val stats = docs
      .select(dlExpr.as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val qterms = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(collected: _*), qtSchema)
    // Query-term postings: the ONE explode — pruned to the query vocabulary
    // BEFORE the (doc_id, term) partial agg, so only query-term hits ever
    // cross the shuffle (at corpus scale the full postings table is the
    // biggest intermediate in a naive BM25; it never exists here). dl rides
    // in the group key so no second join against a lengths table.
    val exploded = docs
      .select(col(idCol).as("doc_id"), size(toks).as("dl"), explode(toks).as("term"))
    val pruned = exploded.join(broadcast(qterms.select(col("term")).distinct()),
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
    rank(contrib, k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of several
    * per-query rankings — the standard HYBRID-retrieval combiner: each
    * ranker contributes 1/(kRrf + rank) for the documents on its top-k
    * list (documents missing from a list contribute nothing), and the
    * fused score needs no score calibration across rankers because only
    * RANKS enter — which is exactly why RRF is the production default for
    * fusing BM25's unbounded tf-idf scale with cosine's [−1, 1]
    * (see [[bm25TopK]] / [[Similarity.exactTopK]]).
    *
    * Inputs are (query_id, doc_id, rank) tables — ALREADY top-k-bounded
    * per query by their rankers — so every stage here is dimension-sized:
    * the union holds ≤ |rankings|·k rows per query, the fuse groupBy is a
    * bounded aggregate, and the final window's frame is ≤ |rankings|·k
    * rows (the funnel-class bounded-window argument; no TopKAgg needed
    * because the candidate set can't grow with the corpus). Per-list
    * contributions round to 6dp and sum as DECIMAL(18,6) — the bm25TopK
    * discipline — so the fused score is accumulation-order independent
    * and engine-exact. Output: (query_id, doc_id, n_lists, rrf_score,
    * rank), top `k` per query by (rrf_score desc, doc_id asc). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1 && kRrf >= 0, s"rrfFuse needs k >= 1, kRrf >= 0; got k=$k kRrf=$kRrf")
    val u = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_.unionByName(_))
    val fused = u
      .select(col("query_id"), col("doc_id"),
        round(lit(1).cast("double") / (lit(kRrf) + col("rank")), 6)
          .cast("decimal(18,6)").as("_c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_lists"),
        sum(col("_c")).cast("double").as("rrf_score"))
    fused
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_score").desc, col("doc_id"))).cast("int"))
      .where(col("rank") <= k)
  }
}
