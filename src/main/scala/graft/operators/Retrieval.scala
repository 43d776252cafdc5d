package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse (inverted-index) ranked retrieval over a document corpus — the
  * lexical complement to the dense-vector ANN operators in [[Similarity]]:
  * training-data curation uses it for targeted corpus probes ("find the
  * documents about X") and as the first stage of retrieval-augmented
  * pipelines.
  *
  * Scale design: the corpus is tokenized exactly ONCE — the postings list
  * (doc_id, dl, term, tf), a single explode + partial-agg shuffle keyed on
  * (doc_id, term) — and everything else derives from it: document
  * frequencies are `count(*)` per term over the postings (postings rows ARE
  * distinct (doc, term) pairs), pruned to the COLLECTED query vocabulary
  * (bounded — it is the query) before the tiny term-keyed agg; corpus
  * scalars (N, avgdl) are a doc-grain re-agg of the same postings. The
  * postings exchange is planned once and REUSED by all three consumers.
  * The per-query re-rank goes through the bounded-heap
  * [[graft.functions.TopKAgg]] so only K docs per query cross the final
  * shuffle.
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
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // Postings: THE one corpus tokenization — one explode + one
    // (doc_id, term)-keyed partial-agg shuffle; dl rides in the group key so
    // no second join against a lengths table. Every other input below is a
    // re-agg of this table, so its exchange is planned once and REUSED.
    val postings = docs
      .select(col(idCol).as("doc_id"), size(toks).as("dl"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // Corpus scalars: doc-grain re-agg of the postings (dl is constant per
    // doc, so (doc_id, dl) IS the doc grain) → one row, broadcast everywhere.
    val stats = postings.groupBy(col("doc_id"), col("dl")).agg(count(lit(1)).as("_nt"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // Query vocabulary: DISTINCT terms per query (query-as-set BM25). The
    // vocabulary is COLLECTED — bounded by |queries| * query length, the
    // same discipline as the IVF centroid literals — so the document-
    // frequency probe below needs no join at all.
    val qterms = queries.select(col(qIdCol).as("query_id"),
        explode(array_distinct(TextAnalysis.tokens(col(qTextCol)))).as("term"))
    val vocab: Array[Any] = qterms.select(col("term")).distinct().collect().map(_.get(0))
    // Document frequency of QUERY terms only: postings rows are distinct
    // (doc, term) pairs, so df(term) = count(*) — filtered to the inlined
    // query vocabulary BEFORE the tiny term-keyed agg. No second corpus
    // scan, no full-vocabulary aggregate.
    val vocabFilter =
      if (vocab.isEmpty) lit(false) else col("term").isin(vocab.toIndexedSeq: _*)
    val dfq = postings
      .where(vocabFilter)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = postings
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
