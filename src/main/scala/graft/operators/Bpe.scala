package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NativeExprs

/** Byte-pair-encoding tokenizer induction and application (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units") —
  * the subword-vocabulary step a training-data pipeline runs between
  * curation and sequence packing. No analog exists in the reference tree
  * (its tokenization stops at type coercion); this is a brief-mandated
  * LLM-training-data capability.
  *
  * Scale design: training follows the classical word-frequency formulation —
  * ONE corpus pass builds the (word, freq) table, and every merge round
  * operates on that VOCABULARY-SIZED table, never the corpus. Per round:
  * adjacent symbol pairs explode map-side weighted by word frequency, one
  * keyed aggregation counts them, and a distributed TakeOrdered(1) picks
  * the winner under a deterministic (count desc, left asc, right asc)
  * tie-break — the only driver state is that single (left, right) pair.
  * Symbol rewriting is a map-side native expression; `localCheckpoint`
  * every few rounds bounds lineage exactly as the iterative
  * connected-components propagation does. Segmentation is one compiled
  * map-side pass per document (no shuffle at all) with the trained merge
  * list carried as a plan literal.
  */
object Bpe {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Per-character symbol array with the end-of-word marker folded into the
    * final character (the Sennrich initialization). The "(?!^)" split is
    * code-point aware, matching the segmenter's iteration. */
  private def charSymbols(word: Column, endOfWord: String): Column = {
    // Spark's split keeps trailing empties (Java split limit -1), and
    // "(?!^)" also matches at end-of-string — drop the trailing "" so the
    // marker folds into the real final character.
    val chars = filter(split(word, "(?!^)"), c => length(c) > 0)
    concat(slice(chars, lit(1), size(chars) - 1),
      array(concat(element_at(chars, -1), lit(endOfWord))))
  }

  /** Train `numMerges` BPE merges on the corpus. Returns the ordered merge
    * list (rank order = training order). Rounds stop early when no
    * adjacent pair reaches `minPairCount` (merging hapax pairs only bloats
    * the vocabulary). Deterministic: same corpus, same merges, any
    * partitioning.
    *
    * Honest scale boundary: each merge is one driver-loop round over the
    * vocabulary table (~0.1 s of job overhead at any SF), so this loop
    * shape suits merge budgets in the hundreds. A production 32k-merge
    * tokenizer wants incremental pair-count maintenance (the in-memory
    * trick reference trainers use) — on a corpus-derived word-frequency
    * table that fits one machine, which this method's first aggregation
    * produces; the distributed rounds here are for vocabularies too large
    * to collect.
    *
    * Memoized per (session, canonicalized corpus plan string AND its
    * semanticHash, numMerges, endOfWord, textCol, minPairCount) with the
    * same bounded-map discipline as the ANN width cache. BOTH plan
    * identities are load-bearing: the canonicalized STRING alone is not
    * enough — it omits parquet file locations and LocalRelation data
    * (verified empirically: two same-schema reads of different testdata
    * dirs print the identical canonical string), so on its own it would
    * silently serve another corpus's merge list; `semanticHash` DOES
    * distinguish locations/data (and is stable across re-reads of the
    * same dir), and pairing it with the string means a wrong hit needs a
    * simultaneous string match and 32-bit hash collision. A stale or
    * missed entry only re-trains — a collision is the dangerous case,
    * since merges are a correctness input (unlike the count cache's
    * collision-tolerant sizing hints). Pass `memoize = false` to force a
    * fresh training run — what a benchmark of the training loop itself
    * wants. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            endOfWord: String = "</w>", minPairCount: Long = 2L,
            memoize: Boolean = true): Seq[(String, String)] = {
    if (!memoize) return trainUncached(docs, textCol, numMerges, endOfWord, minPairCount)
    if (mergeCache.size() >= mergeCacheMax) mergeCache.clear()
    val analyzed = docs.queryExecution.analyzed
    val key = (docs.sparkSession.hashCode,
      s"${analyzed.canonicalized}|${analyzed.semanticHash()}|$textCol|$numMerges|$endOfWord|$minPairCount")
    mergeCache.computeIfAbsent(key,
      _ => trainUncached(docs, textCol, numMerges, endOfWord, minPairCount))
  }

  private val mergeCacheMax = 64
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Seq[(String, String)]]()

  private def trainUncached(docs: DataFrame, textCol: String, numMerges: Int,
                            endOfWord: String, minPairCount: Long): Seq[(String, String)] = {
    var words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(charSymbols(col("word"), endOfWord).as("symbols"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (!exhausted && round < numMerges) {
      val n1 = greatest(size(col("symbols")) - 1, lit(0))
      val best = words
        .select(col("freq"),
          explode(zip_with(slice(col("symbols"), lit(1), n1),
            slice(col("symbols"), lit(2), n1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .select(col("freq"), col("p").getField("l").as("l"), col("p").getField("r").as("r"))
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("cnt"))
        .where(col("cnt") >= minPairCount)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += ((l, r))
        words = words.withColumn("symbols",
          NativeExprs.bpeMergeOnce(col("symbols"), l, r))
        round += 1
        if (round % 4 == 0) words = words.localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** The trained merge table as a DataFrame (rank is 1-based training
    * order) — bounded at `numMerges` rows by construction. */
  def mergesDF(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "merge_left", "merge_right")
  }

  /** Segment each document into subword pieces under a trained merge list —
    * one compiled map-side expression, zero shuffles. */
  def segment(docs: DataFrame, idCol: String, textCol: String,
              merges: Seq[(String, String)], endOfWord: String = "</w>"): DataFrame =
    docs.select(col(idCol),
      NativeExprs.bpeSegment(tokens(col(textCol)), merges, endOfWord).as("pieces"))
}
