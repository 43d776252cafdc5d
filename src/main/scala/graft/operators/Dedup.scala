package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Ckpt.CkptOps

/** Document deduplication: exact (hash groupBy), MinHash+LSH banding,
  * SimHash, and n-gram Jaccard — the LLM-training-data operators the brief
  * mandates beyond the reference's surface.
  *
  * Scale design (100 TB corpora):
  *  - Exact dedup groups on the normalized text; at scale the shuffle key is
  *    the 8-byte xxhash64 prehash (`exactDedupByHash`) so document bodies
  *    never become shuffle keys.
  *  - Near-dedup NEVER does all-pairs: candidate generation is
  *    `groupBy(band_id, band_sig)` — a self-equijoin on 8-byte keys that only
  *    pairs documents sharing an LSH band. Expected false-candidate rate at
  *    Jaccard j with b bands of r rows is 1-(1-j^r)^b; with b=32, r=4 the
  *    miss rate at j≥0.9 is (1-0.9^4)^32 ≈ 1.5e-15.
  *  - Exact-Jaccard verification runs only on candidate pairs.
  */
object Dedup {

  /** Dedup normalization: lowercase + whitespace-collapse. */
  def normText(c: Column): Column = Normalize.collapseWs(lower(c))

  /** Exact dedup: one surviving (minimum) id per normalized text, with copy
    * count. Keep-first semantics like the reference's duplicate rules. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(normText(col(textCol)).as("_norm"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Scale path: group on (xxhash64(norm), norm) so the hash leads the
    * shuffle key; semantically identical to [[exactDedup]]. */
  def exactDedupByHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(xxhash64(normText(col(textCol))).as("_h"), normText(col(textCol)).as("_norm"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Cluster-size histogram: how many duplicate clusters of each size. */
  def dedupStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    exactDedup(docs, idCol, textCol)
      .groupBy(col("n_copies")).agg(count(lit(1)).as("n_clusters"))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles (space-joined). Rows with fewer than n
    * tokens yield an empty shingle set. Native expression
    * (graft.functions.ShinglesExpr) — one compiled pass per row. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.NativeExprs.shingles(tokens(text), n)

  /** Exact Jaccard of two distinct-element arrays. Note: used inline this
    * evaluates `array_intersect` twice (no reliable CSE for array exprs) —
    * the verify hot paths go through [[withJaccard]] instead. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

  /** Append exact Jaccard of two array columns as `outCol` (rounded 6dp),
    * evaluating the intersect ONCE: the intersect size lands in its own
    * projection and is referenced twice downstream — CollapseProject keeps
    * non-cheap multiply-referenced expressions in their own Project, so the
    * candidate-verify hot path pays one array_intersect per pair, not two. */
  def withJaccard(df: DataFrame, a: Column, b: Column, outCol: String): DataFrame =
    df.withColumn("_isz", size(array_intersect(a, b)).cast("double"))
      .withColumn(outCol, round(col("_isz") / (size(a) + size(b) - col("_isz")), 6))
      .drop("_isz")

  /** 128-value MinHash signature of a shingle array, as array<bigint>:
    * min over shingle xxhash64s of the seeded affine family
    * h -> (a*h + b) mod 2^31-1 (the mod is essential: an affine map without
    * it is monotone in h and every "hash function" picks the same shingle).
    * Implemented as a native Catalyst expression (graft.functions
    * .MinHashSigExpr) — the interpreted higher-order-function formulation
    * measured ~500x slower. */
  def minHashSignature(shinglesCol: Column, numHashes: Int): Column =
    graft.functions.NativeExprs.minHashSig(shinglesCol, numHashes)

  /** Banded signatures: array of `numBands` xxhash64 values, each over
    * `rowsPerBand` consecutive MinHash values (+ band index). */
  def bandSignatures(mh: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      xxhash64((Seq[Column](lit("band"), b) ++
        (0 until rowsPerBand).map(r => get(mh, b * rowsPerBand + r))): _*))

  /** (id, band_id, band_sig) exploded LSH index for a document table.
    * `passthrough` columns ride along through the projection chain (e.g. a
    * split tag), so callers never need a recovery join back to the source —
    * that join re-derives the shingle+minhash lineage on both sides of any
    * downstream self-join. */
  def lshIndex(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, numHashes: Int = 128,
               numBands: Int = 32, rowsPerBand: Int = 4,
               passthrough: Seq[String] = Nil): DataFrame = {
    require(numBands * rowsPerBand == numHashes, "bands*rows must equal numHashes")
    val keep = passthrough.map(col)
    docs
      .select(col(idCol) +: keep :+ shingles(col(textCol), shingleN).as("_sh"): _*)
      .where(size(col("_sh")) > 0)
      .select(col(idCol) +: keep :+ minHashSignature(col("_sh"), numHashes).as("_mh"): _*)
      .select(col(idCol) +: keep :+
        posexplode(bandSignatures(col("_mh"), numBands, rowsPerBand))
          .as(Seq("band_id", "band_sig")): _*)
  }

  /** Candidate pairs (id_a < id_b) sharing at least one LSH band. */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3): DataFrame = {
    val idx = Dedup.lshIndex(docs, idCol, textCol, shingleN)
    idx.as("x").join(idx.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_sig") === col("y.band_sig") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"))
      .distinct()
  }

  /** MinHash LSH near-dedup: LSH candidates verified with exact n-gram
    * Jaccard ≥ threshold. Output: (doc_a, doc_b, jaccard rounded to 6dp). */
  def nearDupMinHash(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"), shingles(col(textCol), shingleN).as("_sh"))
    withJaccard(
      lshCandidates(docs, idCol, textCol, shingleN)
        .join(sh.withColumnRenamed("_id", "doc_a").withColumnRenamed("_sh", "_sh_a"), "doc_a")
        .join(sh.withColumnRenamed("_id", "doc_b").withColumnRenamed("_sh", "_sh_b"), "doc_b"),
      col("_sh_a"), col("_sh_b"), "jaccard")
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Frequency-weighted 64-bit SimHash packed into one long (native
    * expression; see graft.functions.SimHashExpr for why weighting by term
    * frequency matters). `md5Hash` selects the MD5-derived token hash —
    * reproducible in any SQL engine, so the whole pair set becomes
    * DuckDB-oracle-checkable; default xxhash64 is the faster production
    * family. */
  def simHash(text: Column, md5Hash: Boolean = false): Column =
    graft.functions.NativeExprs.simHash(tokens(text), md5Hash)

  /** Hamming distance between two packed 64-bit signatures — built-in
    * bit_count(xor), fully codegen'd. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Disjoint band slices of a packed 64-bit signature: `numBands` bands of
    * near-equal width covering all 64 bits. Pigeonhole: two signatures within
    * hamming distance `numBands - 1` MUST agree on at least one band. */
  private[operators] def simHashBands(sig: Column, numBands: Int): Seq[Column] = {
    val widths = Array.tabulate(numBands)(k => 64 / numBands + (if (k < 64 % numBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    (0 until numBands).map { k =>
      val mask = if (widths(k) >= 64) -1L else (1L << widths(k)) - 1
      shiftright(sig, offsets(k)).bitwiseAND(lit(mask))
    }
  }

  /** SimHash near-dedup with a RECALL GUARANTEE: the signature is sliced into
    * `maxHamming + 1` disjoint bands, so any pair within hamming distance
    * `maxHamming` shares at least one band (pigeonhole) and is guaranteed to
    * surface as a candidate — no silent misses, unlike fixed 4×16 banding
    * which only covers hamming ≤ 3. Candidates then pass the cheap
    * two-longs hamming filter INSIDE the join (before the pair-dedup
    * shuffle, so non-candidates never cross it) and finally the exact-Jaccard
    * verify. Tradeoff, documented for 100 TB use: wider maxHamming ⇒
    * narrower bands ⇒ coarser buckets; pick maxHamming per corpus noise
    * level (the hamming filter keeps precision; banding only governs
    * candidate volume). */
  def nearDupSimHash(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 12, shingleN: Int = 3,
                     threshold: Double = 0.8, md5Hash: Boolean = false): DataFrame = {
    val numBands = maxHamming + 1
    val sig = docs.select(col(idCol).as("_id"), simHash(col(textCol), md5Hash).as("_sig"))
    val banded = sig.select(col("_id"), col("_sig"),
        posexplode(array(simHashBands(col("_sig"), numBands): _*)))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_sig")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_sig") === col("y.band_sig") &&
        col("x._id") < col("y._id") &&
        hamming64(col("x._sig"), col("y._sig")) <= maxHamming)
      .select(col("x._id").as("doc_a"), col("y._id").as("doc_b"))
      .distinct()
    val sh = docs.select(col(idCol).as("_id"), shingles(col(textCol), shingleN).as("_sh"))
    withJaccard(
      cand
        .join(sh.withColumnRenamed("_id", "doc_a").withColumnRenamed("_sh", "_sh_a"), "doc_a")
        .join(sh.withColumnRenamed("_id", "doc_b").withColumnRenamed("_sh", "_sh_b"), "doc_b"),
      col("_sh_a"), col("_sh_b"), "jaccard")
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Decontamination: training documents that are near-duplicates (n-gram
    * Jaccard >= threshold) of any benchmark document — the train/test
    * overlap scrub every LLM data pipeline runs before training. Candidate
    * generation is the shared MinHash LSH index (train and benchmark are
    * banded together, pairs restricted to cross-split); verification is
    * exact Jaccard. Output: one row per contaminated training doc with its
    * best-matching benchmark doc. */
  def decontaminate(train: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, shingleN: Int = 3,
                    threshold: Double = 0.8): DataFrame = {
    val t = train.select(col(idCol).as("_id"), col(textCol).as("_text"), lit("train").as("_split"))
    val b = benchmark.select(col(idCol).as("_id"), col(textCol).as("_text"), lit("bench").as("_split"))
    val all = t.unionByName(b)
    // `_split` rides THROUGH the index projection (no recovery join back to
    // `all` — round 3's version re-derived shingles+minhash on both sides of
    // that join and again in a third shingle table). The two sides of the
    // band self-join are now canonically identical, so the shuffle exchange
    // is planned once and REUSED.
    val idx = lshIndex(all.withColumnRenamed("_id", idCol).withColumnRenamed("_text", textCol),
      idCol, textCol, shingleN, passthrough = Seq("_split"))
    val cand = idx.as("x").join(idx.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_sig") === col("y.band_sig") &&
        col("x._split") === "train" && col("y._split") === "bench")
      .select(col(s"x.$idCol").as("train_id"), col(s"y.$idCol").as("bench_id"))
      .distinct()
    // Verify shingles come straight off each split's source scan — one
    // shingle computation per side, no union-and-refilter.
    val shT = t.select(col("_id").as("train_id"), shingles(col("_text"), shingleN).as("_sh_t"))
    val shB = b.select(col("_id").as("bench_id"), shingles(col("_text"), shingleN).as("_sh_b"))
    withJaccard(cand.join(shT, "train_id").join(shB, "bench_id"),
      col("_sh_t"), col("_sh_b"), "jaccard")
      .where(col("jaccard") >= threshold)
      .groupBy(col("train_id"))
      .agg(max(struct(col("jaccard"), col("bench_id"))).as("_best"))
      .select(col("train_id"), col("_best.bench_id").as("bench_id"),
        col("_best.jaccard").as("jaccard"))
  }

  /** Exact n-gram decontamination — the GPT-3-style overlap scrub that
    * complements the fuzzy [[decontaminate]]: a training document is
    * contaminated iff ANY of its word n-grams appears verbatim anywhere in
    * the benchmark split. Output: one row per contaminated training doc with
    * the count of its distinct matching n-grams and the lexicographically
    * first one (for audit).
    *
    * Scale design: the benchmark is MBs while train is TBs (the realistic
    * shape), so the bench gram set is the small side everywhere. A Bloom
    * filter built over the distinct benchmark grams is broadcast and applied
    * MAP-SIDE to the exploded train grams, so only the ~fpp false-positive
    * fraction plus true hits ever reach the exact semi-join that confirms
    * membership — the Bloom is a shuffle-pruning device, never a correctness
    * input (false positives are eliminated by the join; Bloom filters have
    * no false negatives). Train-side grams are per-doc distinct before the
    * explode, so a boilerplate-heavy doc doesn't amplify the shuffle. */
  def decontamNgram(train: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 5,
                    bloomFpp: Double = 0.03): DataFrame = {
    def grams(df: DataFrame) = df.select(
      col(idCol).as("train_id"),
      explode(array_distinct(TextAnalysis.ngramsAll(tokens(col(textCol)), n))).as("gram"))
    // The bench gram set is read three times (sizing count, Bloom build,
    // exact semi-join) — materialize it once; it is the bounded small side.
    val benchGrams = grams(benchmark).select(col("gram")).distinct().ckptLocal()
    // Bounded by the benchmark's distinct gram count; ~1.2 bytes/item at 3% fpp.
    val nBench = benchGrams.count()
    val bf = benchGrams.stat.bloomFilter("gram", math.max(nBench, 1L), bloomFpp)
    val bfBc = train.sparkSession.sparkContext.broadcast(bf)
    grams(train)
      // map-side Bloom prune, codegen'd (no UDF in the hottest projection)
      .where(graft.functions.NativeExprs.bloomMightContain(col("gram"), bfBc))
      .join(benchGrams, Seq("gram"), "leftsemi")  // exact confirm (kills FPs)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_hit_grams"), min(col("gram")).as("first_hit"))
  }

  /** Connected components over a near-duplicate pair graph: every document
    * gets `cluster_id` = the smallest doc id reachable through near-dup
    * pairs, and `kept` marks the cluster representative — the step that
    * turns pairwise near-dup OUTPUT into an actual dedup decision (keep one
    * doc per cluster).
    *
    * Min-label propagation: each round, a node's label becomes the minimum
    * of its own and its neighbors' labels. Propagation stops as soon as a
    * round changes nothing (the fixpoint — one stable round implies global
    * convergence since each round is a deterministic function of the label
    * table), so `rounds` is a safety cap on pathological diameters, not a
    * cost: shallow near-dup graphs exit after 2-3 rounds. Both the edge set and the
    * per-round labels are `localCheckpoint`ed: iterative plans otherwise
    * re-derive the whole LSH candidate lineage once per round and the DAG
    * grows without bound — the standard Spark iterative-graph discipline.
    * One shuffle per round, keyed on the 8-byte node id. */
  def nearDupClusters(docs: DataFrame, pairs: DataFrame, idCol: String,
                      rounds: Int = 20): DataFrame = {
    // Integral doc ids propagate as 8-byte longs (the compact shuffle key);
    // every other type is carried NATIVELY — min-label propagation only
    // needs an ordering, and an unconditional cast("long") throws under
    // ANSI mode the moment a corpus keys documents by string (URL, UUID).
    // String-keyed corpora pay string shuffle keys; callers who care can
    // densify ids upstream (corpusShuffle's md5 rank) and join back.
    val integral = docs.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    def asKey(c: Column): Column = if (integral) c.cast("long") else c
    val edges = pairs
      .select(asKey(col("doc_a")).as("src"), asKey(col("doc_b")).as("dst"))
      .unionByName(pairs.select(asKey(col("doc_b")).as("src"),
        asKey(col("doc_a")).as("dst")))
      .ckptLocal()
    var labels = docs.select(asKey(col(idCol)).as("node"))
      .withColumn("label", col("node"))
    var i = 0
    var converged = false
    while (i < rounds && !converged) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("node")).agg(min(col("label")).as("_nl"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("_nl"), col("label"))).as("label"),
          (coalesce(col("_nl"), col("label")) < col("label")).as("_changed"))
        .ckptLocal()
      // Rounds are eager anyway (localCheckpoint); a cheap count on the
      // checkpointed result lets converged graphs skip the remaining rounds
      // (near-dup clusters are shallow — usually 1-2 rounds suffice).
      converged = next.where(col("_changed")).limit(1).isEmpty
      labels = next.drop("_changed")
      i += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"),
      (col("node") === col("label")).as("kept"))
  }

  /** Span-level exact dedup — the "deduplicating training data" substring
    * scrub (Lee et al. 2022's ExactSubstr, at fixed-span granularity; the
    * C4/RefinedWeb boilerplate-removal discipline): documents are cut into
    * NON-OVERLAPPING `spanTokens`-token spans, every span that repeats
    * anywhere in the corpus is dropped from all but its FIRST occurrence
    * (smallest doc id, then earliest position), and surviving spans are
    * reassembled in order. Documents whose every span was dropped vanish
    * (the C4 empty-doc rule). Output:
    * (doc_id, text_dedup, n_kept, n_dropped).
    *
    * Scale: spans explode map-side (non-overlapping, so output tokens =
    * input tokens); first-occurrence selection is ONE shuffle keyed on
    * (xxhash64(span), span) — the 8-byte hash leads the key, the span
    * rides only for exactness under hash collision, the same discipline as
    * [[exactDedupByHash]]; reassembly is one doc-keyed shuffle. Never
    * all-pairs, no suffix array, no driver state — the span granularity is
    * the standard distributed trade against ExactSubstr's suffix-array
    * exactness.
    *
    * MISS CLASS (by construction): only spans that align to the same
    * token-offset grid are compared, so a duplicated passage SHIFTED by a
    * non-multiple of `spanTokens` inside otherwise-distinct documents
    * produces different span cuts and escapes undetected (a suffix array
    * would catch it). This is deliberate — alignment is what makes the
    * operator one bounded shuffle. For position-robust detection of
    * shifted duplication, use the winnowing operators
    * ([[graft.functions.NativeExprs.winnow]] fingerprints /
    * `winnow_overlap`), which select fingerprints by local-minimum hash
    * and are invariant to offset; the pairing is spec-pinned
    * (DedupSimilaritySpec "spanDedup misses shifted duplicates"). */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                spanTokens: Int = 20): DataFrame = {
    val w = tokens(col(textCol))
    val nSpans = ceil(size(col("_w")).cast("double") / spanTokens).cast("int")
    val spans = docs
      .select(col(idCol).as("_id"), w.as("_w"))
      .where(size(col("_w")) > 0)
      .select(col("_id"), nSpans.as("_n_total"),
        posexplode(org.apache.spark.sql.functions.transform(
          sequence(lit(0), nSpans - 1),
          i => concat_ws(" ", slice(col("_w"), i * spanTokens + 1, lit(spanTokens))))))
      .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "_span")
    val firstWin = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("_span")), col("_span"))
      .orderBy(col("_id"), col("_pos"))
    spans
      .withColumn("_rn", row_number().over(firstWin))
      .where(col("_rn") === 1)
      .groupBy(col("_id"))
      .agg(
        concat_ws(" ", org.apache.spark.sql.functions.transform(
          array_sort(collect_list(struct(col("_pos"), col("_span")))),
          s => s.getField("_span"))).as("text_dedup"),
        count(lit(1)).as("n_kept"),
        (max(col("_n_total")) - count(lit(1))).cast("long").as("n_dropped"))
      .select(col("_id").as("doc_id"), col("text_dedup"), col("n_kept"), col("n_dropped"))
  }

  /** Content-defined-chunking span dedup — closes [[spanDedup]]'s
    * documented miss class (duplicated passages SHIFTED off the fixed
    * span grid escape it): chunk boundaries come from a rolling k-gram
    * hash of the content itself (`NativeExprs.cdcChunks`, the
    * FastCDC/rsync discipline on token streams), so an identical passage
    * yields identical interior chunks at ANY offset in any document —
    * those repeats collapse to their first corpus occurrence exactly like
    * spanDedup's grid spans (smallest doc id, then earliest position),
    * and documents reassemble from surviving chunks in order. Expected
    * chunk length ≈ 2^maskBits tokens. Output:
    * (doc_id, text_dedup, n_kept, n_dropped), fully-deduped docs vanish.
    *
    * Scale: identical to [[spanDedup]] — chunks cut map-side in one
    * compiled pass (lossless partition of the token stream, output
    * tokens = input tokens), first-occurrence selection is ONE shuffle
    * keyed (xxhash64(chunk), chunk), reassembly one doc-keyed shuffle;
    * never all-pairs, no suffix array, no driver state. Boundary-context
    * caveat (the CDC trade): the first and last chunks of a duplicated
    * passage include surrounding context, so only passages spanning ≥ 2
    * boundaries (≈ 2·2^maskBits tokens) dedup their interior — shorter
    * shifted repeats remain [[winnow]]-detection territory, spec-pinned.
    *
    * `md5Hash = true` is the cross-engine variant (MD5 token hash →
    * DuckDB-replayable rolling chain, the [[WinnowExpr]] convention) the
    * oracle gates; xxhash64 is the production default. */
  def cdcDedup(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 4, maskBits: Int = 5, md5Hash: Boolean = false): DataFrame = {
    val chunks = cdcExploded(docs, idCol, textCol, k, maskBits, md5Hash)
    val firstWin = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("_chunk")), col("_chunk"))
      .orderBy(col("_id"), col("_pos"))
    reassembleChunks(
      chunks.withColumn("_rn", row_number().over(firstWin)).where(col("_rn") === 1),
      "text_dedup")
  }

  /** Shared CDC prelude: cut each doc's token stream with
    * [[graft.functions.NativeExprs.cdcChunks]] and explode to one row per
    * chunk — (_id, _n_total, _pos, _chunk). Map-side only. */
  private def cdcExploded(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, maskBits: Int, md5Hash: Boolean): DataFrame =
    docs
      .select(col(idCol).as("_id"),
        graft.functions.NativeExprs.cdcChunks(tokens(col(textCol)), k, maskBits, md5Hash)
          .as("_ch"))
      .where(size(col("_ch")) > 0)
      .select(col("_id"), size(col("_ch")).as("_n_total"), posexplode(col("_ch")))
      .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "_chunk")

  /** Shared reassembly: surviving (_id, _pos, _chunk, _n_total) rows back to
    * one doc row in original chunk order — (doc_id, `outCol`, n_kept,
    * n_dropped); docs with zero surviving chunks vanish. One doc-keyed
    * shuffle. */
  private def reassembleChunks(kept: DataFrame, outCol: String): DataFrame =
    kept
      .groupBy(col("_id"))
      .agg(
        concat_ws(" ", org.apache.spark.sql.functions.transform(
          array_sort(collect_list(struct(col("_pos"), col("_chunk")))),
          s => s.getField("_chunk"))).as(outCol),
        count(lit(1)).as("n_kept"),
        (max(col("_n_total")) - count(lit(1))).cast("long").as("n_dropped"))
      .select(col("_id").as("doc_id"), col(outCol), col("n_kept"), col("n_dropped"))

  /** Boilerplate-chunk scrub — the CCNet/RefinedWeb curation discipline
    * that is NOT first-occurrence dedup: a chunk occurring in `maxDf` or
    * more DISTINCT documents is template/boilerplate (headers, footers,
    * navigation, license blurbs at web scale) and is dropped from EVERY
    * document, including the first — no occurrence is canonical. Chunks
    * come from the same content-defined cutting as [[cdcDedup]] (so the
    * same boilerplate passage collapses to identical chunks at any offset
    * in any page); small `maskBits` (default 2, ≈4-token chunks) targets
    * the short repeated-fragment regime boilerplate lives in. Output:
    * (doc_id, text_clean, n_kept, n_dropped); a fully-boilerplate doc
    * vanishes.
    *
    * Scale: document frequency is computed INSIDE one chunk-keyed window
    * shuffle (dense_rank over doc id, then its partition max = exact
    * count-distinct-docs) — the df verdict rides alongside the payload
    * rows, so there is no df-table join-back; reassembly is the one
    * doc-keyed shuffle shared with [[cdcDedup]]. Never all-pairs, no
    * driver state. */
  def boilerplateScrub(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 4, maskBits: Int = 2, maxDf: Int = 3,
                       md5Hash: Boolean = false): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (1 would scrub every chunk), got $maxDf")
    // the 8-byte hash key is MATERIALIZED as a column (not written inline in
    // partitionBy) so both window specs share one attribute-based required
    // distribution — inline expression keys defeat exchange reuse and the
    // plan pays a second corpus-wide shuffle (plan-read on this operator)
    val chunks = cdcExploded(docs, idCol, textCol, k, maskBits, md5Hash)
      .withColumn("_hk", xxhash64(col("_chunk")))
    val byChunkOrdered = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_hk"), col("_chunk"))
      .orderBy(col("_id"))
    val byChunk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_hk"), col("_chunk"))
    reassembleChunks(
      chunks
        .withColumn("_dr", dense_rank().over(byChunkOrdered))
        .withColumn("_df", max(col("_dr")).over(byChunk))
        .where(col("_df") < maxDf),
      "text_clean")
  }

  /** Arbitrary-offset EXACT-SUBSTRING dedup — the true ExactSubstr tier
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better") above [[spanDedup]]'s grid spans and [[cdcDedup]]'s
    * content-defined chunks: ANY duplicated token run of at least `minRun`
    * tokens is detected at ANY offset — no alignment grid, no
    * chunk-boundary requirement. spanDedup misses a shifted passage
    * (different span cuts); cdcDedup misses a repeat too short to span
    * two content-defined boundaries; this operator misses neither
    * (spec-pinned with a planted repeat BOTH siblings provably pass by).
    *
    * Detection is EXACT, not sampled: a token run of length m >= L shared
    * between two positions shares all of its m−L+1 overlapping L-grams,
    * and conversely one duplicated L-gram IS a shared L-token run — so
    * "token sits inside a duplicated run >= L" is EXACTLY "some L-gram
    * covering the token is a non-first occurrence of its content", and no
    * suffix array is needed. Keep-first semantics per gram content
    * (smallest doc id, then earliest position — the [[spanDedup]]
    * convention): the canonical occurrence survives; every later
    * occurrence's covered tokens are cut; documents reassemble from the
    * surviving gaps. Output: (doc_id, text_dedup, n_kept, n_dropped) with
    * counts in TOKENS (the span/cdc outputs count chunks); fully-covered
    * docs vanish.
    *
    * Scale: L-grams materialize map-side as HASHES only — the
    * first-occurrence window shuffles (hash, id, pos) rows, ~20 bytes per
    * corpus token, never gram strings (spanDedup ships span text; this
    * ships less per token despite L× overlap). Non-first rows collapse to
    * per-doc position lists in one doc-keyed aggregate (bounded by
    * duplicated positions only), rejoin the corpus on doc id, and
    * interval-merge + gap reassembly run as compiled higher-order
    * expressions per row — no per-token join, no driver state, never
    * all-pairs. Two corpus shuffles total, the spanDedup discipline.
    *
    * `md5Hash = true` is the cross-engine oracle carrier (md5 gram keys
    * replay verbatim in DuckDB — the [[cdcDedup]] convention); the
    * xxhash64 default shuffles 8-byte keys, accepting the documented
    * ~G²/2^65 collision expectation (the [[sourceOverlap]]
    * `hashKeys = true` adjudication — a collision can at most merge two
    * distinct grams and mis-cut one run). */
  def substrDedup(docs: DataFrame, idCol: String, textCol: String,
                  minRun: Int = 8, md5Hash: Boolean = false): DataFrame = {
    require(minRun >= 2, s"substrDedup needs minRun >= 2, got $minRun")
    val L = minRun
    val base = tokenized(docs, idCol, textCol)
    val grams = gramsOf(base, L, md5Hash)
    val firstWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_h")).orderBy(col("_id"), col("_pos"))
    val dupPos = grams
      .withColumn("_rn", row_number().over(firstWin))
      .where(col("_rn") >= 2)
      .groupBy(col("_id")).agg(sort_array(collect_list(col("_pos"))).as("_ps"))
    cutCovered(base, dupPos, L, "text_dedup")
  }

  /** Cross-corpus EXACT-SUBSTRING decontamination — [[substrDedup]]'s
    * machinery pointed at a BENCHMARK set (the actual Lee et al. 2022
    * deployment: scrub eval overlap out of training data at substring
    * grain): every training-doc token run ≥ `minRun` tokens that appears
    * ANYWHERE in `bench` is cut — from EVERY training occurrence, no
    * canonical keep (the benchmark is the canonical copy; contrast
    * [[substrDedup]]'s first-occurrence survival and [[decontamNgram]]'s
    * doc-level flagging, which reports but does not edit). Training docs
    * reassemble from the surviving gaps. Output:
    * (doc_id, text_clean, n_kept, n_dropped) in tokens; a fully-echoed
    * doc vanishes.
    *
    * Scale: the bench side collapses to its DISTINCT gram-hash set
    * map-side (benchmark-sized — tiny next to the training corpus); the
    * training grams semi-join it on the 8-byte hash (broadcastable at
    * real benchmark sizes, Spark's choice), so the training corpus never
    * shuffles gram strings and never self-joins; the coverage cut is the
    * shared interval-merge + gap reassembly. Carrier semantics
    * (`md5Hash`, collisions) as in [[substrDedup]] — here a collision
    * could cut one extra innocent run, the conservative direction for
    * decontamination. */
  def substrScrub(train: DataFrame, bench: DataFrame, idCol: String,
                  textCol: String, minRun: Int = 8,
                  md5Hash: Boolean = false): DataFrame = {
    require(minRun >= 2, s"substrScrub needs minRun >= 2, got $minRun")
    val L = minRun
    val base = tokenized(train, idCol, textCol)
    val benchGrams = gramsOf(tokenized(bench, idCol, textCol), L, md5Hash)
      .select(col("_h")).distinct()
    val dupPos = gramsOf(base, L, md5Hash)
      .join(benchGrams, "_h") // semi on the gram hash: _h is distinct there
      .groupBy(col("_id")).agg(sort_array(collect_list(col("_pos"))).as("_ps"))
    cutCovered(base, dupPos, L, "text_clean")
  }

  /** (_id, _w) token table shared by the exact-substring operators. */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("_id"), tokens(col(textCol)).as("_w"))
      .where(size(col("_w")) > 0)

  /** Overlapping L-gram keys per position, hashed MAP-SIDE — the window/
    * join shuffles only (hash, id, pos) rows, never gram strings. */
  private def gramsOf(base: DataFrame, L: Int, md5Hash: Boolean): DataFrame = {
    def gramKey(g: Column): Column = if (md5Hash) md5(g) else xxhash64(g)
    base
      .where(size(col("_w")) >= L)
      .select(col("_id"), posexplode(org.apache.spark.sql.functions.transform(
        sequence(lit(0), size(col("_w")) - L),
        i => gramKey(concat_ws(" ", slice(col("_w"), i + 1, lit(L)))))))
      .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "_h")
  }

  /** Shared coverage cut: given per-doc sorted lists of cut-gram start
    * positions (each covering [p, p+L-1]), interval-merge and reassemble
    * every doc from the surviving gaps —
    * (doc_id, `outCol`, n_kept, n_dropped); fully-covered docs vanish. */
  private def cutCovered(base: DataFrame, dupPos: DataFrame, L: Int,
                         outCol: String): DataFrame = {
    // merge the sorted dup-gram positions into disjoint covered intervals
    // [s, e] (0-based token indexes): position p covers [p, p+L-1] and
    // merges when it touches/overlaps the previous interval's end + 1
    val emptyIv = array().cast("array<struct<s:int,e:int>>")
    val mergedIv = aggregate(
      coalesce(col("_ps"), array().cast("array<int>")), emptyIv,
      (acc, p) => {
        // try_element_at: ANSI mode throws on element_at(-1) of an empty
        // accumulator; NULL here just means "no interval yet" -> no merge
        val last = try_element_at(acc, lit(-1))
        val ext = coalesce(p <= last.getField("e") + 1, lit(false))
        when(ext,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(last.getField("s").as("s"), (p + lit(L) - 1).as("e")))))
          .otherwise(concat(acc,
            array(struct(p.as("s"), (p + lit(L) - 1).as("e")))))
      })
    // walk the gaps between covered intervals, slicing surviving token
    // segments in order; the finisher appends the tail past the last cut
    val walk = aggregate(
      col("_iv"),
      struct(lit(0).as("nx"), array().cast("array<string>").as("parts")),
      (acc, r) => struct(
        (r.getField("e") + 1).as("nx"),
        concat(acc.getField("parts"),
          slice(col("_w"), acc.getField("nx") + 1,
            r.getField("s") - acc.getField("nx"))).as("parts")),
      acc => concat(acc.getField("parts"),
        slice(col("_w"), acc.getField("nx") + 1,
          size(col("_w")) - acc.getField("nx"))))
    val dropped = aggregate(col("_iv"), lit(0),
      (a, r) => a + (r.getField("e") - r.getField("s") + 1))
    base.join(dupPos, Seq("_id"), "left")
      .withColumn("_iv", mergedIv)
      .select(col("_id").as("doc_id"),
        concat_ws(" ", walk).as(outCol),
        (size(col("_w")) - dropped).cast("long").as("n_kept"),
        dropped.cast("long").as("n_dropped"))
      .where(col("n_kept") > 0)
  }

  /** Cross-source n-gram overlap matrix — the corpus-curation diagnostic
    * behind mixture design and leakage checks: for every pair of sources,
    * the EXACT Jaccard of their distinct shingle vocabularies (how much of
    * source A's n-gram vocabulary reappears in source B). Corpus-grain
    * companion to the row-grain operators ([[decontamNgram]],
    * [[nearDupMinHash]]): a high off-diagonal value says two feeds are
    * near-copies and the mixture double-counts them. Pairs with zero
    * shared shingles are omitted (inner join). Output:
    * (source_a, source_b, n_a, n_b, n_common, jaccard).
    *
    * Scale: docs explode to (source, shingle) with a map-side partial
    * distinct → a (source, shingle)-keyed shuffle, then the deduped
    * vocabulary table (far smaller than the token stream) re-shuffles on
    * shingle alone for the pair join — whose two sides are the SAME
    * subtree, so that second exchange is planned once and REUSED, and the
    * sizes aggregate re-reads the first. Two full passes of the distinct
    * vocabulary over the wire, one of the raw exploded tokens; per-source
    * sizes ride a broadcast. Output cardinality is #sources² —
    * dimension-sized.
    *
    * `hashKeys = false` (the oracle path) shuffles raw shingle strings —
    * exact and engine-independent (the oracle recomputes them).
    * `hashKeys = true` is the petabyte path: the shingle is replaced by
    * `xxhash64(g)` BEFORE the first distinct, so both shuffles and the
    * pair join carry 8-byte keys instead of n-gram strings — the
    * [[exactDedupByHash]] discipline applied to the vocabulary matrix.
    * A hash collision can merge two distinct shingles (~N²/2^64
    * expectation), perturbing counts by at most that — accepted jitter,
    * spec-pinned identical on the test corpus. */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                    n: Int, hashKeys: Boolean = false): DataFrame = {
    val raw = docs
      .select(col(srcCol).as("source"), explode(shingles(col(textCol), n)).as("g"))
    val sh = (if (hashKeys) raw.select(col("source"), xxhash64(col("g")).as("g"))
              else raw).distinct()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n_grams").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n_grams").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"))
  }

  /** Bottom-k MinHash estimate of every source pair's shingle-set Jaccard —
    * the SKETCH tier above [[sourceOverlap]]'s exact join (Broder's
    * min-wise estimator in its bottom-k form, Cohen/Kaplan): each source
    * keeps only its k SMALLEST distinct shingle md5s, and a pair's Jaccard
    * is estimated as |B_k(A∪B) ∩ A ∩ B| / |B_k(A∪B)| — the fraction of
    * the union's k smallest hashes that both sets contain. Deterministic
    * (no sampling randomness: the hash IS the permutation), mergeable
    * (a union's bottom-k is the bottom-k of concatenated sketches), and
    * k-bounded per source regardless of vocabulary size — the estimator
    * that still runs when [[sourceOverlap]]'s exact gram self-join
    * (full-vocabulary shuffle per pair) cannot.
    *
    * Scale: one gram explode → distinct (the same first shuffle the exact
    * path pays), then the bottom-k selection is a BOUNDED-HEAP AGGREGATE
    * ([[graft.functions.TopKAgg]] with a constant ord, so the id ordering
    * keeps the k SMALLEST hashes): each map task holds at most k hashes
    * per source and only those k-bounded partials cross the shuffle —
    * never a per-source sort of the vocabulary (the round-14 window
    * formulation funneled every source's ENTIRE distinct vocabulary
    * through one task to keep 64 rows — the exact shape this sketch tier
    * exists to avoid). Everything pairwise happens on |sources| k-length
    * arrays (broadcast self-join, array ops in one projection). Unlike
    * the exact operator, EVERY pair is emitted, with n_common_sk = 0 for
    * disjoint sketches.
    * Output: (source_a, source_b, n_common_sk, est_jaccard 6dp). */
  def sourceOverlapSketch(docs: DataFrame, srcCol: String, textCol: String,
                          n: Int, k: Int = 64): DataFrame = {
    require(k >= 1, s"sourceOverlapSketch needs k >= 1; got $k")
    val sh = docs
      .select(col(srcCol).as("source"), explode(shingles(col(textCol), n)).as("g"))
      .select(col("source"), md5(col("g")).as("h"))
      .distinct()
    // TopKPairsAgg keeps the k best (ord desc, id asc) pairs; with ord
    // pinned to 0.0 "best" degenerates to SMALLEST id — a bottom-k heap
    // over the distinct hashes, emitted best-first = ascending, exactly
    // the sort_array(collect_list) the window formulation produced.
    val sk = sh.groupBy(col("source"))
      .agg(graft.functions.TopKAgg.topKPairs(struct(lit(0.0), col("h")), k).as("_tk"))
      .select(col("source"), transform(col("_tk"), e => e("id")).as("_bl"))
    val pairs = sk.select(col("source").as("source_a"), col("_bl").as("_la"))
      .join(broadcast(sk.select(col("source").as("source_b"), col("_bl").as("_lb"))),
        col("source_a") < col("source_b"))
    val u = slice(array_sort(array_union(col("_la"), col("_lb"))), 1, k)
    val num = size(array_intersect(u, array_intersect(col("_la"), col("_lb"))))
    pairs.select(col("source_a"), col("source_b"),
      num.cast("long").as("n_common_sk"),
      round(num.cast("double") / size(u), 6).as("est_jaccard"))
  }

  /** Exact set-similarity self-join — AllPairs/PPJoin prefix filtering
    * (Bayardo et al. WWW'07 "Scaling Up All Pairs Similarity Search";
    * Xiao et al. WWW'08 PPJoin): EVERY pair of documents whose shingle-set
    * Jaccard meets `tNum/tDen`, with a COMPLETENESS GUARANTEE — unlike the
    * probabilistic [[nearDupMinHash]]/[[nearDupSimHash]] candidate
    * generators, no qualifying pair can be missed at any threshold. At
    * J = 0.5 the default 32×4 MinHash banding misses ≈ (1-0.5⁴)³² ≈ 13% of
    * true pairs; this operator is the exact path for such mid-threshold
    * joins (mixture dedup, paraphrase mining). Output:
    * (doc_a, doc_b, jaccard rounded 6dp), doc_a < doc_b.
    *
    * Prefix filter: shingles are globally ordered by ascending document
    * frequency (ties lexicographic); each document emits only its first
    * p = s − ⌈t·s⌉ + 1 shingles as join keys. Completeness: J(A,B) ≥ t
    * implies |A∩B| ≥ t·max(|A|,|B|) (from i ≥ t(|A|+|B|)/(1+t) and the
    * length filter |small| ≥ t·|large|), so if no common shingle sat in
    * A's prefix then all ≥ t·|A| common shingles would have to fit in A's
    * suffix of length ⌈t·|A|⌉ − 1 < t·|A| — contradiction; symmetrically
    * for B. The threshold is a rational tNum/tDen and ⌈t·s⌉ is computed
    * in exact integer arithmetic, so the filter never rounds the wrong way.
    * Candidates additionally pass PPJoin's POSITIONAL filter inside the
    * join (overlap upper-bounded by prefix position — soundness argument
    * at the join site), cutting verify volume several-fold at mid
    * thresholds.
    *
    * Scale (100 TB): never all-pairs — candidates form only inside
    * per-shingle buckets of the PREFIXES, and df-ascending ordering puts
    * the rarest shingles in prefixes, so high-frequency shingles (the
    * buckets that would explode) are exactly the ones excluded. Shuffle
    * inventory: one gram-keyed aggregate for df, one doc-keyed window pass
    * (rank + size in a single window operator), one gram-keyed self-join
    * whose two sides are the SAME subtree (exchange planned once, reused),
    * one pair-distinct, two id-keyed verify joins. Length filter
    * |small|·tDen ≥ |large|·tNum prunes inside the join, before the
    * pair-dedup shuffle.
    *
    * `hashKeys = true` is the petabyte carrier: the shingle array maps
    * ONCE, map-side, to its per-element-xxhash64 array (native compiled
    * loop — `NativeExprs.xxhash64Array`), and everything downstream —
    * df counts, window sort, prefix self-join, and the verify
    * intersection — runs on 8-byte longs; no shingle string ever crosses
    * a shuffle. The OUTPUT is identical to the exact path modulo
    * within-document hash collisions (~s²/2⁶⁴ expectation) — the
    * [[sourceOverlap]] hashed-carrier discipline, spec-pinned identical. */
  def setSimJoin(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, tNum: Int = 1, tDen: Int = 2,
                 hashKeys: Boolean = false): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"threshold must be in (0,1]: $tNum/$tDen")
    // hashKeys replaces the shingle array with its per-element xxhash64
    // array ONCE, map-side (native compiled loop — a transform() lambda
    // would evaluate interpreted), and the whole rest of the operator —
    // df counts, window, prefix self-join, AND the verify intersection —
    // runs on 8-byte longs. Set semantics survive the mapping modulo
    // within-document collisions (~s²/2⁶⁴ per doc).
    val sh0 = docs.select(col(idCol).as("_id"), shingles(col(textCol), shingleN).as("_sh"))
      .where(size(col("_sh")) > 0)
    val sh =
      if (hashKeys)
        sh0.select(col("_id"), graft.functions.NativeExprs.xxhash64Array(col("_sh")).as("_sh"))
      else sh0
    val grams = sh.select(col("_id"), explode(col("_sh")).as("_g"))
    val dfq = grams.groupBy(col("_g")).agg(count(lit(1)).as("_df"))
    // One window operator: rank within the doc by (df asc, gram asc) and the
    // doc's set size over the same sorted partition (full-frame count).
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_df"), col("_g"))
    val full = byDoc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // ⌈t·s⌉ integer-exact: (s·tNum + tDen−1 − mod) / tDen divides evenly.
    val a = col("_s") * tNum + lit(tDen - 1)
    val ceilTs = ((a - pmod(a, lit(tDen))) / tDen).cast("long")
    val pfx = grams.join(dfq, "_g")
      .select(col("_id"), col("_g"),
        row_number().over(byDoc).as("_rn"),
        count(lit(1)).over(full).as("_s"))
      .where(col("_rn") <= col("_s") - ceilTs + 1)
    // Positional filter (the "PP" in PPJoin): shared tokens all sit at or
    // after this match in BOTH sorted sets (the global order is shared),
    // so overlap ≤ 1 + min(sa − rna, sb − rnb). A true pair's FIRST
    // shared token always passes the bound (every other shared token is
    // globally later), so keeping pairs where ANY match passes is sound —
    // and it prunes ~2.5× of the candidates the length filter alone
    // admits at t = 0.5. The required overlap ⌈t/(1+t)·(sa+sb)⌉ compares
    // in integer arithmetic: ubound ≥ ⌈x/(tNum+tDen)⌉ ⟺
    // ubound·(tNum+tDen) ≥ x.
    // Join strategy, measured at sf0.1: AQE broadcasts one side of this
    // self-join below its size threshold, which REBUILDS the pfx lineage
    // on the broadcast side — and that measured FASTER (2.2 s) than
    // forcing shuffle_hash on either or both sides (5.0 s): recomputing a
    // threshold-sized posting list is cheaper than shuffling both sides.
    // Past the broadcast threshold (real corpora) AQE plans a shuffle
    // join whose two identical per-side shuffle stages are deduplicated
    // by runtime stage reuse. Leave the planner unhinted.
    val cand = pfx.as("x").join(pfx.as("y"),
        col("x._g") === col("y._g") && col("x._id") < col("y._id") &&
        least(col("x._s"), col("y._s")) * tDen >=
          greatest(col("x._s"), col("y._s")) * tNum &&
        (lit(1) + least(col("x._s") - col("x._rn"), col("y._s") - col("y._rn"))) *
          (tNum + tDen) >= (col("x._s") + col("y._s")) * tNum)
      .select(col("x._id").as("doc_a"), col("y._id").as("doc_b"))
      .distinct()
    withJaccard(
      cand
        .join(sh.select(col("_id").as("doc_a"), col("_sh").as("_sh_a")), "doc_a")
        .join(sh.select(col("_id").as("doc_b"), col("_sh").as("_sh_b")), "doc_b"),
      col("_sh_a"), col("_sh_b"), "jaccard")
      .where(col("jaccard") >= tNum.toDouble / tDen)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Document-fragment stitching — the reassembly signal for paginated /
    * chunk-split corpora: a pair (A, B) where A's LAST k tokens equal B's
    * FIRST k tokens is evidence B continues A (crawler pagination, PDF
    * page splits, chunked exports), the miss class of every whole-doc and
    * span dedup above. Emits (doc_a, doc_b, boundary) for every ordered
    * stitch candidate; docs shorter than 2k tokens are excluded (their
    * head and tail would overlap).
    *
    * Scale: two map-side k-gram projections, ONE join keyed by the 8-byte
    * xxhash64 of the boundary gram (the house join-key discipline) with
    * the exact string equality verifying on the same row — only k-token
    * boundary grams cross the shuffle, never documents. */
  def fragmentPairs(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    require(k >= 1, s"boundary width must be >= 1: $k")
    val t = docs.select(col(idCol).as("_id"), tokens(col(textCol)).as("_w"))
      .where(size(col("_w")) >= 2 * k)
    val hb = t.select(col("_id"),
      concat_ws(" ", slice(col("_w"), 1, k)).as("_head"),
      concat_ws(" ", slice(col("_w"), -k, k)).as("_tail"))
    hb.select(col("_id").as("doc_a"), col("_tail"),
        xxhash64(col("_tail")).as("_hk"))
      .join(hb.select(col("_id").as("doc_b"), col("_head"),
        xxhash64(col("_head")).as("_hk")), "_hk")
      .where(col("doc_a") =!= col("doc_b") && col("_tail") === col("_head"))
      .select(col("doc_a"), col("doc_b"), col("_tail").as("boundary"))
  }

  /** Canonical selection over near-dup clusters — keep-BEST, not
    * keep-first: given [[nearDupClusters]]' labels and a per-doc quality
    * score, the surviving representative of each cluster is its
    * HIGHEST-SCORING member (ties → smallest id), the production rule —
    * keep the cleanest/most complete copy of a near-dup neighborhood, not
    * the first-crawled one (min-id keep is an accident of crawl order).
    * `scores` is (doc_id, `scoreCol`) — length, a quality-gate composite,
    * a DSIR weight. Output: (doc_id, cluster_id, score, kept).
    *
    * Scale: one id-keyed join of the label table against the score table
    * + ONE cluster-keyed window — both on 8-byte keys; cluster occupancy
    * bounds the window partitions, never the corpus. */
  def keepBestPerCluster(clusters: DataFrame, scores: DataFrame,
                         scoreCol: String = "score"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col(scoreCol).desc, col("doc_id"))
    clusters.drop("kept")
      .join(scores, "doc_id")
      .withColumn("_rn", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col(scoreCol),
        (col("_rn") === 1).as("kept"))
  }

  /** EXACT set-containment join — the ASYMMETRIC miss class of every
    * symmetric-threshold join in this file: a short document embedded in a
    * long one (a quoted passage, a syndicated article inside an
    * aggregator page, a doc re-published with added commentary) has
    * containment C(A,B) = |A∩B| / |A| ≈ 1 while its symmetric Jaccard
    * |A∩B| / |A∪B| ≈ |A|/|B| falls below any useful threshold — so
    * [[setSimJoin]], [[nearDupMinHash]], and [[nearDupSimHash]] all pass
    * it by (spec-pinned). Emits every ORDERED pair (doc_sub, doc_sup)
    * with C(sub→sup) ≥ tNum/tDen (exact copies qualify in both
    * directions), plus the exact 6dp containment.
    *
    * Completeness (AllPairs prefix filter, asymmetric form): shingles are
    * globally df-ascending-ordered; only the SUB side is prefix-cut — if
    * none of A's first s_A − ⌈t·s_A⌉ + 1 shingles hit B, the ≥ ⌈t·s_A⌉
    * shared shingles would have to fit in A's ⌈t·s_A⌉ − 1 suffix slots.
    * The SUP side has no prefix bound (containment does not constrain
    * |B|), so it contributes its FULL postings. Candidates still cannot
    * explode: they form only in buckets of SUB-PREFIX shingles, and
    * df-ascending ordering makes those exactly the rare ones — a
    * high-frequency shingle never leads a prefix. Length
    * (|B|·tDen ≥ |A|·tNum, from |B| ≥ |A∩B|) and the one-sided PPJoin
    * positional bound ((1 + min(s_a − rn_a, s_b − rn_b))·tDen ≥ s_a·tNum)
    * prune inside the join in exact integer arithmetic. Shuffle
    * inventory matches [[setSimJoin]]; the join's two sides share the
    * ranked-postings subtree (its doc-keyed window exchange plans once).
    *
    * `hashKeys = true` is the same 8-byte petabyte carrier as
    * [[setSimJoin]] (identical output modulo ~s²/2⁶⁴ within-doc
    * collisions, spec-pinned identical). */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, tNum: Int = 3, tDen: Int = 5,
                      hashKeys: Boolean = false): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"threshold must be in (0,1]: $tNum/$tDen")
    val sh0 = docs.select(col(idCol).as("_id"), shingles(col(textCol), shingleN).as("_sh"))
      .where(size(col("_sh")) > 0)
    val sh =
      if (hashKeys)
        sh0.select(col("_id"), graft.functions.NativeExprs.xxhash64Array(col("_sh")).as("_sh"))
      else sh0
    val grams = sh.select(col("_id"), explode(col("_sh")).as("_g"))
    val dfq = grams.groupBy(col("_g")).agg(count(lit(1)).as("_df"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_df"), col("_g"))
    val full = byDoc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ranked = grams.join(dfq, "_g")
      .select(col("_id"), col("_g"),
        row_number().over(byDoc).as("_rn"),
        count(lit(1)).over(full).as("_s"))
    val a = col("_s") * tNum + lit(tDen - 1)
    val ceilTs = ((a - pmod(a, lit(tDen))) / tDen).cast("long")
    val pfx = ranked.where(col("_rn") <= col("_s") - ceilTs + 1)
    val cand = pfx.as("x").join(ranked.as("y"),
        col("x._g") === col("y._g") && col("x._id") =!= col("y._id") &&
        col("y._s") * tDen >= col("x._s") * tNum &&
        (lit(1) + least(col("x._s") - col("x._rn"), col("y._s") - col("y._rn"))) *
          tDen >= col("x._s") * tNum)
      .select(col("x._id").as("doc_sub"), col("y._id").as("doc_sup"))
      .distinct()
    cand
      .join(sh.select(col("_id").as("doc_sub"), col("_sh").as("_sh_a")), "doc_sub")
      .join(sh.select(col("_id").as("doc_sup"), col("_sh").as("_sh_b")), "doc_sup")
      .withColumn("containment",
        round(size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("double")
          / size(col("_sh_a")), 6))
      .where(col("containment") >= tNum.toDouble / tDen)
      .select(col("doc_sub"), col("doc_sup"), col("containment"))
  }

  /** Direct n-gram Jaccard over an explicit pair set (pairs: doc_a, doc_b). */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"), shingles(col(textCol), n).as("_sh"))
    withJaccard(
      pairs
        .join(sh.withColumnRenamed("_id", "doc_a").withColumnRenamed("_sh", "_sh_a"), "doc_a")
        .join(sh.withColumnRenamed("_id", "doc_b").withColumnRenamed("_sh", "_sh_b"), "doc_b"),
      col("_sh_a"), col("_sh_b"), "jaccard")
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
