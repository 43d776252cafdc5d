package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.IngestDiscovery
/** Registry part 2 of SparkEntry.queries: the corpus-similarity families —
  * exact/near/semantic dedup tiers, set-similarity and containment joins,
  * PII scrubbing, sampling/mixture primitives, the full ANN/retrieval
  * family, embedding ops, and decontamination. */
private[graft] object QueriesDedupAnn {
  import QueryShared._

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) => Dedup.exactDedupByHash(dedupCorpus(s, d), "doc_id", "text")),
    "dedup_stats" -> ((s, d) => Dedup.dedupStats(dedupCorpus(s, d), "doc_id", "text")),
    // §2.2 row 19b — span-level exact dedup (Lee et al. ExactSubstr at
    // fixed-span granularity): repeated 20-token spans keep only their
    // first corpus occurrence; docs reassembled from surviving spans
    "dedup_span" -> ((s, d) => Dedup.spanDedup(dedupCorpus(s, d), "doc_id", "text", 20)),
    // §2.2 row 19c — CDC span dedup: content-defined chunk boundaries
    // (rolling 4-gram hash, low-5-bit mask => ~32-token chunks), so
    // duplicated passages dedup at ANY offset — spanDedup's documented
    // miss class. MD5 token hash => the rolling chain replays in DuckDB.
    "dedup_cdc" -> ((s, d) =>
      Dedup.cdcDedup(dedupCorpus(s, d), "doc_id", "text", 4, 5, md5Hash = true)),
    // §2.2 row 19e — arbitrary-offset EXACT-SUBSTRING dedup (the true
    // ExactSubstr tier, Lee et al. 2022): ANY duplicated run >= 8 tokens
    // is cut at ANY offset — no span grid (dedup_span's miss), no
    // chunk-boundary requirement (dedup_cdc's miss). Overlapping 8-gram
    // md5 keys, first-occurrence keep, interval-merge gap reassembly;
    // md5 => every cut replays verbatim in DuckDB.
    "dedup_substr" -> ((s, d) =>
      Dedup.substrDedup(dedupCorpus(s, d), "doc_id", "text", SubstrRun,
        md5Hash = true)),
    // §2.2 row 19d — boilerplate scrub: CDC chunks at the ~4-token scale
    // occurring in >= 3 DISTINCT docs are template noise and drop from
    // EVERY doc (no canonical first copy — the CCNet/RefinedWeb
    // discipline, vs dedup_cdc's keep-first). Plain documents: natural
    // cross-doc fragment repeats are exactly the boilerplate signal.
    "boilerplate_scrub" -> ((s, d) =>
      Dedup.boilerplateScrub(Tables.documents(s, d), "doc_id", "text", 4, 2, 3,
        md5Hash = true)),
    // §2.2 row 20 — MinHash LSH near-dedup (banded, verified)
    "neardup_minhash" -> ((s, d) =>
      Dedup.nearDupMinHash(Tables.documents(s, d), "doc_id", "text", 3, 0.8)),
    // §2.2 row 20g — EXACT set-similarity self-join (AllPairs/PPJoin prefix
    // filter): complete at J >= 0.5, a threshold where 32x4 MinHash banding
    // would miss ~13% of true pairs. Never all-pairs: candidates only form
    // inside prefix-shingle buckets (rarest-first global order).
    "setsim_join" -> ((s, d) =>
      Dedup.setSimJoin(Tables.documents(s, d), "doc_id", "text", 3, 1, 2)),
    // §2.2 row 20g, petabyte carrier: xxhash64 shingle keys map-side, so
    // the df aggregate, window pass, and prefix self-join all shuffle
    // 8-byte longs instead of n-gram strings; verify runs on true shingle
    // arrays, so it answers to the exact-string oracle verbatim (the
    // source_overlap_hashed discipline).
    "setsim_join_hashed" -> ((s, d) =>
      Dedup.setSimJoin(Tables.documents(s, d), "doc_id", "text", 3, 1, 2,
        hashKeys = true)),
    // §2.2 row 20h — exact ASYMMETRIC containment join at C >= 0.6: the
    // short-doc-embedded-in-long-doc class every symmetric threshold
    // (Jaccard/minhash/simhash) passes by; sub-side-only prefix filter,
    // sup side contributes full postings
    "containment_join" -> ((s, d) =>
      Dedup.containmentJoin(Tables.documents(s, d), "doc_id", "text", 3, 3, 5)),
    // §2.2 row 20h, petabyte carrier: per-element xxhash64 shingle keys
    // map-side, every downstream shuffle 8-byte (the setsim_join_hashed
    // discipline — identical output, same exact-string oracle)
    "containment_join_hashed" -> ((s, d) =>
      Dedup.containmentJoin(Tables.documents(s, d), "doc_id", "text", 3, 3, 5,
        hashKeys = true)),
    // §2.2 row 20c — near-dup pairs -> dedup DECISION: connected components
    // over the MinHash pair graph, one kept representative per cluster
    "dedup_cluster" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.nearDupClusters(docs,
        Dedup.nearDupMinHash(docs, "doc_id", "text", 3, 0.8), "doc_id")
    }),
    // §2.2 row 21d, keep-BEST canonical selection: the cluster
    // representative is the longest member (most complete copy), not the
    // smallest id — crawl order is not a quality signal
    "dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.keepBestPerCluster(
        Dedup.nearDupClusters(docs,
          Dedup.nearDupMinHash(docs, "doc_id", "text", 3, 0.8), "doc_id"),
        docs.select(col("doc_id"), col("n_chars").cast("long").as("score")))
    }),
    // §2.2 row 22e — document-fragment stitching: A's last-3 == B's
    // first-3 tokens flags B as A's continuation (pagination reassembly)
    "fragment_pairs" -> ((s, d) =>
      Dedup.fragmentPairs(Tables.documents(s, d), "doc_id", "text", 3)),
    // §2.2 row 27b — PII redaction over deterministically dirtied text
    "pii_scrub" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.piiScrub(concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-01"),
          col("doc_id"), lit(" at 192.168.0."), pmod(col("doc_id"), lit(256))))
          .as("scrubbed"))),
    // §2.2 row 27b (r17 tier 2) — Luhn-VALIDATED card detection: plants a
    // valid PAN (%7), a checksum-broken twin (%11), and a spaced valid PAN
    // (%13) so both verdicts + the separator path fire at every SF; the
    // mod-10 HOF arithmetic is integer-exact on both engines
    "pii_luhn" -> ((s, d) =>
      TextAnalysis.luhnCandidates(
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), concat(col("text"),
            when(col("doc_id") % 7 === 0, lit(" card 4111111111111111"))
              .when(col("doc_id") % 11 === 0, lit(" card 4111111111111112"))
              .when(col("doc_id") % 13 === 0, lit(" card 4111 1111 1111 1111 ok"))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text")),
    // §2.2 row 29f — deterministic stratified sampling (corpus mixing)
    "sample_stratified" -> ((s, d) =>
      TextAnalysis.sampleStratified(Tables.documents(s, d), "source", "doc_id", 5)
        .select(col("doc_id"), col("source"))),
    // §2.2 row 29v — budget-constrained mixture allocation: exact integer
    // waterfilling of half the corpus's tokens across sources
    "mix_waterfill" -> ((s, d) =>
      TextAnalysis.waterfillBudget(Tables.documents(s, d), "source", "text", 2L)),
    // §2.2 row 29w — PMI collocation mining (phrase induction for
    // tokenizer/vocab curation): top-50 above-chance bigrams
    "pmi_collocations" -> ((s, d) =>
      TextAnalysis.pmiCollocations(Tables.documents(s, d), "text", 5L, 50)),
    // §2.2 row 29u — deterministic stratified train/val/test assignment
    // (exact per-language ratios via the rank cut, disjoint + exhaustive)
    "split_assign" -> ((s, d) =>
      TextAnalysis.splitAssign(Tables.documents(s, d), "lang", "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))),
    // §2.2 row 29i — weighted mixture sampling (per-language keep
    // probabilities via portable md5-prefix thresholds)
    "sample_weighted" -> ((s, d) =>
      TextAnalysis.sampleWeighted(Tables.documents(s, d), "lang", "doc_id",
        Map("en" -> 1.0, "zh" -> 0.5, "es" -> 0.25, "de" -> 0.1), 0.75)
        .select(col("doc_id"), col("lang"))),
    // §2.2 row 29s — priority sampling (Duffield-Lund-Thorup): k=200
    // weight-proportional WITHOUT replacement by n_chars + the unbiased
    // max(w, tau) subset-sum estimator; priorities use only exact IEEE
    // ops (md5-derived dyadic u, one division) so the doubles
    // hash-match the SQL replay bit-for-bit
    "sample_priority" -> ((s, d) =>
      TextAnalysis.samplePriority(Tables.documents(s, d), "doc_id", "n_chars", 200)),
    // §2.2 row 29o, per-stratum form: an independent DLT sample of 50 per
    // language — partitioned windows only (the large-k/many-strata shape:
    // no k-row funnel through one task)
    "sample_priority_strat" -> ((s, d) =>
      TextAnalysis.samplePriorityPerStratum(Tables.documents(s, d),
        "lang", "doc_id", "n_chars", 50)),
    // §2.2 row 29j — deterministic global corpus shuffle (training order);
    // two-phase bucket rank, no single-partition window
    "corpus_shuffle" -> ((s, d) =>
      TextAnalysis.corpusShuffle(Tables.documents(s, d), "doc_id")),
    // §2.2 row 29g — token-budget sequence packing per stratum
    "seq_pack" -> ((s, d) =>
      TextAnalysis.seqPack(Tables.documents(s, d), "source", "doc_id", "text", 512)),
    // §2.2 row 29h — overlapping context-window chunking (32-token windows,
    // 8-token overlap at this SF so multi-chunk docs exist)
    "chunk_docs" -> ((s, d) =>
      TextAnalysis.chunkTokens(Tables.documents(s, d), "doc_id", "text", 32, 8)),
    // §2.2 row 21 — SimHash near-dedup (rows-only oracle). maxHamming=6:
    // jaccard>=0.8 near-dups land well inside hamming 6 of a weighted 64-bit
    // simhash, and the derived 7x~9-bit banding keeps candidate volume ~30x
    // below the maxHamming=12 setting while preserving the recall guarantee.
    // md5 token hash so DuckDB can reproduce the signatures bit-for-bit:
    // with the pigeonhole banding guarantee the result set is EXACTLY
    // "hamming <= 6 AND jaccard >= 0.8", which the oracle brute-forces.
    "neardup_simhash" -> ((s, d) =>
      Dedup.nearDupSimHash(Tables.documents(s, d), "doc_id", "text", 6, 3, 0.8, md5Hash = true)),
    // §2.2 row 22c — cross-source n-gram overlap matrix (mixture-design /
    // leakage diagnostic): exact bigram-vocabulary Jaccard per source pair
    "source_overlap" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", 2)),
    // §2.2 row 22c, petabyte carrier: xxhash64 replaces the shingle before
    // the first distinct so every shuffle carries 8-byte keys. The output
    // matrix is hash-independent (counts, not hashes) modulo ~N²/2⁻⁶⁴
    // collisions, so it shares source_overlap's oracle SQL verbatim —
    // putting the scale path under the driver's rows+schema+hash gate, not
    // just the ScalaTest parity spec.
    "source_overlap_hashed" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", 2, hashKeys = true)),
    // §2.2 row L22h — bottom-k MinHash overlap sketch (round 14): the
    // k-bounded estimator tier above the exact matrix; deterministic
    // (the md5 hash IS the permutation), fully SQL-replayable.
    "source_overlap_sketch" -> ((s, d) =>
      Dedup.sourceOverlapSketch(Tables.documents(s, d), "source", "text", 2)),
    // §2.2 row 22 — n-gram Jaccard over an explicit pair set
    "ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b")), col("doc_b") === col("doc_a") + 1)
      Dedup.ngramJaccard(pairs, docs, "doc_id", "text", 2)
    }),
    // §2.2 row 23 — exact ANN baseline
    "ann_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.exactTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10)
    }),
    // §2.2 row L24g — binary (sign-bit) Hamming ANN (round 14): 8-byte
    // sign signatures scanned with XOR+popcount, exact-cosine re-rank of
    // the Hamming-top-50 shortlist. Fully replayable: the sign fold, both
    // 32-bit words, the (hamming, id) shortlist order, and the rerank
    // re-derive in SQL bit-for-bit.
    "ann_hamming" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.hammingTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10)
    }),
    // §2.2 row 24 — LSH-bucketed ANN, FULL top-k table row-hash-oracled:
    // numPlanes pinned at 8 (the adaptive default at this SF) so the
    // oracle SQL can inline the fixed-seed hyperplane constants and
    // re-derive every signature; adaptivePlanes itself is spec-covered.
    "ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, numPlanes = 8)
    }),
    // §2.2 row 24 — IVF-bucketed ANN, the 100 TB scale path, FULLY
    // row-hash-oracled INCLUDING TRAINING (round 12): the oracle replays
    // Spark's xxhash64 in HUGEINT limb arithmetic to re-select the
    // hash-ordered sample, re-runs seed selection + the one k-means step
    // with fold-order-pinned means, and derives numCells/nprobe from the
    // corpus count exactly as adaptiveCells/adaptiveProbes do. Runs with
    // broadcastCentroids = true so the large-index carrier — the
    // broadcast-variable kernel that engages past the literal budget — is
    // the code path the driver actually exercises every round; literal-vs-
    // broadcast parity is spec-pinned (DedupSimilaritySpec).
    "ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, ivfCentroids(s, d), broadcastCentroids = true)
    }),
    // §2.2 row 24 — IVF search under a PINNED seeded centroid set, FULLY
    // row-hash-oracled (round 11, the ann_lsh pinned-planes precedent):
    // any fixed centroid set is a valid IVF index, and a seeded one is
    // reproducible in SQL — the oracle re-derives cell assignment (argmax
    // cosine, tie to lowest cell), the nprobe=4 probe set, and the
    // cell-pruned exact top-k. Trained-centroid routing + the broadcast
    // carrier stay exercised by ann_ivf/ann_recall.
    "ann_ivf_fixed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, Similarity.seededCentroids(16, 64), nprobe = 4)
    }),
    // §2.2 row 23c — MMR-diversified retrieval: greedy diversified
    // re-rank of the brute top-20 pool (λ = 0.7, k = 5); 6dp-rounded
    // cosines + decimal λ/μ literals make every greedy step engine-exact
    "mmr_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.mmrTopK(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", k = 5, pool = 20, lambda = 0.7)
    }),
    // §2.2 row 24f — FILTERED vector search: the metadata predicate is
    // pushed into the corpus scan BEFORE the index (pre-filtering), so
    // every cell holds only qualifying rows and top-k can never starve —
    // the composition falls out of the operators taking the corpus as a
    // DataFrame (Catalyst pushes the filter into the parquet scan)
    "ann_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopKWith(e.filter(col("vec_id") < 5),
        e.filter(col("vec_id") >= 5 && col("label").isin(2, 3, 5)),
        "vec_id", "embedding", 10, Similarity.seededCentroids(16, 64), nprobe = 4)
    }),
    // §2.2 row 24c — product-quantization ANN (rows-only oracle; rank-1
    // recall gated by `ann_recall`'s pq_nn column + recall@10 spec): ADC
    // scoring over the m-byte code table, exact re-rank of the shortlist
    "ann_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.pqTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, pqBooks(s, d))
    }),
    // §2.2 row 24c — PQ search under PINNED seeded codebooks, FULLY
    // row-hash-oracled (the ann_lsh/ann_ivf_fixed pinned-artifact
    // precedent, applied to ADC): any fixed codebook set is a valid
    // product quantizer, and a seeded one lets the oracle replay the
    // entire search in SQL — per-subspace argmin-L2 code assignment,
    // per-query LUT dots, the order-pinned ADC sum, reconstructed-norm
    // cosine, top-80 shortlist, exact cosine re-rank. Trained codebooks
    // stay exercised by ann_pq + ann_recall.
    "ann_pq_fixed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.pqTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, Similarity.seededBooks(8, 16, 8))
    }),
    // §2.2 row 24d — IVF-PQ composed (cell-routed ADC + exact re-rank, the
    // billion-vector production shape; rows-only, recall via ann_recall's
    // ivfpq_nn + the recall@10 spec). Shares ann_ivf's centroids and
    // ann_pq's codebooks — indexes train once, every searcher reuses them.
    "ann_ivfpq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, ivfCentroids(s, d), pqBooks(s, d))
    }),
    // §2.2 row 24d — IVF-PQ composed under PINNED centroids AND codebooks
    // (ann_ivf_fixed's seeded cells routing ann_pq_fixed's seeded ADC):
    // the full production search chain — route → ADC-score → shortlist →
    // exact re-rank — row-hash-verified end-to-end by one oracle.
    "ann_ivfpq_fixed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqTopKWith(e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, Similarity.seededCentroids(16, 64),
        Similarity.seededBooks(8, 16, 8), nprobe = 4)
    }),
    // §2.2 row 24e — IVF-PQ with RESIDUAL encoding (faiss by_residual):
    // codes quantize x − centroid(cell); inner-product ADC keeps the LUT
    // per-query (only the scalar <q, c> is per-probe). Rows-only; recall
    // gated by ann_recall's ivfpqr_nn column + the recall@10 spec.
    "ann_ivfpq_res" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqResidualTopKWith(e.filter(col("vec_id") < 5),
        e.filter(col("vec_id") >= 5),
        "vec_id", "embedding", 10, ivfCentroids(s, d), pqResBooks(s, d))
    }),
    // §2.2 row L24h — persisted + incrementally-maintained ANN index
    // (round 16): build the IVF-PQ zone on the %4!=0 training slice under
    // the PINNED artifacts, APPEND the %4==0 slice map-side against the
    // frozen centroids/codebooks (no rebuild — the faiss IndexIVF.add
    // contract), then the staleness gate: exact weighted KS between the
    // frozen training-time cell occupancy and the zone's current one.
    // Zone lands at the fixed per-sf tmpdir root (the pipeline-zone
    // idempotence convention — reruns overwrite).
    "ann_index_stale" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = Similarity.seededCentroids(16, 64)
      val books = Similarity.seededBooks(8, 16, 8)
      val path = zoneRoot("annindex", d)
      AnnIndex.build(e.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        cents, books, path)
      AnnIndex.append(e.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        cents, books, path)
      AnnIndex.staleness(s, path, 0.1)
    }),
    // §2.2 row 19 — embedding-cosine near-dup (banded + multiprobed +
    // verified) over a corpus with planted exact and perturbed duplicates.
    // ORACLE VALIDITY BOUND (ADVICE r18): the oracle is exact brute-force
    // all-pairs at cos >= 0.9, but the library derives adaptive planes
    // (self-join occupancy target 32, knee ~8k vectors) — completeness
    // only holds while the verify corpus sits at/below the 8-bit floor
    // width (~2k vectors at sf0.1; the r18 scale probe measured −0.2%
    // pairs at 10x). A hash mismatch on a LARGER-SF verify run is this
    // documented recall/scale trade, not a regression.
    "neardup_embedding" -> ((s, d) =>
      Similarity.cosineNearDup(embCorpus(s, d), "vec_id", "embedding", 0.9)),
    // §2.2 row 21e — SemDeDup semantic dedup over the planted-duplicate
    // corpus, clustered by the label column (the oracle-checkable variant;
    // the derived-IVF-cell variant is spec-gated): each planted copy has a
    // lower-id source in its cluster at cos >= 0.9, so keep=false marks
    // exactly the plants and the smallest id of each neighborhood survives
    "semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(embCorpus(s, d, withLabel = true),
        "vec_id", "embedding", 0.9, clusterCol = Some(col("label")))),
    // §2.2 row 21e, SCALE-PATH variant (round 18 — from the scale-curve
    // certification): the label-pinned query above grows quadratically
    // within its CONSTANT cluster count by construction; this runs the
    // library DEFAULT — clusters are DERIVED occupancy-bounded IVF cells
    // from the adaptively-sized trained centroids (the ann_ivf trainer),
    // so the whole scale path (hash sample, seeds, one k-means step,
    // every vector's cell assignment, within-cell pairwise keep
    // decisions) is itself hash-oracled via the ivfTrainCtes replay.
    "semantic_dedup_cells" -> ((s, d) =>
      Similarity.semanticDedup(Tables.embeddings(s, d),
        "vec_id", "embedding", 0.9)),
    // §2.2 row 21f — margin-based cross-side pair mining (Artetxe-Schwenk
    // ratio margin, the CCMatrix criterion) between the even- and odd-label
    // halves; planes pinned at 16 (4 bands x 4 bits) for the SQL replay
    "margin_mine" -> ((s, d) =>
      Similarity.marginMine(
        Tables.embeddings(s, d).withColumn("side",
          when(pmod(col("label"), lit(2)) === 0, "a").otherwise("b")),
        "vec_id", "embedding", "side", 4, 1.0, numPlanes = 16)),
    // §2.2 row 24 — ANN recall gate: queries are PERTURBED copies of corpus
    // vectors (component 0 scaled 1.5x, cos ≈ 0.999 to their source), so the
    // true nearest neighbor of each query is known and independently
    // computable by the oracle via brute force. All three approximate paths
    // (LSH, IVF, PQ) must retrieve that neighbor at rank 1 — a genuine recall check on a
    // near-duplicate workload (the regime ANN bucketing is built for),
    // without pinning constants the data can't support.
    "ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id"),
          concat(array(element_at(col("embedding"), 1) * 1.5),
            slice(col("embedding"), 2, 63)).as("embedding"))
      def rank1(df: DataFrame, alias: String) =
        df.filter(col("rank") === 1).select(col("query_id"), col("neighbor_id").as(alias))
      // The five search paths are mutually INDEPENDENT (each scans the
      // corpus its own way and emits a 5-row rank-1 table) but a single
      // joined plan executed them one AQE stage chain at a time. Overlap
      // them from driver threads (guide §2.6 — FIFO backfill): each path
      // materializes via an eager query-scoped checkpoint on its own
      // thread, and the final join assembles five 5-row checkpointed
      // tables. Results are identical — the join inputs are the same
      // tables, just evaluated concurrently.
      val paths: Seq[() => DataFrame] = Seq(
        () => rank1(Similarity.lshTopK(q, e, "vec_id", "embedding", 1), "lsh_nn"),
        () => rank1(Similarity.ivfTopKWith(q, e, "vec_id", "embedding", 1,
          ivfCentroids(s, d)), "ivf_nn"),
        () => rank1(Similarity.pqTopKWith(q, e, "vec_id", "embedding", 1,
          pqBooks(s, d)), "pq_nn"),
        () => rank1(Similarity.ivfPqTopKWith(q, e, "vec_id", "embedding", 1,
          ivfCentroids(s, d), pqBooks(s, d)), "ivfpq_nn"),
        () => rank1(Similarity.ivfPqResidualTopKWith(q, e, "vec_id", "embedding", 1,
          ivfCentroids(s, d), pqResBooks(s, d)), "ivfpqr_nn"))
      val done = new Array[DataFrame](paths.size)
      Pipeline.inParallel(paths.zipWithIndex.map { case (f, i) =>
        () => done(i) = graft.Ckpt.local(f())
      }: _*)
      done.reduce((a, b) => a.join(b, Seq("query_id")))
    }),
    // §2.2 row 25 — embedding column ops
    "embedding_norms" -> ((s, d) => Similarity.norms(Tables.embeddings(s, d), "vec_id", "embedding")),
    // §2.2 row 25f — Matryoshka truncation readiness: retained_d IS
    // cos(full, d-prefix truncation); decides the coarse-stage width of a
    // prefix-search retrieval funnel
    "embedding_matryoshka" -> ((s, d) =>
      Similarity.matryoshkaNorms(Tables.embeddings(s, d), "vec_id",
        "embedding", Seq(16, 32))),
    // §2.2 row L25g — Johnson–Lindenstrauss random projection (round 14):
    // data-oblivious 64→16 reduction under pinned seed-19 Gaussian planes;
    // order-pinned folds + the exact dyadic 1/√16 scale make every rounded
    // component and the norm-ratio diagnostic replay in SQL. Emitted
    // EXPLODED to (vec_id, component_idx, value, norm_ratio) scalar rows —
    // the embedding_pca precedent: a raw array<double> column crashes the
    // driver comparator's pandas sort (r14 red row).
    "embedding_jl" -> ((s, d) =>
      Similarity.jlProject(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("norm_ratio"),
          posexplode(col("proj")).as(Seq("component_idx", "value")))
        .select(col("vec_id"), col("component_idx"), col("value"),
          col("norm_ratio"))),
    // §2.2 row 25e — component covariance matrix (PCA/whitening input):
    // the explode carrier (pure built-in Catalyst, independently planned),
    // kept under the oracle as the cross-check of the default aggregate
    "embedding_cov" -> ((s, d) =>
      Similarity.embeddingCovariance(Tables.embeddings(s, d), "embedding",
        highDim = false)),
    // §2.2 row 25e — the DEFAULT covariance carrier (fixed-buffer
    // CovOuterSumAgg, no explode — the only high-dim-safe shape, and
    // ~2.3× faster already at dim 64) under the SAME oracle — the paths
    // are bit-identical by construction, so the driver gates both
    "embedding_cov_hd" -> ((s, d) =>
      Similarity.embeddingCovariance(Tables.embeddings(s, d), "embedding")),
    // §2.2 row 25e — top-4 PCA eigensolve, ORACLED (round 18 — VERDICT
    // r17 #1): engine-exact integer fixed-point power iteration with
    // Hotelling deflation over the 6dp covariance (the event_pagerank
    // unrolled-CTE discipline; see Similarity.pcaPowerFixed's scaladoc
    // for the flat-spectrum adjudication). The float Jacobi path
    // (pcaTrain/pcaProject — whitened projections) remains library
    // surface, spec-gated as before.
    "embedding_pca" -> ((s, d) =>
      Similarity.pcaPowerFixed(Tables.embeddings(s, d), "embedding", k = 4)),
    // §2.2 row 26 — multimodal binary plumbing (metadata path)
    "multimodal_meta" -> ((s, d) =>
      Multimodal.metaTable(Multimodal.packBinary(Tables.documents(s, d), "doc_id", "text"))),
    // §2.2 row 26b — frame sampling over opaque payloads (every 4th 64-byte
    // frame; the sizes verify the slicing arithmetic end-to-end)
    "frame_sample" -> ((s, d) =>
      Multimodal.frameSample(
        Multimodal.packBinary(Tables.documents(s, d), "doc_id", "text"), 64, 4)
        .select(col("doc_id"), col("n_frames"), col("frame_idx"), col("frame_bytes"))),
    // §2.2 row 25b — int8 embedding quantization (absmax), scalar digest
    "embedding_quantize" -> ((s, d) => {
      val v = col("embedding").cast("array<double>")
      val q = Similarity.quantizeInt8(v)
      Tables.embeddings(s, d).select(col("vec_id"),
        get(q, lit(0)).as("q0"),
        array_min(q).as("q_min"), array_max(q).as("q_max"),
        aggregate(q, lit(0L), (acc, x) => acc + x).as("q_sum"))
    }),
    // §2.2 row 20b — decontamination: train/benchmark near-dup scrub
    "decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", 3, 0.8)
    }),
    // §2.2 row 20c — exact n-gram decontamination (Bloom-pruned, exact-
    // verified): train docs sharing ANY verbatim 5-gram with the benchmark
    "decontam_ngram" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontamNgram(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", 5)
    }),
    // §2.2 row L19e (cross-corpus form, round 16) — ExactSubstr as
    // DECONTAMINATION, the Lee et al. deployment: every training run
    // >= 8 tokens appearing ANYWHERE in the benchmark half is CUT from
    // every training occurrence (no canonical keep — the benchmark is
    // canonical; decontam_ngram flags docs, this EDITS them), docs
    // reassembled from the surviving gaps.
    "decontam_substr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.substrScrub(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", SubstrRun, md5Hash = true)
    }),
    // §2.2 row L29cc — first-class ORACLED Bloom filter (round 16): the
    // membership sketch decontaminate() uses opaquely, rebuilt here as a
    // verifiable word table (k=4 salted-md5 positions over 8192 bits,
    // 32-bit lanes in BIGINT words so bit_or/shift probes are sign-free
    // in both engines); build over the benchmark slice, probe the whole
    // corpus, report the Bloom verdict beside the exact membership join —
    // no false negatives by construction, realized FPR measurable.
    "bloom_decontam" -> ((s, d) =>
      BloomSketch.bloomDiagnostics(Tables.documents(s, d), "doc_id", "text",
        col("doc_id") % 97 === 0)),
    // §2.2 row 27d — unigram LM quality score (mean per-token log-prob
    // under the corpus's own unigram distribution — the perplexity gate)
  )
}
