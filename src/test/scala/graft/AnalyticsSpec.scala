package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, F2Sketch, Quality, QuantileSketch, Similarity, TextAnalysis}

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("F2 sketch: linear merge law, exact diagnostics, estimate bound, grouped == per-slice") {
    // planted key stream: key i repeated i times, i = 1..40 →
    // n = Σi = 820, keys = 40, F2 = Σi² = 22140
    val a = (1 to 40).flatMap(i => Seq.fill(i)(i.toLong)).toDF("k")
    val d = F2Sketch.f2Diagnostics(a, Nil, "k")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(d._1 == 820L && d._2 == 40L && d._3 == 22140L)
    // deterministic md5 signs → this is a regression pin, not a flake:
    // the median-of-means concentrates within ~sd = sqrt(2/16)·F2
    assert(math.abs(d._5) <= 0.75, s"rel_err ${d._5} outside the MoM bound")
    // MERGE LAW: the sketch is linear — cells(A ⊎ B) == cell-wise sum
    // (the CMS discipline; a streaming fold would need the _bid guard)
    val b = (30 to 60).flatMap(i => Seq.fill(3)(i.toLong)).toDF("k")
    def cells(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      F2Sketch.f2Cells(df, Nil, "k").as[(Int, Long)].collect().toMap
    val ca = cells(a); val cb = cells(b)
    assert(cells(a.unionByName(b)) ==
      (ca.keySet ++ cb.keySet).map(e => e -> (ca.getOrElse(e, 0L) + cb.getOrElse(e, 0L))).toMap,
      "F2 cells must merge by EXACT estimator-wise sum")
    // null keys contribute nothing (a null never joins)
    val withNull = a.unionByName(Seq(Option.empty[Long]).toDF("k"))
    assert(cells(withNull) == ca)
    // grouped form == the scalar sketch of each slice
    val g = a.withColumn("g", (col("k") % 2).cast("string"))
    val grouped = F2Sketch.f2Diagnostics(g, Seq("g"), "k")
      .as[(String, Long, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    for (gv <- Seq("0", "1")) {
      val solo = F2Sketch.f2Diagnostics(g.where(col("g") === gv), Nil, "k")
        .as[(Long, Long, Long, Double, Double)].collect().head
      assert(grouped(gv) == ((gv, solo._1, solo._2, solo._3, solo._4, solo._5)))
    }
    // INNER PRODUCT: E[Z_a·Z_b] = Σ f_a·f_b = |A ⋈ B| — planted fan-out:
    // key i appears i times in A and 2 times in B for i in 20..40
    // → join size = Σ 2i = 1260; n_a includes keys B lacks
    val jb = (20 to 40).flatMap(i => Seq.fill(2)(i.toLong)).toDF("k")
    val j = F2Sketch.joinSizeDiagnostics(a, "k", jb, "k")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(j._1 == 820L && j._2 == 42L && j._3 == (20 to 40).map(2L * _).sum)
    assert(math.abs(j._5) <= 0.9, s"join-size rel_err ${j._5} outside the MoM bound")
    // disjoint key sets → exact 0 with a NULL rel_err (no 0/0 ratio)
    val disj = (1001 to 1010).map(_.toLong).toDF("k")
    val z = F2Sketch.joinSizeDiagnostics(a, "k", disj, "k")
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    assert(z._3 == 0L && z._5.isEmpty)
  }

  test("quantile sketch: exact merge law, content idempotence, n<=k exactness, rank error") {
    // disjoint shards with unique row keys (the md5-coin source)
    val a = (1 to 3000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val b = (3001 to 5000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val k = 64
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    // MERGE LAW: merge(sketch(A), sketch(B)) == sketch(A ∪ B) EXACTLY —
    // survivor set AND re-chosen level (no approximation enters at merge)
    val sa = QuantileSketch.sketch(a, "id", "v", k)
    val sb = QuantileSketch.sketch(b, "id", "v", k)
    val direct = QuantileSketch.sketch(a.unionByName(b), "id", "v", k)
    assert(rows(QuantileSketch.merge(sa, sb, k)) == rows(direct),
      "merge law must reproduce the direct sketch row-for-row")
    val m = direct.count()
    assert(m >= 1 && m <= k, s"survivor count $m must be in [1, k]")
    // content idempotence (the streaming replay law): re-merging a sketch
    // with itself changes nothing — the HLL side of the guard family
    assert(rows(QuantileSketch.merge(sa, sa, k)) == rows(sa))
    // n <= k: the sketch holds EVERYTHING (level 0) and estimates are
    // exact order statistics at rank (p·n + 999) div 1000
    val small = (1 to 40).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val est = QuantileSketch.estimates(small, None, "id", "v", 64, Seq(250, 500, 1000))
      .as[(Int, Double, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(est(250) == ((250, 10.0, 0, 40L, 40L)))
    assert(est(500)._2 == 20.0 && est(1000)._2 == 40.0)
    // sample rank error on uniform 1..5000: a ~200-survivor uniform
    // sample's quantile sits within a few n/√m of the true one (hashes
    // are fixed, so this is a deterministic regression pin, not a flake)
    val q = QuantileSketch.estimates(a.unionByName(b), None, "id", "v", 256,
      Seq(100, 500, 900)).as[(Int, Double, Int, Long, Long)].collect()
    q.foreach { case (p, e, _, ms, n) =>
      assert(math.abs(e - p * n / 1000.0) <= 4.0 * n / math.sqrt(ms.toDouble),
        s"p=$p est=$e n=$n m=$ms drifted beyond the sample rank-error bound")
    }
    // grouped form: every group row equals the scalar estimate on its slice
    val g = a.withColumn("g", (col("id") % 3).cast("string"))
    val grouped = QuantileSketch.estimates(g, Some("g"), "id", "v", 64, Seq(500))
      .as[(String, Int, Double, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    for (gv <- Seq("0", "1", "2")) {
      val solo = QuantileSketch.estimates(g.where(col("g") === gv), None, "id", "v",
        64, Seq(500)).as[(Int, Double, Int, Long, Long)].collect().head
      assert(grouped(gv) == ((gv, solo._1, solo._2, solo._3, solo._4, solo._5)),
        s"group $gv must equal the scalar sketch of its slice")
    }
  }

  test("ewmaDaily: exact dyadic-weight replay, gap fill, start renormalization, spike flag") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // day 3 is missing -> gap-fills to 0; day 4 jumps 32 (a spike vs the
    // low EWMA baseline)
    val events = Seq(("k", ts(1), 8.0), ("k", ts(2), 4.0), ("k", ts(4), 32.0))
      .toDF("key", "ts", "v")
    val out = Analytics.ewmaDaily(events, col("key"), col("ts"), col("v"), 16)
      .orderBy(col("day"))
      .as[(String, java.sql.Date, Long, Double, Double, Boolean)].collect()
    // local replay of the SAME left-associated term chain (k ascending,
    // exact power-of-two weights, renormalized by present weights)
    val series = Seq(8.0, 4.0, 0.0, 32.0)
    def ref(t: Int): Double = {
      var num = 0.0; var den = 0.0
      for (k <- 0 until 16) {
        val w = math.pow(2.0, -(k + 1))
        if (t - k >= 0) { num = num + series(t - k) * w; den = den + w }
        else { num = num + 0.0; den = den + 0.0 }
      }
      num / den
    }
    assert(out.length == 4)
    assert(out.map(_._4).toSeq == series, "gap day must fill to 0")
    for (t <- 0 until 4)
      assert(out(t)._5 == ref(t), s"day $t ewma ${out(t)._5} != local ${ref(t)}")
    // day 1 has no baseline -> false; day 4: 32 > 4x the low EWMA -> spike
    assert(out.map(_._6).toSeq == Seq(false, false, false, true))
    assert(out.map(_._3).toSeq == Seq(1L, 1L, 0L, 1L))
  }

  test("topNPerGroup keeps n rows per group with deterministic ties") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 30.0),
      ("b", 5, 1.0)).toDF("g", "id", "v")
    val out = Analytics.topNPerGroup(df, Seq(col("g")), col("v"), col("id"), 2)
      .select("g", "id", "rn").as[(String, Int, Int)].collect().sortBy(r => (r._1, r._3))
    assert(out.toSeq == Seq(("a", 2, 1), ("a", 4, 2), ("b", 5, 1))) // tie 30.0: id 2 before 4
  }

  test("rollupAgg emits leaf, subtotal, and grand-total rows") {
    val df = Seq((2024, "A", 1.0), (2024, "B", 2.0), (2025, "A", 4.0)).toDF("y", "s", "v")
    val out = Analytics.rollupAgg(df, Seq(col("y"), col("s")),
      Seq(sum(col("v")).as("t"))).as[(Option[Int], Option[String], Double)].collect()
    val m = out.map { case (y, s, t) => (y, s) -> t }.toMap
    assert(m((Some(2024), Some("A"))) == 1.0)
    assert(m((Some(2024), None)) == 3.0)    // year subtotal
    assert(m((None, None)) == 7.0)          // grand total
    assert(out.length == 3 + 2 + 1)
  }

  test("madOutliers: lower-median exact replay; robust where z-score is masked") {
    // group A: one wild value among a tight spread — med = 10 (rank 3/5),
    // devs sorted [0,1,1,2,90] -> mad = 1 -> only the 100 flags (90 > 3*1)
    // group B: even n, values [1,2,3,100] -> lower median = rank 2 = 2,
    // devs sorted [0,1,1,98] -> mad = 1 -> only the 100 flags
    // group C: majority-constant -> mad = 0 -> NO outliers by convention
    val df = Seq(
      ("A", 1L, 8L), ("A", 2L, 9L), ("A", 3L, 10L), ("A", 4L, 11L), ("A", 5L, 100L),
      ("B", 6L, 1L), ("B", 7L, 2L), ("B", 8L, 3L), ("B", 9L, 100L),
      ("C", 10L, 5L), ("C", 11L, 5L), ("C", 12L, 5L), ("C", 13L, 999L)
    ).toDF("g", "id", "v")
    val out = Analytics.madOutliers(df, "g", "id", "v", 3.0)
      .as[(Long, String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(5L, 9L), s"got ${out.keySet}")
    assert(out(5L) == ((5L, "A", 100.0, 10.0, 1.0, 90.0)))
    assert(out(9L) == ((9L, "B", 100.0, 2.0, 1.0, 98.0)))
    // the same A-group outlier is MASKED by the classic z-score at 2.0:
    // the 100 inflates the stddev it is judged against
    val z = Analytics.zScoreAnomalies(df.where(col("g") === "A"),
      Seq(col("g")), col("v"), 2.0)
      .where(col("is_anomaly")).count()
    assert(z == 0L, "z-score should mask the outlier that MAD catches")
  }

  test("ksTwoSample: exact D on planted counts, zero for identical samples") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("v")
    val b = Seq(1L, 2L, 2L, 4L).toDF("v")
    // union points 1,2,3,4: cumA/4 = .5,.75,1,1; cumB/4 = .25,.75,.75,1
    // -> D = 0.25 at v=1 (and v=3)
    val out = Analytics.ksTwoSample(a, b, "v")
      .as[(Long, Long, Long, Double)].collect().head
    assert(out == ((4L, 4L, 4L, 0.25)))
    val self = Analytics.ksTwoSample(a, a, "v")
      .as[(Long, Long, Long, Double)].collect().head
    assert(self == ((4L, 4L, 3L, 0.0)), "identical samples must read D = 0")
    // empty-side guard (ADVICE r15): an empty input reads d_stat NULL —
    // the ksBySource empty-complement semantics — never 0/0 = NaN
    val empty = Seq.empty[Long].toDF("v")
    val oneEmpty = Analytics.ksTwoSample(a, empty, "v")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(oneEmpty == ((4L, 0L, 3L, None)),
      s"empty side must read d_stat NULL, got $oneEmpty")
  }

  test("ksBinned: equals the exact statistic when bins out-resolve the values") {
    // distinct values {1,2,3,4} map to distinct bins at nBins=1024 (the
    // grid out-resolves the data), so binned D == exact D, including the
    // clamp landing max(v) in bin nBins-1 rather than off the end
    val a = Seq(1.0, 1.0, 2.0, 3.0).toDF("v")
    val b = Seq(1.0, 2.0, 2.0, 4.0).toDF("v")
    val exact = Analytics.ksTwoSample(a, b, "v")
      .as[(Long, Long, Long, Double)].collect().head
    val binned = Analytics.ksBinned(a, b, "v", 1024)
      .as[(Long, Long, Long, Double)].collect().head
    assert(binned._1 == 4L && binned._2 == 4L && binned._4 == exact._4,
      s"out-resolving bins must preserve D exactly: $binned vs $exact")
    // identical samples read zero through the binning too
    val self = Analytics.ksBinned(a, a, "v", 16)
      .as[(Long, Long, Long, Double)].collect().head
    assert(self._4 == 0.0)
    // degenerate constant metric: hi = lo maps everything to bin 0
    val c = Seq(5.0, 5.0).toDF("v")
    val const = Analytics.ksBinned(c, c, "v", 8)
      .as[(Long, Long, Long, Double)].collect().head
    assert(const == ((2L, 2L, 1L, 0.0)))
    // grouped form: when bins out-resolve the values, every source row
    // equals the UNBINNED per-source statistic on the raw metric
    val g = Seq(("A", 1.5), ("A", 1.5), ("A", 2.25), ("A", 3.0),
      ("B", 1.5), ("B", 2.25), ("B", 2.25), ("B", 4.125),
      ("C", 1.5), ("C", 4.125)).toDF("source", "v")
    val binnedBy = Analytics.ksBinnedBySource(g, "source", "v", 4096)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val rawBy = Analytics.ksBySource(g, "source", "v")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(binnedBy == rawBy,
      s"out-resolving grouped bins must preserve every per-source D:\n$binnedBy\n$rawBy")
  }

  test("ksBySource: every row equals the two-sample statistic on (slice, rest)") {
    val df = Seq(
      ("A", 1L), ("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 5L), ("B", 6L), ("B", 6L),
      ("C", 1L), ("C", 5L)).toDF("source", "v")
    val got = Analytics.ksBySource(df, "source", "v")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("A", "B", "C"))
    for (src <- got.keySet) {
      val two = Analytics.ksTwoSample(
        df.where(col("source") === src), df.where(col("source") =!= src), "v")
        .as[(Long, Long, Long, Double)].collect().head
      assert(got(src) == ((src, two._1, two._2, Some(two._4))),
        s"per-source $src != two-sample on (slice, rest)")
    }
    // a source holding the whole corpus: empty complement reads NULL, not NaN
    val solo = Analytics.ksBySource(Seq(("A", 1L), ("A", 2L)).toDF("source", "v"),
      "source", "v").as[(String, Long, Long, Option[Double])].collect().head
    assert(solo == (("A", 2L, 0L, None)))
  }

  test("asOfPrior attaches the most recent strictly-prior matching value") {
    val df = Seq((1, 10, "x"), (1, 20, "err"), (1, 30, "x"), (1, 40, "err"), (1, 50, "x"))
      .toDF("u", "t", "kind")
    val out = Analytics.asOfPrior(df, col("u"), col("t"), col("t"),
      col("kind") === "err", col("t"), "last_err")
      .select("t", "last_err").as[(Int, Option[Int])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((10, None), (20, None), (30, Some(20)), (40, Some(20)), (50, Some(40))))
  }

  test("saltedSumCount equals a direct groupBy") {
    val df = Seq(("k", 1.0), ("k", 2.0), ("k", 3.0), ("j", 4.0)).toDF("key", "v")
      .withColumn("src", monotonically_increasing_id())
    val salted = Analytics.saltedSumCount(df, col("key"), "key", col("v"), col("src"), 4)
      .as[(String, Long, Double)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(salted == Map("k" -> ((3L, 6.0)), "j" -> ((1L, 4.0))))
  }

  test("saltedJoin equals the plain equi-join and joins on (key, salt)") {
    val probe = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (9, "e"))
      .toDF("k", "pv") // key 1 is "hot"; key 9 has no build match
    val build = Seq((1, "X"), (2, "Y"), (3, "Z")).toDF("k", "bv")
    val out = Analytics.saltedJoin(probe, build, "k", col("pv"), 4)
    val expected = probe.join(build, Seq("k"))
    assert(out.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
    assert(out.columns.toSeq == expected.columns.toSeq)
    // the physical JOIN NODE really keys on (k, _salt): inspect the join
    // operators' key lists, not the whole plan string (the withColumn
    // projections would contain "_salt" even if the join key regressed)
    val joins = out.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty, "no join in the plan")
    joins.foreach { j =>
      val cond = j.condition.map(_.toString).getOrElse("")
      assert(cond.contains("_salt"), s"join does not key on the salt: $cond")
    }
  }

  test("zScoreAnomalies flags outliers per group, null score for constant groups") {
    val df = Seq(
      ("a", 10.0), ("a", 10.0), ("a", 10.0), ("a", 10.0), ("a", 100.0), // outlier
      ("b", 5.0), ("b", 5.0)                                            // constant group
    ).toDF("g", "v")
    val out = Analytics.zScoreAnomalies(df, Seq(col("g")), col("v"), 1.5)
      .select(col("g"), col("v"), col("is_anomaly")).as[(String, Double, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.count(_._3) == 1 && out.find(_._3).get._2 == 100.0)
    assert(out.filter(_._1 == "b").forall(!_._3)) // stddev 0 -> never anomalous
  }

  test("cosineNearDup finds planted duplicate vectors via buckets") {
    val rnd = new java.util.Random(5L)
    def vec() = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    val rows = Seq((1L, v0), (2L, v0.map(x => x * 2.0f))) ++ // parallel -> cos 1.0
      (3L to 40L).map(i => (i, vec()))
    val out = Similarity.cosineNearDup(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 0.99, numPlanes = 8, dim = 16, numBands = 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)))
    assert(out.forall { case (a, b) => a < b })
  }

  test("decontaminate reports only cross-split near-duplicates, best match each") {
    val base = "the quick brown fox jumps over the lazy dog again and again today " * 3
    val train = Seq((2L, base), (4L, "completely unrelated training text about spark shuffles"))
      .toDF("doc_id", "text")
    val bench = Seq((1L, base.replace("lazy", "sleepy")),
      (3L, "a benchmark document with entirely different content altogether"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.decontaminate(train, bench, "doc_id", "text", 3, 0.5)
      .select("train_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 1L))) // only the planted overlap, only train->bench
  }

  test("vocabulary ranks token frequencies deterministically") {
    val docs = Seq((1L, "a a b c"), (2L, "a b")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.vocabulary(docs, "text", 2)
      .select("token", "n", "rank").as[(String, Long, Int)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(("a", 3L, 1), ("b", 2L, 2)))
  }

  test("profileColumns computes nulls/distinct/min/max in one pass") {
    val df = Seq((Some(1), "x"), (None, "y"), (Some(3), "x")).toDF("a", "b")
    val out = Quality.profileColumns(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Option[String], Option[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 3L, 1L, 2L, Some("1"), Some("3"))))
    assert(out("b") == (("b", 3L, 0L, 2L, Some("x"), Some("y"))))
  }

  test("topKPairs aggregate matches window top-n, including cross-partition merges") {
    val df = spark.range(0, 500).toDF("id")
      .select(col("id"), (col("id") % 5).cast("string").as("g"),
        ((col("id") * 2654435761L) % 1000).cast("double").as("ord"))
      .repartition(7) // force partial buffers to merge
    val viaAgg = df.groupBy(col("g"))
      .agg(graft.functions.TopKAgg.topKPairs(
        struct(col("ord").as("ord"), col("id").as("id")), 4).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.id").as("id"), (col("pos") + 1).as("rn"))
      .as[(String, Long, Int)].collect().toSet
    val viaWindow = Analytics.topNPerGroup(df, Seq(col("g")), col("ord"), col("id"), 4)
      .select(col("g"), col("id"), col("rn"))
      .as[(String, Long, Int)].collect().toSet
    assert(viaAgg == viaWindow && viaAgg.size == 20)
  }

  test("topKPairs carries string ids through partial/final serde without a cast") {
    // String ids exercise the generic-id path: UTF8String copy-on-update
    // (scan buffers are reused) and the UnsafeRow shuffle serde.
    val df = spark.range(0, 500).toDF("n")
      .select((col("n") % 5).cast("string").as("g"),
        concat(lit("doc-"), format_string("%03d", col("n"))).as("id"),
        ((col("n") * 2654435761L) % 1000).cast("double").as("ord"))
      .repartition(7)
    val viaAgg = df.groupBy(col("g"))
      .agg(graft.functions.TopKAgg.topKPairs(
        struct(col("ord").as("ord"), col("id").as("id")), 4).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.id").as("id"), (col("pos") + 1).as("rn"))
      .as[(String, String, Int)].collect().toSet
    val viaWindow = Analytics.topNPerGroup(df, Seq(col("g")), col("ord"), col("id"), 4)
      .select(col("g"), col("id"), col("rn"))
      .as[(String, String, Int)].collect().toSet
    assert(viaAgg == viaWindow && viaAgg.size == 20)
    assert(viaAgg.forall(_._2.startsWith("doc-")))
  }

  test("rangeJoin matches points into containing intervals via buckets") {
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val points = Seq((1L, 1L, ts(5)), (2L, 1L, ts(95)), (3L, 2L, ts(5)), (4L, 1L, ts(300)))
      .toDF("pid", "k", "t")
    val intervals = Seq((10L, 1L, ts(0), ts(60)), (11L, 1L, ts(90), ts(120)), (12L, 2L, ts(0), ts(60)))
      .toDF("iid", "k", "s", "e")
    val out = Analytics.rangeJoin(points, intervals,
      col("t"), col("s"), col("e"), Seq("k"), 1800L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 11L), (3L, 12L))) // pid 4 matches nothing
  }

  test("approx_count_distinct stays within its error bound vs exact") {
    val df = spark.range(0, 20000).select((col("id") % 5000).as("u"))
    val (exact, approx) = df.agg(
      countDistinct(col("u")), approx_count_distinct(col("u"), 0.02))
      .as[(Long, Long)].head()
    assert(exact == 5000L)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("sigProbes expands a signature to its hamming<=2 ball, original first") {
    val out = Seq("0101").toDF("s")
      .select(graft.functions.NativeExprs.sigProbes(col("s"), 2).as("p"))
      .as[Seq[String]].head()
    assert(out.length == 1 + 4 + 6)
    assert(out.head == "0101")
    assert(out.toSet.size == out.length)                       // all distinct
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(out.tail.take(4).forall(ham(_, "0101") == 1))       // singles, then
    assert(out.drop(5).forall(ham(_, "0101") == 2))            // doubles
    assert(out.slice(1, 5) == Seq("1101", "0001", "0111", "0100")) // position order
  }

  test("misraGries sketch never misses an item above n/(capacity+1), across partitions") {
    // 12000 items: "hot" 50%, "warm" 25%, the rest singletons. capacity 8
    // bounds every buffer; guarantee: freq > n/9 items must survive merges.
    val df = spark.range(0, 12000).repartition(16)
      .select(when(col("id") % 2 === 0, "hot")
        .when(col("id") % 4 === 1, "warm")
        .otherwise(concat(lit("rare"), col("id"))).as("token"))
    val cands = df.agg(graft.functions.MisraGriesAgg.misraGries(col("token"), 8).as("c"))
      .select(explode(col("c")).as("x")).select("x.item", "x.est")
      .as[(String, Long)].collect().toMap
    assert(cands.contains("hot") && cands.contains("warm"))
    assert(cands.size <= 8)
    // estimates never overcount and undercount by at most n/(capacity+1)
    assert(cands("hot") <= 6000L && cands("hot") >= 6000L - 12000L / 9)
    assert(cands("warm") <= 3000L && cands("warm") >= 3000L - 12000L / 9)
  }

  test("heavyHitters returns the exact above-threshold set with exact counts") {
    // 1000 docs of one token each: "hot" 400, "warm" 300, rare singletons.
    // phi=1/4 → only "hot" and "warm" (strictly above 250).
    val docs = spark.range(0, 1000)
      .select(when(col("id") < 400, "hot")
        .when(col("id") < 700, "warm")
        .otherwise(concat(lit("rare"), col("id"))).as("text"))
      .repartition(8)
    val out = TextAnalysis.heavyHitters(docs, "text", 4, 16)
      .select("token", "n_occ").as[(String, Long)].collect().toMap
    assert(out == Map("hot" -> 400L, "warm" -> 300L))
  }

  test("cubeAgg emits every grouping-set combination") {
    val df = Seq((2024, "A", 1.0), (2024, "B", 2.0), (2025, "A", 4.0)).toDF("y", "s", "v")
    val out = Analytics.cubeAgg(df, Seq(col("y"), col("s")),
      Seq(sum(col("v")).as("t"))).as[(Option[Int], Option[String], Double)].collect()
    val m = out.map { case (y, s, t) => (y, s) -> t }.toMap
    assert(m((Some(2024), Some("A"))) == 1.0)
    assert(m((Some(2024), None)) == 3.0)     // year subtotal
    assert(m((None, Some("A"))) == 5.0)      // segment subtotal — rollup lacks this
    assert(m((None, None)) == 7.0)
    assert(out.length == 3 + 2 + 2 + 1)      // leaves + years + segments + grand
  }

  test("winsorize clamps values into the group's quantile range") {
    // group a: values 0..100; p10 = 10, p90 = 90 (exact interpolated)
    val df = (0 to 100).map(v => ("a", v, v.toDouble)).toDF("g", "id", "v")
    val out = Analytics.winsorize(df, Seq(col("g")), col("v"), 0.1, 0.9, "w")
      .select("id", "w").as[(Int, Double)].collect().toMap
    assert(out(0) == 10.0 && out(5) == 10.0)   // clamped up
    assert(out(50) == 50.0)                    // untouched
    assert(out(95) == 90.0 && out(100) == 90.0) // clamped down
    assert(out.size == 101)
  }

  test("gapFill densifies per-key day spans and forward-fills") {
    val df = Seq(
      (1, "2024-01-01", 5.0), (1, "2024-01-04", 7.0),
      (2, "2024-02-10", 1.0)).toDF("k", "d", "v")
      .select(col("k"), to_date(col("d")).as("d"), col("v"))
    val out = Analytics.gapFill(df, col("k"), col("d"), sum(col("v")))
      .select(col("key"), col("day").cast("string"), col("filled_value"), col("is_filled"))
      .as[(Int, String, Double, Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1, "2024-01-01", 5.0, false),
      (1, "2024-01-02", 5.0, true),   // gap: carries Jan 1 value
      (1, "2024-01-03", 5.0, true),
      (1, "2024-01-04", 7.0, false),
      (2, "2024-02-10", 1.0, false))) // single-day span: no spine beyond it
  }

  test("skewProfile surfaces the heaviest keys with share and skew ratio") {
    // key "hot": 6 rows, "b": 2, "c": 1, "d": 1 → total 10, 4 keys, mean 2.5
    val df = (Seq.fill(6)("hot") ++ Seq("b", "b", "c", "d")).toDF("k")
    val out = Analytics.skewProfile(df, col("k"), "k", 2)
      .select("k", "n_rows", "share", "skew_vs_mean")
      .as[(String, Long, Double, Double)].collect()
    assert(out.toSeq == Seq(("hot", 6L, 0.6, 2.4), ("b", 2L, 0.2, 0.8)))
  }

  test("profileDrift flags distinct, null-rate, and range changes per column") {
    val before = Seq((1, Some("x"), 10.0), (2, Some("y"), 20.0), (3, Some("y"), 30.0))
      .toDF("id", "s", "v")
    val after = Seq((1, Some("x"), 10.0), (2, None, 20.0), (3, Some("y"), 99.0))
      .toDF("id", "s", "v")
    val out = Quality.profileDrift(before, after, Seq("id", "s", "v"))
      .select("col_name", "distinct_delta", "null_permille_delta", "range_changed", "drifted")
      .as[(String, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("id") == ("id", 0L, 0L, false, false))      // unchanged
    assert(out("s") == ("s", 0L, 333L, false, true))       // a third of rows went null
    assert(out("v") == ("v", 0L, 0L, true, true))          // 30 -> 99 moves max
  }

  test("fkRule flags non-null keys missing from the dimension") {
    val facts = Seq((1, Some(10)), (2, Some(99)), (3, None)).toDF("id", "fk")
    val dim = Seq(10, 20).toDF("k")
    val (add, rule) = Quality.fkRule("fk_dim", col("fk"), dim, "k")
    val ann = Quality.annotate(add(facts), Seq(rule))
    val errs = ann.select("id", Quality.ErrorsCol).as[(Int, String)].collect().toMap
    assert(errs == Map(1 -> "", 2 -> "fk_dim", 3 -> "")) // null FK is not an FK violation
  }

  test("winsorize approx path tracks the exact clamp within sketch tolerance") {
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    def clampMap(approx: Boolean) =
      Analytics.winsorize(df, Seq(col("g")), col("v"), 0.05, 0.95, "w", approx = approx)
        .select("v", "w").as[(Double, Double)].collect().toMap
    val exact = clampMap(approx = false)
    val sketch = clampMap(approx = true)
    assert(exact.size == 1000 && sketch.size == 1000)
    // interior rows are never clamped by either path; clamped edges agree
    // within one value-grid step at accuracy 10000 on 1000 rows
    exact.foreach { case (v, e) => assert(math.abs(e - sketch(v)) <= 1.0, s"v=$v") }
    assert(exact(1.0) > 1.0 && exact(1000.0) < 1000.0) // clamping actually occurred
  }

  test("percentiles: approx path tracks exact within sketch tolerance; 0/1 stay exact") {
    val df = ((1 to 1000).map(i => ("a", i.toDouble)) ++
      (1 to 100).map(i => ("b", i * 10.0))).toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p_min" -> 0.0, "p_max" -> 1.0)
    def run(approx: Boolean) =
      Analytics.percentiles(df, col("g"), col("v"), ps, approx = approx)
        .as[(String, Double, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
    val exact = run(approx = false)
    val sketch = run(approx = true)
    assert(exact("a") == (("a", 500.5, 900.1, 1.0, 1000.0)))
    assert(exact("b") == (("b", 505.0, 901.0, 10.0, 1000.0)))
    for (g <- Seq("a", "b")) {
      // GK sketch retains true extremes: min/max identical to exact
      assert(sketch(g)._4 == exact(g)._4 && sketch(g)._5 == exact(g)._5)
      // interior quantiles within one value-grid step at accuracy 10000
      assert(math.abs(sketch(g)._2 - exact(g)._2) <= 10.0, s"p50 $g")
      assert(math.abs(sketch(g)._3 - exact(g)._3) <= 10.0, s"p90 $g")
    }
  }

  test("ntileBuckets is row-identical to the window-ntile formulation") {
    // strata with: heavy value duplication, n not divisible by k, n < k,
    // and a single-row stratum — every branch of the NTILE arithmetic
    val rows = (1 to 47).map(i => ("big", i % 5, i)) ++ // 47 rows, 5 distinct values
      (1 to 7).map(i => ("small", 1, i)) ++ // n < k with ALL values equal
      Seq(("one", 9, 1))
    val df = rows.toDF("s", "v", "id")
    val got = Analytics.ntileBuckets(df, col("s"), col("v"), col("id"), 10)
      .select("stratum", "id", "bucket").as[(String, Int, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s")).orderBy(col("v"), col("id"))
    val want = df.withColumn("bucket", ntile(10).over(w))
      .select("s", "id", "bucket").as[(String, Int, Int)].collect().toSet
    assert(got == want)
    // and no single-partition window: every WindowExec in the physical plan
    // must carry partition expressions (the window-ntile formulation this
    // replaces would also pass here — its window partitions on stratum —
    // but ntileBuckets' windows partition FINER: (stratum, value) for the
    // corpus-sized pass, stratum only on the value-distinct count table)
    // sparkPlan, not executedPlan: AQE wraps the latter before execution
    val winExecs = Analytics.ntileBuckets(df, col("s"), col("v"), col("id"), 10)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(winExecs.nonEmpty && winExecs.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window in ntileBuckets plan")
  }

  test("ntileBuckets parity holds on randomized skew/shape draws") {
    // 5 fixed-seed draws over hostile shapes: k in {1, 3, 10}, value
    // domains from 1 distinct value to near-unique, stratum counts 1-4 —
    // each compared row-for-row against Spark's own window ntile
    val rnd = new java.util.Random(99L)
    for (trial <- 1 to 5) {
      val k = Seq(1, 3, 10)(rnd.nextInt(3))
      val nStrata = 1 + rnd.nextInt(4)
      val nVals = 1 + rnd.nextInt(20)
      val n = 1 + rnd.nextInt(120)
      val rows = (1 to n).map(i =>
        (s"s${rnd.nextInt(nStrata)}", rnd.nextInt(nVals), i))
      val df = rows.toDF("s", "v", "id")
      val got = Analytics.ntileBuckets(df, col("s"), col("v"), col("id"), k)
        .select("stratum", "id", "bucket").as[(String, Int, Int)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s")).orderBy(col("v"), col("id"))
      val want = df.withColumn("bucket", ntile(k).over(w))
        .select("s", "id", "bucket").as[(String, Int, Int)].collect().toSet
      assert(got == want, s"trial $trial (k=$k strata=$nStrata vals=$nVals n=$n)")
    }
  }

  test("movingAvg gap-fills the day spine and keeps DECIMAL sums through the frame") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // key "a": days 1, 2, 4 (day 3 absent -> spine fills it with 0)
    val df = Seq(("a", ts(1), 10.5), ("a", ts(2), 2.25), ("a", ts(2), 1.0),
      ("a", ts(4), 4.0), ("b", ts(1), 7.0))
      .toDF("k", "ts", "v")
    val out = Analytics.movingAvg(df, col("k"), col("ts"), col("v"), 3)
      .select("key", "day", "n_events", "day_value", "win_sum", "win_avg")
      .as[(String, java.sql.Date, Long, Double, Double, Double)]
      .collect().sortBy(r => (r._1, r._2.toString))
    val a = out.filter(_._1 == "a")
    assert(a.map(_._2.toString).toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(a.map(_._3).toSeq == Seq(1L, 2L, 0L, 1L)) // day 3 filled, 0 events
    assert(a.map(_._4).toSeq == Seq(10.5, 3.25, 0.0, 4.0))
    // 3-day trailing sums over the SPINE (gap day participates as 0)
    assert(a.map(_._5).toSeq == Seq(10.5, 13.75, 13.75, 7.25))
    // first days divide by the actual frame size, not windowDays
    assert(a.map(_._6).toSeq == Seq(10.5, 6.875, 4.583333, 2.416667))
    assert(out.count(_._1 == "b") == 1)
  }

  test("winsorize keeps rows with a NULL group key (null-safe bounds join)") {
    val df = Seq((Option("a"), 1.0), (Option("a"), 100.0),
      (Option.empty[String], 5.0), (Option.empty[String], 50.0)).toDF("g", "v")
    val out = Analytics.winsorize(df, Seq(col("g")), col("v"), 0.0, 1.0, "w")
    // the inner-equality join this replaces silently DROPPED the null-key rows
    assert(out.count() == 4)
    // [0,1] quantile range = [min,max] per group -> no value actually clamps,
    // including within the null group (whose bounds row matches via <=>)
    assert(out.select("v", "w").as[(Double, Double)].collect().forall { case (v, w) => v == w })
  }

  test("fd_sketch: FD spectral bound, merge-tree robustness, small-n exactness, top direction") {
    import graft.functions.FdSketchAgg
    val d = 24; val n = 400; val ell = 8
    // deterministic planted matrix: strong rank-2 structure + bounded
    // hash noise (no RNG — rerun-identical)
    def row(i: Int): Array[Double] = {
      val u = Array.tabulate(d)(j => if (j < d / 2) 1.0 else -1.0)
      val w = Array.tabulate(d)(j => if (j % 2 == 0) 1.0 else 0.5)
      val a = 6.0 * math.cos(i * 0.1); val b = 3.0 * math.sin(i * 0.17)
      Array.tabulate(d)(j => a * u(j) + b * w(j) +
        (((i * 31 + j * 17) % 97) / 97.0 - 0.5))
    }
    val rows = (0 until n).map(row)
    def gram(m: Seq[Array[Double]]): Array[Array[Double]] = {
      val g = Array.ofDim[Double](d, d)
      for (r <- m; i <- 0 until d; j <- 0 until d) g(i)(j) += r(i) * r(j)
      g
    }
    val ata = gram(rows)
    val frob2 = rows.map(r => r.map(x => x * x).sum).sum
    def sketchOf(parts: Int): Seq[Array[Double]] = {
      val df = rows.zipWithIndex.map { case (r, i) => (i.toLong, r.toSeq) }
        .toDF("id", "v").repartition(parts)
      df.agg(FdSketchAgg.fdSketch(col("v"), ell).as("sk"))
        .select(explode(col("sk")).as("s")).select(col("s.row"))
        .as[Seq[Double]].collect().map(_.toArray).toSeq
    }
    // spectral-norm estimate of the symmetric deficit via power iteration
    def specNorm(m: Array[Array[Double]]): Double = {
      var v = Array.tabulate(d)(j => 1.0 / math.sqrt(d.toDouble))
      var lam = 0.0
      for (_ <- 0 until 60) {
        val nv = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
        val nn = math.sqrt(nv.map(x => x * x).sum)
        lam = nn
        if (nn > 0) v = nv.map(_ / nn)
      }
      lam
    }
    for (parts <- Seq(1, 8)) {
      val b = sketchOf(parts)
      assert(b.size <= ell, s"sketch must hold <= ell rows, got ${b.size}")
      val btb = gram(b)
      val deficit = Array.tabulate(d, d)((i, j) => ata(i)(j) - btb(i)(j))
      // FD guarantee: ||AtA - BtB||_2 <= ||A||F^2 / ell, any merge tree
      val bound = frob2 / ell
      val nrm = specNorm(deficit)
      assert(nrm <= bound * 1.0001,
        s"FD bound violated at $parts partitions: $nrm > $bound")
      // one-sidedness: AtA - BtB is PSD (probe a few fixed directions)
      for (seed <- 1 to 5) {
        val x = Array.tabulate(d)(j => ((seed * 13 + j * 7) % 11) - 5.0)
        val q = (0 until d).flatMap(i => (0 until d).map(j => x(i) * deficit(i)(j) * x(j))).sum
        assert(q >= -1e-6 * frob2, s"deficit not PSD at $parts parts: $q")
      }
      // the planted dominant direction survives in the sketch's span:
      // its energy under BtB is within the additive bound of AtA's
      val u = Array.tabulate(d)(j => (if (j < d / 2) 1.0 else -1.0) / math.sqrt(d.toDouble))
      val eA = (0 until d).flatMap(i => (0 until d).map(j => u(i) * ata(i)(j) * u(j))).sum
      val eB = (0 until d).flatMap(i => (0 until d).map(j => u(i) * btb(i)(j) * u(j))).sum
      assert(eB >= eA - bound * 1.0001 && eB <= eA + 1e-6 * frob2,
        s"dominant-direction energy outside the FD window: $eB vs $eA (bound $bound)")
    }
    // n <= ell: nothing ever shrinks — BtB == AtA exactly (same doubles)
    val small = rows.take(ell)
    val smallDf = small.zipWithIndex.map { case (r, i) => (i.toLong, r.toSeq) }
      .toDF("id", "v")
    val bSmall = smallDf.agg(FdSketchAgg.fdSketch(col("v"), ell).as("sk"))
      .select(explode(col("sk")).as("s")).select(col("s.row"))
      .as[Seq[Double]].collect().map(_.toArray).toSeq
    assert(bSmall.size == ell)
    assert(bSmall.map(_.toSeq).toSet == small.map(_.toSeq).toSet,
      "n <= ell sketch must be the input rows themselves, bit-exact")
    // Jacobi sanity on a known matrix: [[2,1],[1,2]] -> eigenvalues 3, 1
    val (lam, u2) = FdSketchAgg.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(lam(0) - 3.0) < 1e-12 && math.abs(lam(1) - 1.0) < 1e-12)
    assert(math.abs(math.abs(u2(0)(0)) - math.sqrt(0.5)) < 1e-9)
  }

  test("mannWhitneyU: exact tie-corrected replay, symmetry, degenerate NULL") {
    // a = [1,1,2,3], b = [2,3,3,5]: midranks 1.5/3.5/6/8 →
    // R_a = 2·1.5 + 3.5 + 6 = 12.5, U = 12.5 − 10 = 2.5
    val a = Seq(1L, 1L, 2L, 3L).toDF("v")
    val b = Seq(2L, 3L, 3L, 5L).toDF("v")
    val out = Analytics.mannWhitneyU(a, b, "v")
      .as[(Long, Long, Double, Double)].collect().head
    assert(out._1 == 4L && out._2 == 4L && out._3 == 2.5)
    // local replay of the exact z chain (t³−t over t = [2,2,3,1] → 36)
    val (naD, nbD, nD, t3D) = (4.0, 4.0, 8.0, 36.0)
    val sig2 = naD * nbD / 12.0 * ((nD + 1.0) - t3D / (nD * (nD - 1.0)))
    val z = BigDecimal((2.5 - naD * nbD / 2.0) / math.sqrt(sig2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._4 == z, s"z ${out._4} != local replay $z")
    // identical samples: U = n²/2, z = 0
    val self = Analytics.mannWhitneyU(a, a, "v")
      .as[(Long, Long, Double, Double)].collect().head
    assert(self._3 == 8.0 && self._4 == 0.0)
    // a fully shifted sample: every a-rank below every b-rank → U = 0
    val shifted = Analytics.mannWhitneyU(a,
      Seq(11L, 12L, 13L, 14L).toDF("v"), "v")
      .as[(Long, Long, Double, Double)].collect().head
    assert(shifted._3 == 0.0 && shifted._4 < -2.0)
    // all-tied inputs: σ = 0 → z NULL (no test), not NaN/∞
    val c = Seq(7L, 7L).toDF("v")
    val tied = Analytics.mannWhitneyU(c, c, "v")
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(tied._4.isEmpty, s"all-tied z must be NULL, got $tied")
  }

  test("psiBinned: exact smoothed replay, zero on identical sides, grouped == per-slice") {
    // nBins=2 on [0,1]: a = 3×bin0 + 1×bin1, b = 1×bin0 + 3×bin1
    val a = Seq(0.0, 0.0, 0.0, 1.0).toDF("v")
    val b = Seq(0.0, 1.0, 1.0, 1.0).toDF("v")
    val out = Analytics.psiBinned(a, b, "v", 2)
      .as[(Long, Long, Long, Double)].collect().head
    def r6(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // local replay: p/q Jeffreys-smoothed over k=2 occupied bins,
    // ln 6dp-DECIMAL, (p−q)·ln rounded to 6dp, exact sum
    def term(ca: Long, cb: Long): BigDecimal = {
      val p = (ca + 0.5) / (4.0 + 2.0 * 0.5)
      val q = (cb + 0.5) / (4.0 + 2.0 * 0.5)
      r6((p - q) * r6(math.log(p / q)).toDouble)
    }
    val psi = (term(3, 1) + term(1, 3)).toDouble
    assert(out == ((4L, 4L, 2L, psi)), s"got $out, replay psi $psi")
    assert(psi > 0.6, "strongly swapped masses must read a drifting PSI")
    // identical sides: p == q per bin → every term ln(1) = 0 → psi = 0
    val self = Analytics.psiBinned(a, a, "v", 16)
      .as[(Long, Long, Long, Double)].collect().head
    assert(self._4 == 0.0)
    // degenerate constant metric: one bin, psi = 0
    val c = Seq(5.0, 5.0).toDF("v")
    val const = Analytics.psiBinned(c, c, "v", 8)
      .as[(Long, Long, Long, Double)].collect().head
    assert(const == ((2L, 2L, 1L, 0.0)))
    // grouped form == the two-sample on (slice, rest): the slice/rest
    // union IS the corpus, so the global grid and occupied-bin support
    // coincide exactly
    val g = Seq(("A", 1.5), ("A", 1.5), ("A", 2.25), ("A", 3.0),
      ("B", 1.5), ("B", 2.25), ("B", 2.25), ("B", 4.125),
      ("C", 1.5), ("C", 4.125)).toDF("source", "v")
    val grouped = Analytics.psiBinnedBySource(g, "source", "v", 64)
      .as[(String, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    for (src <- grouped.keySet) {
      val two = Analytics.psiBinned(
        g.where(col("source") === src), g.where(col("source") =!= src), "v", 64)
        .as[(Long, Long, Long, Double)].collect().head
      assert(grouped(src) == ((src, two._1, two._2, Some(two._4))),
        s"per-source $src != two-sample on (slice, rest)")
    }
    // a source holding the whole corpus reads psi NULL
    val solo = Analytics.psiBinnedBySource(
      Seq(("A", 1.0), ("A", 2.0)).toDF("source", "v"), "source", "v", 8)
      .as[(String, Long, Long, Option[Double])].collect().head
    assert(solo == (("A", 2L, 0L, None)))
  }

  test("acfDaily: exact replay on an alternating series, gap fill, constant NULL") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // alternating [1,3,1,3,1,3] → mean 2, d = ±1: r1 = −5/6, r2 = 4/6
    val ev = (0 until 6).map(i => (ts(i), if (i % 2 == 0) 1.0 else 3.0))
      .toDF("ts", "value")
    val out = Analytics.acfDaily(ev, col("ts"), col("value"), 3)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1, 5L), (2, 4L), (3, 3L)))
    assert(out.map(_._3).toSeq == Seq(
      BigDecimal(-5.0 / 6.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(4.0 / 6.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      -0.5))
    // a calendar gap participates as a 0-valued day: days {0,2} of value 3
    // → spine [3,0,3], mean 2, d = [1,−2,1] → r1 = (−2−2)/6 = −0.666667
    val gap = Seq((ts(0), 3.0), (ts(2), 3.0)).toDF("ts", "value")
    val g = Analytics.acfDaily(gap, col("ts"), col("value"), 1)
      .as[(Int, Long, Double)].collect().head
    assert(g == ((1, 2L, -0.666667)))
    // constant series: zero variance → acf NULL, never 0/0
    val const = (0 until 4).map(i => (ts(i), 2.0)).toDF("ts", "value")
    val cr = Analytics.acfDaily(const, col("ts"), col("value"), 2)
      .as[(Int, Long, Option[Double])].collect()
    assert(cr.length == 2 && cr.forall(_._3.isEmpty))
  }

  test("ljungBoxDaily: exact Q from the acf spec's alternating series; constant NULL") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // the acfDaily spec's series: n = 6, r = [round(-5/6), round(4/6), -0.5]
    // with n_pairs = [5, 4, 3]; Q = 6*8 * Σ round(r_k²/n_pairs, 6)
    val ev = (0 until 6).map(i => (ts(i), if (i % 2 == 0) 1.0 else 3.0))
      .toDF("ts", "value")
    val out = Analytics.ljungBoxDaily(ev, col("ts"), col("value"), 3, 7.814728)
      .as[(Long, Int, Double, Boolean)].collect().head
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r1 = r6(-5.0 / 6.0); val r2 = r6(4.0 / 6.0); val r3 = -0.5
    val terms = BigDecimal(r6(r1 * r1 / 5)) + BigDecimal(r6(r2 * r2 / 4)) +
      BigDecimal(r6(r3 * r3 / 3))
    val expectedQ = 6.0 * (6.0 + 2.0) * terms.toDouble
    assert(out._1 == 6L && out._2 == 3)
    assert(out._3 == expectedQ, s"q ${out._3} != local replay $expectedQ")
    // this strongly alternating series must reject whiteness at χ²(.95, 3)
    assert(out._4)
    // constant series: no ACF to test → Q NULL, reject NULL (not false)
    val const = (0 until 4).map(i => (ts(i), 2.0)).toDF("ts", "value")
    val cr = Analytics.ljungBoxDaily(const, col("ts"), col("value"), 2, 5.991465)
      .select("q_stat", "reject").as[(Option[Double], Option[Boolean])].collect().head
    assert(cr._1.isEmpty && cr._2.isEmpty)
  }

  test("runsTestDaily: exact lower-median split, runs count, z replay; degenerates NULL") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-02-${day + 1}%02d 12:00:00")
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // [1,2,9,10]: lower median 2 (dropped) -> signed [0,1,1]: n=3, n1=2,
    // n2=1, R=2; mu = 4/3+1, sig2 = 4(4-3)/(9*2)
    val ev = Seq(1.0, 2.0, 9.0, 10.0).zipWithIndex
      .map { case (v, i) => (ts(i), v) }.toDF("ts", "value")
    val out = Analytics.runsTestDaily(ev, col("ts"), col("value"))
      .as[(Long, Long, Long, Long, Double)].collect().head
    val mu = 4.0 / 3.0 + 1.0
    val sig2 = 4.0 * (4.0 - 3.0) / (3.0 * 3.0 * 2.0)
    assert(out == ((3L, 2L, 1L, 2L, r6((2.0 - mu) / math.sqrt(sig2)))))
    // clustered series [1,2,3,10,11,12]: median 3 dropped -> 00 111,
    // R=2 of n=5 -> strongly negative z (too FEW runs)
    val clus = Seq(1.0, 2.0, 3.0, 10.0, 11.0, 12.0).zipWithIndex
      .map { case (v, i) => (ts(i), v) }.toDF("ts", "value")
    val c = Analytics.runsTestDaily(clus, col("ts"), col("value"))
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(c._1 == 5L && c._4 == 2L && c._5 < -1.5)
    // constant series: every day equals the median -> all dropped,
    // z NULL rather than 0/0
    val const = (0 until 4).map(i => (ts(i), 2.0)).toDF("ts", "value")
    val k = Analytics.runsTestDaily(const, col("ts"), col("value"))
      .select("n_days", "z_stat").as[(Long, Option[Double])].collect().head
    assert(k._1 == 0L && k._2.isEmpty)
  }

  test("cusumDaily: localizes a planted level shift; constant series reads NULL") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00")
    // [0,0,0,6,6,6]: mean 3, S = [−3,−6,−9,−6,−3,0] → |S| max 9 at day 3
    // (the last pre-shift day), σ̂ = 3, M = 9/(3·√6) = √1.5
    val ev = (0 until 6).map(i => (ts(i), if (i < 3) 0.0 else 6.0))
      .toDF("ts", "value")
    val out = Analytics.cusumDaily(ev, col("ts"), col("value"))
      .as[(Long, java.sql.Date, Double, Double)].collect().head
    assert(out._1 == 6L && out._2 == java.sql.Date.valueOf("2024-03-03"))
    assert(out._3 == 9.0)
    val m = BigDecimal(9.0 / (math.sqrt(54.0 / 6.0) * math.sqrt(6.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._4 == m, s"m_stat ${out._4} != local replay $m")
    // constant series: every S_t = 0 → s_max 0, argmax ties to the FIRST
    // day, σ = 0 → m_stat NULL
    val const = (0 until 4).map(i => (ts(i), 5.0)).toDF("ts", "value")
    val c = Analytics.cusumDaily(const, col("ts"), col("value"))
      .as[(Long, java.sql.Date, Double, Option[Double])].collect().head
    assert(c == ((4L, java.sql.Date.valueOf("2024-03-01"), 0.0, None)))
  }

  test("jackknifeMean: exact delete-one-group replay; single group reads NULL se") {
    // groups A=[1,2,3], B=[4,5], C=[6]: N=6, S=21, mean=3.5;
    // leave-one-out means 5, 3, 3
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 4L), ("B", 5L), ("C", 6L))
      .toDF("g", "v")
    val out = Analytics.jackknifeMean(df, "g", "v")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(out._1 == 3L && out._2 == 6L && out._3 == 3.5)
    def r6(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // local replay of the exact chain: 6dp thetas, order-free sums,
    // single-op var/se
    val t6 = Seq(5.0, 3.0, 3.0).map(r6)
    val tBar = t6.sum.toDouble / 3.0
    val d2 = t6.map(t => r6((t.toDouble - tBar) * (t.toDouble - tBar))).sum.toDouble
    val se = math.sqrt((3.0 - 1.0) / 3.0 * d2)
    assert(out._4 == se, s"se ${out._4} != replay $se")
    assert(out._5 == 3.5 - 1.96 * se && out._6 == 3.5 + 1.96 * se)
    // a single group carries no replication information: se/ci NULL
    val solo = Analytics.jackknifeMean(
      Seq(("A", 1L), ("A", 5L)).toDF("g", "v"), "g", "v")
      .as[(Long, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(solo == ((1L, 2L, 3.0, None, None, None)))
  }

  test("bootstrapMeanCi: exact local md5-coin replay; constant corpus collapses the CI") {
    // full local replay of the coin chain on a tiny corpus: md5("id:rep")
    // 52-bit dyadic u -> pinned Poisson(1) CDF bucket -> replicate means
    // -> exact order statistics
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 60L)).toDF("id", "v")
    val out = Analytics.bootstrapMeanCi(docs, "id", "v", 8)
      .as[(Int, Double, Double, Double)].collect().head
    def u52(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(13), 16) + 0.5) / 4503599627370496.0
    }
    val cdf = Analytics.Poisson1Cdf
    def w(key: String): Int = {
      val u = u52(key)
      val i = cdf.indexWhere(u <= _)
      if (i < 0) 9 else i
    }
    val vals = Seq("1" -> 10L, "2" -> 20L, "3" -> 60L)
    val means = (1 to 8).flatMap { rep =>
      val ws = vals.map { case (id, v) => (w(s"$id:$rep"), v) }
      val nw = ws.map(_._1).sum
      if (nw > 0) Some(ws.map { case (k, v) => k.toLong * v }.sum.toDouble / nw)
      else None
    }.sorted
    val b = means.size // a tiny corpus can drop all-zero-weight replicates
    assert(out._1 == b && out._2 == 30.0)
    val (loR, hiR) = (math.ceil(0.025 * b.toDouble).toInt, math.ceil(0.975 * b.toDouble).toInt)
    assert(out._3 == means(loR - 1) && out._4 == means(hiR - 1),
      s"CI (${out._3}, ${out._4}) != local replay (${means(loR - 1)}, ${means(hiR - 1)})")
    // a constant-valued corpus: every replicate mean IS the value — the
    // CI collapses exactly (weights cancel in the ratio)
    val const = (1L to 50L).map((_, 7L)).toDF("id", "v")
    val c = Analytics.bootstrapMeanCi(const, "id", "v", 16)
      .as[(Int, Double, Double, Double)].collect().head
    assert(c == ((16, 7.0, 7.0, 7.0)))
    // determinism: the coins are content-addressed, not RNG
    val again = Analytics.bootstrapMeanCi(docs.repartition(5), "id", "v", 8)
      .as[(Int, Double, Double, Double)].collect().head
    assert(again == out)
  }

  test("dowProfile: ISO weekdays, exact per-dow means, zero-filled gap days") {
    // 2024-01-01 is a MONDAY; 14 consecutive days valued 1..14 → each
    // ISO dow d holds days d and d+7: total 2d+7, mean (2d+7)/2,
    // share (2d+7)/105
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    val ev = (0 until 14).map(i => (ts(i), (i + 1).toDouble)).toDF("ts", "value")
    val out = Analytics.dowProfile(ev, col("ts"), col("value"))
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (1 to 7))
    for (d <- 1 to 7) {
      val r = out(d - 1)
      assert(r._2 == 2L && r._3 == (2 * d + 7).toDouble)
      assert(r._4 == (2 * d + 7).toDouble / 2.0 && r._5 == (2 * d + 7).toDouble / 105.0)
    }
    // a calendar gap participates as a zero day: Mon=10, (skip Tue), Wed=20
    val gap = Seq((ts(0), 10.0), (ts(2), 20.0)).toDF("ts", "value")
    val g = Analytics.dowProfile(gap, col("ts"), col("value"))
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(g.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, 1L, 10.0), (2, 1L, 0.0), (3, 1L, 20.0)))
  }

  test("benford: exact digit extraction + χ²/MAD replay; zeros and NULLs drop") {
    // first significant digits: 1.5→1, 19→1, 0.002→2, −300→3 (abs),
    // 9999.25→9; 0.0 and NULL carry no digit and drop
    val vals = Seq(Some(1.5), Some(19.0), Some(0.002), Some(-300.0),
      Some(9999.25), Some(0.0), None).toDF("v")
    val out = Quality.benfordDigits(vals, "v")
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.length == 9)
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 0L, 5 -> 0L, 6 -> 0L,
        7 -> 0L, 8 -> 0L, 9 -> 1L))
    def r6(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // replay digit 1's row: n=5, e = 5·0.301030
    val e1 = 5.0 * 0.301030
    assert(out.head._3 == 0.4 && out.head._4 == 0.301030 &&
      out.head._5 == r6((2.0 - e1) * (2.0 - e1) / e1).toDouble)
    // the rolled verdict: chi2 = exact DECIMAL sum of the 6dp terms,
    // MAD = exact sum of 6dp |p_obs − p| / 9
    val stat = Quality.benfordStat(vals, "v")
      .as[(Long, Double, Double, Boolean)].collect().head
    val chi2 = out.map(r => r6(r._5)).sum.toDouble
    val mad = r6(out.map(r => r6(math.abs(r._3 - r._4))).sum.toDouble / 9.0).toDouble
    assert(stat == ((5L, chi2, mad, chi2 > 20.090)), s"got $stat vs ($chi2, $mad)")
    // a Benford-conforming-ish digit mix keeps χ² under the 1% cut
    val ok = (0 until 100).flatMap { i =>
      val d = Seq(1, 1, 1, 1, 1, 1, 2, 2, 2, 3,
        3, 3, 4, 4, 5, 5, 6, 7, 8, 9)(i % 20)
      Seq(d * 10.0 + (i % 7))
    }.toDF("v")
    val okStat = Quality.benfordStat(ok, "v")
      .as[(Long, Double, Double, Boolean)].collect().head
    assert(okStat._1 == 100L && !okStat._4,
      s"near-Benford mix must not reject: $okStat")
  }

  test("spearmanCorr: tie-exact midranks, monotone = ±1 exactly, constant side NULL") {
    import spark.implicits._
    // identical tie structure, perfect monotone: doubled midranks
    // (2,5,5,8) on both sides -> rho exactly 1.0 (numerator == denominator)
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)).toDF("x", "y")
    assert(Analytics.spearmanCorr(mono, col("x"), col("y"))
      .select("rho").as[Double].collect().head == 1.0)
    // anti-monotone with the same ties: exactly -1.0
    val anti = Seq((1.0, 40.0), (2.0, 20.0), (2.0, 20.0), (3.0, 10.0)).toDF("x", "y")
    assert(Analytics.spearmanCorr(anti, col("x"), col("y"))
      .select("rho").as[Double].collect().head == -1.0)
    // hand-computed middle case: ranks (2,4,6) vs (2,6,4) -> rho = 0.5
    val mid = Seq((1.0, 10.0), (2.0, 30.0), (3.0, 20.0)).toDF("x", "y")
    val r = Analytics.spearmanCorr(mid, col("x"), col("y"))
      .as[(Long, Double)].collect().head
    assert(r == ((3L, 0.5)))
    // constant x: zero rank variance -> NULL, not NaN/divide-by-zero
    val const = Seq((5.0, 1.0), (5.0, 2.0)).toDF("x", "y")
    assert(Analytics.spearmanCorr(const, col("x"), col("y"))
      .select("rho").as[Option[Double]].collect().head.isEmpty)
  }

  test("cohenKappa: exact 2x2 replay, perfect agreement, chance-total NULL") {
    import spark.implicits._
    // yy=3, yn=1, ny=2, nn=4: po = 0.7, pe = (4*5 + 6*5)/100 = 0.5,
    // kappa = (10*7 - 50)/(100 - 50) = 0.4 — all exact doubles
    val v = Seq((true, true), (true, true), (true, true), (true, false),
      (false, true), (false, true),
      (false, false), (false, false), (false, false), (false, false))
      .toDF("a", "b")
    val r = Analytics.cohenKappa(v, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].collect().head
    assert(r == ((10L, 3L, 4L, 1L, 2L, 0.7, 0.5, 0.4)))
    // perfect agreement with both classes present: kappa exactly 1
    val perfect = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    val p = Analytics.cohenKappa(perfect, col("a"), col("b"))
      .select("kappa").as[Double].collect().head
    assert(p == 1.0)
    // both gates constant and equal: chance agreement is total (n² = Σ),
    // kappa reads NULL rather than 0/0
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    val k = Analytics.cohenKappa(const, col("a"), col("b"))
      .select("kappa").as[Option[Double]].collect().head
    assert(k.isEmpty)
    // independent coins with matched marginals: kappa exactly 0
    // (yy=1, yn=1, ny=1, nn=1 → po = 0.5 = pe)
    val coin = Seq((true, true), (true, false), (false, true), (false, false))
      .toDF("a", "b")
    val z = Analytics.cohenKappa(coin, col("a"), col("b"))
      .select("kappa").as[Double].collect().head
    assert(z == 0.0)
  }
}
