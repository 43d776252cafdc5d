package graft

import org.apache.spark.sql.functions._
import graft.operators.{MultiSource, Quality}

class MultiSourceQualitySpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
    .toDF("id", "name", "bal")
  private def right = Seq((2, "b", 20.0), (3, "C", 30.0), (4, "d", 40.0))
    .toDF("id", "name", "bal")

  test("mergedUnion tags every row with its source") {
    val m = MultiSource.mergedUnion(Map("CSV" -> left, "SQL" -> right))
    assert(m.count() == 6)
    assert(m.columns.head == "source")
    val bySource = m.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource == Map("CSV" -> 3L, "SQL" -> 3L))
  }

  test("reconInner reports only overlapping keys with differing attributes") {
    val r = MultiSource.reconInner(left, right, "id", Seq("name", "bal"))
    val rows = r.as[(Int, String, String, Double, Double)].collect()
    assert(rows.toSeq == Seq((3, "c", "C", 30.0, 30.0))) // id 2 matches, id 3 differs
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by content hash") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "payload")
    val out = MultiSource.snapshotDiff(v1, v2, "id", Seq("payload"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // multi-column payloads can't alias across the column boundary:
    // ("a","b") must differ from ("ab","")
    val oa = Seq((1L, "a", "b")).toDF("id", "x", "y")
    val ob = Seq((1L, "ab", "")).toDF("id", "x", "y")
    assert(MultiSource.snapshotDiff(oa, ob, "id", Seq("x", "y"))
      .as[(Long, String)].collect().head._2 == "changed")
  }

  test("fuzzyLinkage links block-local near-names only") {
    val l = Seq((1L, "alice smith", "b1"), (2L, "bob jones", "b2"),
      (3L, "carol wu", "b3")).toDF("id", "name", "blk")
    val r = Seq(
      (11L, "alice smyth", "b1"), // dist 1 -> links
      (12L, "ALICE SMITH", "b1"), // case mutation, dist 10 -> excluded
      (13L, "bob jones", "b2"),   // dist 0 -> links (cross-source dupe)
      (14L, "alice smith", "b9")  // exact name but WRONG block -> never a candidate
    ).toDF("id", "name", "blk")
    val q = MultiSource.fuzzyLinkage(l, r, "id", "name", "blk", 2)
    // Plan pin (round-15): ONE levenshtein per candidate pair — the dist
    // filter rides on a generator output, so predicate pushdown cannot
    // substitute the alias and re-derive the O(|name|²) distance in a
    // second site (the classifier size(_grams) regression class).
    val nLev = "levenshtein".r
      .findAllIn(q.queryExecution.executedPlan.toString).length
    assert(nLev == 1, s"expected exactly one levenshtein in the plan, got $nLev")
    val out = q
      .as[(Long, Long, String, String, Int)].collect()
      .map(t => (t._1, t._2, t._5)).toSet
    assert(out == Set((1L, 11L, 1), (2L, 13L, 0)))
  }

  test("editJoin is COMPLETE vs brute force at d=0,1,2 incl. the short-string class") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    // planted typos, an exact duplicate (ed 0), a dense short-string
    // class exercising the length-bucket path (incl. the empty string),
    // and unpaired controls
    val rows = Seq(
      1L -> "alice", 2L -> "alicx", 3L -> "alive", 4L -> "alice",
      5L -> "bob", 6L -> "bpb",
      7L -> "a", 8L -> "b", 9L -> "ab", 10L -> "",
      11L -> "carolinexyz", 12L -> "unrelatedname")
    val df = rows.toDF("id", "name")
    val byId = rows.toMap
    for (d <- Seq(0, 1, 2)) {
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && lev(sa, sb) <= d
      } yield (ia, ib)).toSet
      val got = MultiSource.editJoin(df, "id", "name", d)
        .as[(Long, Long, Int)].collect()
      assert(got.map(t => (t._1, t._2)).toSet == want,
        s"d=$d: pair-set mismatch (completeness broken)")
      got.foreach { case (a, b, dist) =>
        assert(dist == lev(byId(a), byId(b)), s"d=$d dist wrong for ($a,$b)") }
      assert(got.map(t => (t._1, t._2)).distinct.length == got.length,
        s"d=$d: duplicate pairs emitted")
    }
  }

  test("snapshotDiff encoding is injective: NULL vs '' and separator bytes") {
    // NULL -> '' is a real content change (the N / V0: tags differ)
    val na = Seq((1L, Option.empty[String])).toDF("id", "x")
    val nb = Seq((1L, Option(""))).toDF("id", "x")
    assert(MultiSource.snapshotDiff(na, nb, "id", Seq("x"))
      .as[(Long, String)].collect().head._2 == "changed")
    // a control byte inside a value can't shift content across the column
    // boundary: ("ab", "") vs ("a", "b") must differ
    val sa = Seq((1L, "ab", "")).toDF("id", "x", "y")
    val sb = Seq((1L, "a", "b")).toDF("id", "x", "y")
    assert(MultiSource.snapshotDiff(sa, sb, "id", Seq("x", "y"))
      .as[(Long, String)].collect().head._2 == "changed")
    // identical payloads still hash identically through the encoding
    assert(MultiSource.snapshotDiff(sa, sa, "id", Seq("x", "y"))
      .as[(Long, String)].collect().head._2 == "unchanged")
  }

  test("snapshotDiff duplicate keys: loud under the flag, fan-out documented") {
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "payload")
    val clean = Seq((1L, "a"), (2L, "c")).toDF("id", "payload")
    // default (flag off): the documented row-multiplicative fan-out — the
    // duplicate key contributes one output row per (old, new) hash pair
    val rows = MultiSource.snapshotDiff(dup, clean, "id", Seq("payload"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(rows == Seq((1L, "changed"), (1L, "unchanged"), (2L, "unchanged")))
    // flag on: the first duplicate key raises instead of fanning out
    val e = intercept[Exception] {
      MultiSource.snapshotDiff(dup, clean, "id", Seq("payload"),
        failOnDuplicateKeys = true).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate id in old snapshot")), e)
    // flag on with unique keys: plain pass-through
    assert(MultiSource.snapshotDiff(clean, clean, "id", Seq("payload"),
        failOnDuplicateKeys = true)
      .as[(Long, String)].collect().forall(_._2 == "unchanged"))
  }

  test("reconOnlyIn is a null-safe anti join") {
    assert(MultiSource.reconOnlyIn(left, right, "id").select("id").as[Int].collect().toSeq == Seq(1))
    assert(MultiSource.reconOnlyIn(right, left, "id").select("id").as[Int].collect().toSeq == Seq(4))
  }

  test("perSourceAgg computes total and per-source counts") {
    val m = MultiSource.mergedUnion(Map("CSV" -> left, "SQL" -> right))
    val a = MultiSource.perSourceAgg(m, Seq.empty, Seq("CSV", "SQL"))
    val (total, csv, sql) = a.as[(Long, Long, Long)].collect().head
    assert((total, csv, sql) == (6L, 3L, 3L))
  }

  test("Rules builders cover the catalog vocabulary in one pass") {
    import graft.operators.Quality.Rules
    val df = Seq(
      (1, Some("ab@x.io"), Some(5.0), "OK", "short"),
      (2, None, Some(-1.0), "BAD", "short"),
      (3, Some("  "), Some(500.0), "OK", "far-too-long-value")
    ).toDF("id", "email", "amt", "status", "tag")
    val rules = Seq(
      Rules.notNull("email"),
      Rules.nonEmpty("email"),
      Rules.matches("email", "^[^@\\s]+@[^@\\s]+$", "bad_email_format"),
      Rules.positive("amt"),
      Rules.inRange("amt", 0.0, 100.0),
      Rules.inSet("status", Seq("OK", "PENDING")),
      Rules.maxLength("tag", 10))
    val errs = Quality.annotate(df, rules)
      .select("id", Quality.ErrorsCol).as[(Int, String)].collect().toMap
    assert(errs(1) == "")
    assert(errs(2) == "null_email | empty_email | nonpositive_amt | range_amt | bad_status")
    assert(errs(3) == "empty_email | bad_email_format | range_amt | too_long_tag")
  }

  test("quality engine: single-pass multi-rule annotate, ordered reasons") {
    val df = Seq(
      (1, Some(10.0), "O"),   // clean
      (2, None, "O"),         // null_bal
      (3, Some(-5.0), "X"),   // negative_bal | bad_status
      (3, Some(1.0), "O")     // duplicate_key (second copy of id 3)
    ).toDF("id", "bal", "status")
    val (addRn, dupRule) = Quality.duplicateKeyRule("duplicate_key", col("id"), Seq(col("status")))
    val rules = Seq(
      Quality.Rule("null_bal", col("bal").isNull),
      Quality.Rule("negative_bal", col("bal") < 0),
      Quality.Rule("bad_status", !col("status").isin("O", "F")),
      dupRule)
    val ann = Quality.annotate(addRn(df), rules)
    val errs = ann.select(col("id"), col(Quality.ErrorsCol)).as[(Int, String)].collect().toSet
    assert(errs.contains((1, "")))
    assert(errs.contains((2, "null_bal")))
    // id=3 copies: ordered by status, "O" sorts before "X" -> the X row is the dup
    assert(errs.contains((3, "negative_bal | bad_status | duplicate_key")))
    assert(errs.contains((3, "")))

    assert(Quality.cleanZone(ann).count() == 2)
    assert(Quality.errorZone(ann).count() == 2)
    val audit = Quality.ruleAudit(ann).as[(String, Long)].collect().toMap
    assert(audit == Map("null_bal" -> 1L, "negative_bal" -> 1L,
      "bad_status" -> 1L, "duplicate_key" -> 1L))
    val zones = Quality.zoneStats(ann, "t", "id")
      .select("zone", "n_rows").as[(String, Long)].collect().toMap
    assert(zones == Map("clean" -> 2L, "error" -> 2L))
  }

  test("zoneRuleMetrics matches the two-pass zoneStats + ruleAudit feed") {
    val df = Seq(
      (1, Some(10.0), "O"), (2, None, "O"), (3, Some(-5.0), "X"), (4, Some(1.0), "O")
    ).toDF("id", "bal", "status")
    val rules = Seq(
      Quality.Rule("null_bal", col("bal").isNull),
      Quality.Rule("negative_bal", col("bal") < 0),
      Quality.Rule("bad_status", !col("status").isin("O", "F")))
    val ann = Quality.annotate(df, rules)
    val fused = Quality.zoneRuleMetrics(ann)
      .as[(String, String, Double)].collect().toSet
    val twoPass =
      Quality.zoneStats(ann, "t", "id")
        .select(lit("zone_rows").as("metric"), col("zone").as("key"),
          col("n_rows").cast("double").as("value"))
        .unionByName(Quality.ruleAudit(ann)
          .select(lit("rule_violations").as("metric"), col("rule").as("key"),
            col("n_violations").cast("double").as("value")))
        .as[(String, String, Double)].collect().toSet
    assert(fused == twoPass)
    assert(fused == Set(
      ("zone_rows", "clean", 2.0), ("zone_rows", "error", 2.0),
      ("rule_violations", "null_bal", 1.0), ("rule_violations", "negative_bal", 1.0),
      ("rule_violations", "bad_status", 1.0)))
    // all-clean corpus: no rule_violations rows at all, matching ruleAudit
    // over an empty error zone
    val clean = Quality.annotate(
      Seq((1, Some(1.0), "O")).toDF("id", "bal", "status"), rules)
    assert(Quality.zoneRuleMetrics(clean).as[(String, String, Double)]
      .collect().toSet == Set(("zone_rows", "clean", 1.0)))
  }

  test("catalogCounts reports every declared rule — including zero-violation ones — in one pass") {
    val df = Seq((1, Option("x")), (2, Option.empty[String])).toDF("id", "name")
    val rules = Seq(Quality.Rules.notNull("name"), Quality.Rules.positive("id"))
    val out = Quality.catalogCounts(df, rules, "ent")
      .as[(String, String, Long)].collect().toSet
    // ruleAudit's explode-the-reasons form can only ever report fired rules;
    // the literal catalog audit proves the whole catalog RAN
    assert(out == Set(("ent", "null_name", 1L), ("ent", "nonpositive_id", 0L)))
  }

  test("entity catalogs evaluate in one pass and fire per family") {
    val nation = Seq((0, "VN"), (1, "US")).toDF("n_nationkey", "n_name")
    val cust = Seq(
      (Option(1L), "Alice", "alice@x.vn", "090-111", 10.0, "BUILDING", 0),   // clean
      (Option(2L), "  ", "no-at-sign", "phone?", 99999.0, "NOPE", 7)         // fires 6 rules
    ).toDF("c_custkey", "c_name", "c_email", "c_phone", "c_acctbal", "c_mktsegment", "c_nationkey")
    val (prep, rules) = Quality.Catalogs.customer(nation)
    val counts = Quality.catalogCounts(prep(cust), rules, "khach_hang")
      .as[(String, String, Long)].collect().map { case (_, r, n) => r -> n }.toMap
    assert(counts == Map(
      "null_c_custkey" -> 0L, "empty_c_name" -> 1L, "too_long_c_name" -> 0L,
      "bad_email" -> 1L, "bad_phone" -> 1L, "range_c_acctbal" -> 1L,
      "bad_c_mktsegment" -> 1L, "fk_nation" -> 1L))
  }

  test("profileColumns handles column names with spaces and quotes") {
    val df = Seq((1, Option("a")), (2, Option.empty[String]))
      .toDF("order id", "cust'name")
    val out = Quality.profileColumns(df, Seq("order id", "cust'name"))
      .select("col_name", "n_nulls").as[(String, Long)].collect().toMap
    assert(out == Map("order id" -> 0L, "cust'name" -> 1L))
  }

  test("profileDrift against an empty snapshot reports drift instead of dividing by zero") {
    val before = Seq.empty[(Int, String)].toDF("id", "name")
    val after = Seq((1, Option("a")), (2, Option.empty[String])).toDF("id", "name")
    val out = Quality.profileDrift(before, after, Seq("id", "name"))
      .select("col_name", "drifted").as[(String, Boolean)].collect().toMap
    // 0-row denominator is guarded to 0 permille — no NaN, no ANSI throw
    assert(out == Map("id" -> true, "name" -> true))
    // BOTH snapshots empty: the side-tagged groupBy has no group rows, but
    // every declared column must still report one zero-drift row (the
    // default-spine union), never a vanishing col_drift metric
    val bothEmpty = Quality.profileDrift(before,
        Seq.empty[(Int, String)].toDF("id", "name"), Seq("id", "name"))
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(bothEmpty.toSeq == Seq(
      ("id", 0L, 0L, 0L, 0L, false, false),
      ("name", 0L, 0L, 0L, 0L, false, false)))
  }

  test("zonePreview emits the typed first-N cell grid deterministically") {
    val zone = Seq((3L, "c", 30.5), (1L, "a", 10.0), (2L, "b", 20.25),
      (4L, "d", 40.0)).toDF("id", "name", "amt")
    val p = Quality.zonePreview(zone, Seq("id"), 2)
    // top-N must plan as TakeOrderedAndProject (per-partition heaps) —
    // never a global Sort feeding a Limit
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val rows = p.as[(Int, String, String, String)].collect().toSet
    // full 2x3 cell grid of the TWO SMALLEST ids, schema pinned per cell,
    // doubles printed at exactly 2dp
    assert(rows == Set(
      (1, "id", "bigint", "1"), (1, "name", "string", "a"),
      (1, "amt", "double", "10.00"),
      (2, "id", "bigint", "2"), (2, "name", "string", "b"),
      (2, "amt", "double", "20.25")))
    // NULL cells survive as NULL (not the string "null")
    val withNull = Seq((1L, Option.empty[String], 1.0)).toDF("id", "name", "amt")
    val cells = Quality.zonePreview(withNull, Seq("id"), 1)
      .where(col("col_name") === "name").select("cell")
      .as[Option[String]].collect()
    assert(cells.toSeq == Seq(None))
  }

  test("auditTail returns exactly the last-N error rows by stable id") {
    val annotated = Seq(
      (1L, "", "x"), (2L, "bad_a", "x"), (3L, "", "x"),
      (4L, "bad_b", "x"), (5L, "bad_a | bad_b", "x"), (6L, "bad_c", "x")
    ).toDF("id", Quality.ErrorsCol, "payload")
      .select(col("id"), col("payload"), col(Quality.ErrorsCol))
    val t = Quality.auditTail(annotated, Seq("id"), 2)
    assert(t.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val ids = t.select("id", Quality.ErrorsCol).as[(Long, String)].collect().toSet
    // ids 2 and 4 are errors too, but 5 and 6 are the LAST two
    assert(ids == Set((6L, "bad_c"), (5L, "bad_a | bad_b")))
  }
}
