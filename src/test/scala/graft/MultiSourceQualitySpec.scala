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
}
