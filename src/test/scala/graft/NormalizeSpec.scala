package graft

import org.apache.spark.sql.functions._
import graft.operators.Normalize

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("collapseWs trims and collapses internal whitespace") {
    val out = Seq("  a   b\t c  ", "x", "").toDF("s")
      .select(Normalize.collapseWs(col("s"))).as[String].collect()
    assert(out.toSeq == Seq("a b c", "x", ""))
  }

  test("digitsOnly strips non-digits (phone normalization)") {
    val out = Seq("(012) 345-678", "abc").toDF("s")
      .select(Normalize.digitsOnly(col("s"))).as[String].collect()
    assert(out.toSeq == Seq("012345678", ""))
  }

  test("emptyToNull maps empty string to null") {
    val out = Seq("", "x").toDF("s")
      .select(Normalize.emptyToNull(col("s"))).as[Option[String]].collect()
    assert(out.toSeq == Seq(None, Some("x")))
  }

  test("coerceInt falls back to default on garbage, never throws under ANSI") {
    // includes a 20-digit string: passes the digit regex but overflows int —
    // must fall back to the default, not throw the ANSI range error
    val out = Seq("42", " 7 ", "x", "", "1.5", "-3", "99999999999999999999").toDF("s")
      .select(Normalize.coerceInt(col("s"), -1)).as[Int].collect()
    assert(out.toSeq == Seq(42, 7, -1, -1, -1, -3, -1))
  }

  test("coerceDouble parses decimals with default-on-error") {
    val out = Seq("1.5", "-2", "abc").toDF("s")
      .select(Normalize.coerceDouble(col("s"), 0.0)).as[Double].collect()
    assert(out.toSeq == Seq(1.5, -2.0, 0.0))
  }

  test("parseIsoZ handles trailing Z and rejects garbage as null") {
    val out = Seq("2024-03-04T05:06:07Z", "2024-03-04T05:06:07", "nope")
      .toDF("s").select(Normalize.parseIsoZ(col("s")).cast("string"))
      .as[Option[String]].collect()
    assert(out(0).contains("2024-03-04 05:06:07"))
    assert(out(1).contains("2024-03-04 05:06:07"))
    assert(out(2).isEmpty)
  }
}
