package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-class ORACLED Bloom filter (Bloom 1970) — the MEMBERSHIP sketch
  * beside frequency ([[TextAnalysis.cmsSketch]]), cardinality
  * ([[TextAnalysis.hllRegisters]]), quantile ([[QuantileSketch]]) and
  * self-join-size ([[F2Sketch]]): fixed m-bit state answers "possibly
  * member / definitely not" with NO false negatives, which is exactly the
  * pruning contract corpus decontamination wants — [[Dedup.decontaminate]]
  * already uses Spark's built-in Bloom as an opaque prune; this one is a
  * TABLE of words both engines rebuild bit-for-bit (the md5-salted
  * convention of cmsSketch rows), so the filter itself is verifiable and
  * portable (write it once, probe it from any engine).
  *
  * Layout: k salted md5 positions per key over m bits, packed 32 bits per
  * BIGINT word — 32-bit lanes keep every word below 2^32, so `bit_or`
  * stays positive and `>>`/`& 1` probes are sign-free in Spark and DuckDB
  * alike (the ann_hamming two-word discipline; a 64-bit lane would put
  * bit 63 in the sign). State is m/32 words at ANY member count.
  *
  * Scale: position derivation is map-side; the build partial-aggregates
  * per task (≤ m/32 rows cross the exchange); probes join the word table
  * as a broadcast (the filter is KB-sized by construction). MERGE LAW:
  * bitwise OR, word by word — IDEMPOTENT (x | x = x), so per-shard
  * filters union freely and a streaming fold needs no replay guard (the
  * HLL-max side of the streaming-guard family; see
  * [[graft.streaming.StreamingBloom]]). False-positive rate at n members:
  * (1 − e^(−k·n/m))^k — callers size m for their benchmark set; the
  * diagnostics query measures the realized rate against an exact
  * semi-join. */
object BloomSketch {

  val MBits = 8192
  val KHashes = 4
  private val LaneBits = 32

  /** The k (word-index, lane-bit) coordinates of one key: position h =
    * first 8 hex digits of md5("bf{h}:" || key) mod m (below 2^63, the
    * hash-arith rule); widx = pos >> 5, bit = pos % 32. */
  private def coords(key: Column, mBits: Int, k: Int): Column =
    array((0 until k).map { h =>
      val pos = conv(substring(md5(concat(lit(s"bf$h:"), key)), 1, 8), 16, 10)
        .cast("long") % mBits
      struct(shiftright(pos, 5).cast("int").as("_widx"),
        (pos % LaneBits).cast("int").as("_bit"))
    }: _*)

  /** Build the word table (widx, bits) over `members`' non-null keys —
    * ≤ m/32 rows, mergeable by word-wise `bit_or` (idempotent). */
  def bloomWords(members: DataFrame, keyCol: String,
                 mBits: Int = MBits, k: Int = KHashes): DataFrame = {
    require(mBits % LaneBits == 0 && mBits >= LaneBits && k >= 1,
      s"bloom needs mBits divisible by 32 and k >= 1; got m=$mBits k=$k")
    members.where(col(keyCol).isNotNull)
      .select(explode(coords(col(keyCol), mBits, k)).as("_c"))
      .select(col("_c._widx").as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), _c._bit)").as("_w"))
      .groupBy(col("widx")).agg(expr("bit_or(_w)").as("bits"))
  }

  /** Exact merge of word tables: word-wise OR (see the object scaladoc —
    * idempotent, so re-merging replayed content is a no-op). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("widx")).agg(expr("bit_or(bits)").as("bits"))

  /** Probe each row's key against a word table: bloom_hit is true iff ALL
    * k bits are set (no false negatives by construction; false positives
    * at the (1−e^(−kn/m))^k rate). Absent words read as unset via the
    * left join's coalesce. Output: (idCol, bloom_hit). */
  def bloomProbe(df: DataFrame, idCol: String, keyCol: String, words: DataFrame,
                 mBits: Int = MBits, k: Int = KHashes): DataFrame =
    df.where(col(keyCol).isNotNull)
      .select(col(idCol), explode(coords(col(keyCol), mBits, k)).as("_c"))
      .select(col(idCol), col("_c._widx").as("widx"), col("_c._bit").as("_bit"))
      .join(broadcast(words), Seq("widx"), "left")
      .select(col(idCol), coalesce(
        expr("(shiftright(bits, _bit) & 1) = 1"), lit(false)).as("_hit"))
      .groupBy(col(idCol)).agg(expr("bool_and(_hit)").as("bloom_hit"))

  /** The verification surface (the cmsCounts probe discipline): build over
    * a member set, probe the full corpus, and report the Bloom verdict
    * beside the EXACT membership join — every exact member must read
    * bloom_hit = true (no false negatives), and the bloom_hit ∧ ¬exact
    * rows measure the realized false-positive rate. Output:
    * (idCol, bloom_hit, exact_hit). */
  def bloomDiagnostics(df: DataFrame, idCol: String, keyCol: String,
                       isMember: Column, mBits: Int = MBits,
                       k: Int = KHashes): DataFrame = {
    val base = df.where(col(keyCol).isNotNull)
    val members = base.where(isMember).select(col(keyCol))
    val words = bloomWords(members, keyCol, mBits, k)
    val probed = bloomProbe(base, idCol, keyCol, words, mBits, k)
    val exact = base
      .join(broadcast(members.distinct().withColumnRenamed(keyCol, "_mk")),
        col(keyCol) === col("_mk"), "left")
      .select(col(idCol), col("_mk").isNotNull.as("exact_hit"))
    probed.join(exact, Seq(idCol))
      .select(col(idCol), col("bloom_hit"), col("exact_hit"))
  }
}
