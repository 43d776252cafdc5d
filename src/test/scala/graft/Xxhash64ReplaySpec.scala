package graft

import org.apache.spark.sql.functions._

/** Property-pin of the DuckDB xxhash64 limb replay against Spark itself.
  *
  * The trained-artifact ANN oracles (ann_ivf / ann_pq / ann_ivfpq /
  * ann_ivfpq_res) re-select their training samples by replaying Spark's
  * `xxhash64(BIGINT)` (seed 42) in DuckDB HUGEINT limb arithmetic
  * (`SparkEntry.xxhash64Ctes`). That chain was verified against pyspark on
  * known vectors when it was written — but a Spark upgrade changing hash
  * internals (or a transcription slip in a future edit of the CTEs) would
  * surface only as an opaque oracle red. This spec is the localizer: the
  * methods below are a ONE-TO-ONE port of the SQL CTE steps (hx0..hh, same
  * limb decomposition, same rotate-as-shift-sum, same xor points), checked
  * against the engine's own `xxhash64` over randomized and adversarial
  * BIGINTs. If the oracle ever reds while this stays green, the SQL text
  * drifted from the chain; if THIS reds, Spark's hash changed — triage is
  * mechanical either way (the winnow-oracle precedent in
  * DedupSimilaritySpec, applied to the hash the ANN trainings stand on).
  */
class Xxhash64ReplaySpec extends SparkSpec {
  import spark.implicits._

  private val M64 = BigInt(1) << 64

  /** `mul64(a, b)` from SparkEntry: (a*b) mod 2^64 with a split into 32-bit
    * limbs so no intermediate exceeds HUGEINT range — ported verbatim
    * (including the `% 4294967296` clamp on the high limb's product). */
  private def mul64(a: BigInt, b: BigInt): BigInt =
    ((a % BigInt(4294967296L)) * b +
      (((a / BigInt(4294967296L)) * b) % BigInt(4294967296L)) * BigInt(4294967296L)) % M64

  /** hx0..hh ported step-for-step: integer division `//` → BigInt `/`
    * (both floor toward zero on the non-negative values in play), UBIGINT
    * xor → BigInt `^`, the final re-sign → BIGINT two's complement. */
  private def limbReplay(id: Long): Long = {
    val l = BigInt(id) + (if (id < 0) M64 else BigInt(0)) // hx0
    val k1 = mul64(l, BigInt("14029467366897019727")) // hx1: * PRIME64_2
    val k2 = (k1 * BigInt(2147483648L)) % M64 + k1 / BigInt(8589934592L) // hx2: rotl31
    val k3 = mul64(k2, BigInt("11400714785074694791")) // hx3: * PRIME64_1
    val h1 = BigInt("2870177450012600311") ^ k3 // hx4: (seed+P5+8) xor
    val h2 = (h1 * BigInt(134217728L)) % M64 + h1 / BigInt(137438953472L) // hx5: rotl27
    val h3 = (mul64(h2, BigInt("11400714785074694791")) + BigInt("9650029242287828579")) % M64 // hx6
    val h4 = h3 ^ (h3 / BigInt(8589934592L)) // hx7: >> 33
    val h5 = mul64(h4, BigInt("14029467366897019727")) // hx8
    val h6 = h5 ^ (h5 / BigInt(536870912L)) // hx9: >> 29
    val h7 = mul64(h6, BigInt("1609587929392839161")) // hxa: * PRIME64_3
    val h8 = h7 ^ (h7 / BigInt(4294967296L)) // hxb: >> 32
    val s = if (h8 >= (BigInt(1) << 63)) h8 - M64 else h8 // hh: re-sign
    s.toLong
  }

  test("SQL limb chain == Spark xxhash64 over randomized + adversarial BIGINTs") {
    val rnd = new scala.util.Random(13)
    val ids = (Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      Int.MaxValue.toLong, Int.MinValue.toLong) ++
      Seq.fill(2000)(rnd.nextLong())).distinct
    val got = ids.toDF("id")
      .select(col("id"), xxhash64(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == limbReplay(id),
        s"limb replay diverged from Spark xxhash64 at id=$id: " +
          s"spark=${got(id)} replay=${limbReplay(id)}")
    }
  }
}
