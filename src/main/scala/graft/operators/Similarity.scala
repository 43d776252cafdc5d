package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, random-hyperplane LSH bucketing as the
  * scale path.
  *
  * All vector math is Catalyst higher-order functions (`zip_with`,
  * `aggregate`) over arrays cast to double — whole-stage codegen'd, no UDFs,
  * no driver-side collection of vectors.
  *
  * Scale design: the query set is broadcast (it is small by construction);
  * the corpus streams through map-side cosine + per-partition top-k via a
  * window partitioned by query id. The LSH path buckets the corpus once
  * (signatures are computed in a single projection) and joins queries to
  * buckets, turning the O(|Q|·|C|) cross product into O(|Q|·bucket) work,
  * with multiprobe (single-bit flips) to recover recall.
  */
object Similarity {

  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k neighbors by cosine for each query vector.
    * Deterministic tie-break on neighbor id. Output: (query_id, neighbor_id,
    * rank). */
  def exactTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("_qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("_cv"))
    val sim = cosine(col("_qv"), col("_cv"))
    c.crossJoin(broadcast(q))
      .withColumn("_sim", sim)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("_sim").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  // Fixed-seed random hyperplanes (deterministic across JVMs).
  private def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(7L)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature under `numPlanes` fixed hyperplanes, as a bit string
    * (the LSH bucket key). */
  def lshSignature(vec: Column, numPlanes: Int, dim: Int): Column = {
    val bits = hyperplanes(numPlanes, dim).map { p =>
      when(dot(vec, typedLit(p)) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** All single-bit-flip probes of a signature (multiprobe LSH): the
    * signature itself plus `numPlanes` neighbors at hamming distance 1. */
  private def probes(sig: Column, numPlanes: Int): Column = {
    val flips = (1 to numPlanes).map { i =>
      val flipped = when(substring(sig, i, 1) === "1", lit("0")).otherwise(lit("1"))
      concat(substring(sig, 1, i - 1), flipped, substring(sig, i + 1, numPlanes - i))
    }
    array(sig +: flips: _*)
  }

  /** LSH-bucketed approximate top-k: corpus bucketed by signature, queries
    * multiprobed into adjacent buckets, exact cosine re-rank within the
    * candidate set. Output: (query_id, neighbor_id, rank). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 12, dim: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("_cv"))
      .withColumn("_bucket", lshSignature(col("_cv"), numPlanes, dim))
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("_qv"))
      .withColumn("_bucket", explode(probes(lshSignature(col("_qv"), numPlanes, dim), numPlanes)))
    c.join(broadcast(q), "_bucket")
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(cosine(col("_qv"), col("_cv"))).as("_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("_sim").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Per-vector norms/dims — typed array-column ops used across the ANN
    * operators, exposed as a checkable table. */
  def norms(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = toDouble(col(vecCol))
    embeddings.select(
      col(idCol),
      size(col(vecCol)).as("dim"),
      round(l2Norm(v), 4).as("l2_norm"),
      round(aggregate(v, lit(0.0), (acc, x) => acc + x) / size(col(vecCol)).cast("double"), 6)
        .as("mean_component"))
  }
}
