package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque `binary` payloads with typed metadata,
  * and a partition-preserving decode/feature-extract stage.
  *
  * Image/audio codecs are not available in this environment by design, so
  * [[stubDecode]] is a deterministic fake standing in for the real decoder —
  * the Spark-side plumbing (schema, typed Dataset, mapPartitions batch shape,
  * partitioning) is real and tested. At scale the decode stage is the
  * CPU-heavy step: it runs per-partition with no shuffle, so parallelism is
  * controlled entirely by upstream partitioning of the payload table.
  */
object Multimodal {

  /** A media row: opaque payload + minimal typed metadata. */
  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoder output: fixed-dim feature vector + payload stats. */
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                                 feature: Array[Float])

  /** Pack a text table into media rows (payload = UTF-8 bytes) — the test
    * stand-in for real image/audio payload columns.
    *
    * Doc ids are cast to long because the typed decode stage
    * ([[decodeFeatures]]) rides a concrete `MediaRow` Encoder — under ANSI
    * mode a string-keyed corpus must densify ids first (e.g. the
    * [[TextAnalysis.corpusShuffle]] rank) and join back after; the
    * binary/decode plumbing itself is id-agnostic. */
  def packBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text/plain").as("mime"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Metadata extraction straight off the binary column (no decode): byte
    * length + content hash. Pure Column exprs, codegen'd. */
  def metaTable(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("mime"),
      octet_length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"))

  /** STUB DECODER — deterministic fake. A real implementation would decode
    * the image/audio payload here (e.g. JPEG → pixels → embedding); this one
    * derives a `dim`-bucket byte histogram, L1-normalized, so tests have a
    * stable, content-sensitive feature vector with the real batch shape. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % dim) += 1f
      i += 1
    }
    val total = math.max(1f, payload.length.toFloat)
    hist.map(_ / total)
  }

  /** Frame sampling over an opaque media payload: treat the binary as a
    * container of fixed-size frames and keep every `every`-th one — the
    * video-frame-sampling plumbing (schema, slicing arithmetic, explode
    * shape) with the codec stubbed out as fixed-width byte frames. Pure
    * Column exprs: `sequence` of sampled indices + `substr` slices; the
    * real decoder would replace the slice, not the plumbing.
    * Output: (doc_id, n_frames, frame_idx, frame, frame_bytes). */
  def frameSample(media: DataFrame, frameSize: Int, every: Int): DataFrame = {
    val n = octet_length(col("payload"))
    val nFrames = ceil(n.cast("double") / frameSize).cast("int")
    media
      .where(n > 0)
      .select(col("doc_id"), col("payload"), nFrames.as("n_frames"),
        explode(sequence(lit(0), nFrames - 1, lit(every))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameSize + 1, lit(frameSize)).as("frame"))
      .withColumn("frame_bytes", octet_length(col("frame")))
  }

  /** Partition-preserving decode stage: typed Dataset in, typed Dataset out,
    * one decoder call per row, batched per partition (the mapInPandas batch
    * shape, expressed as Scala mapPartitions). */
  def decodeFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          MediaFeatures(r.doc_id, r.mime, r.payload.length, stubDecode(r.payload, dim))
        }
      }
  }
}
