package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming Count-Min Sketch — the unbounded-stream form of
  * [[graft.operators.TextAnalysis.cmsSketch]]: each micro-batch's cell
  * table folds into a lake-resident sketch by CELL-WISE SUM. Because the
  * merge law is exact (cells are counts — the spec-pinned property of the
  * batch operator), the accumulated sketch is ROW-IDENTICAL to the batch
  * sketch of everything ingested so far: an exact streaming operator, not
  * an approximation of one, and the state is ≤ depth×width rows no matter
  * how much text has streamed past (the token streams themselves are
  * never retained). Point queries read the sketch dir at any time with
  * the usual min-over-rows estimate and one-sided overcount bound.
  *
  * Failure semantics: a replayed batch would double-count (sums are not
  * idempotent by content), so the fold relies on foreachBatch's
  * checkpointed exactly-once batch ids — the
  * [[StreamingPipeline]] discipline, unlike [[StreamingDedup]]'s
  * content-keyed idempotence. The merged frame materializes
  * (`localCheckpoint`) before overwriting the dir it was read from. */
object StreamingCms {

  private def pathExists(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Start the sketch consumer over a watched directory of
    * [[StreamingDedup.Doc]] parquet files; the running sketch lives at
    * `outRoot/sketch` as (_r, _b, _cell) parquet. */
  def run(spark: SparkSession, watchDir: String, outRoot: String,
          depth: Int = 4, width: Int = 1024): StreamingQuery = {
    val sketchPath = s"$outRoot/sketch"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[StreamingDedup.Doc].schema)
      .parquet(watchDir)
    stream.writeStream
      .option("checkpointLocation", s"$outRoot/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = batch.sparkSession
        val bs = TextAnalysis.cmsSketch(batch, "text", depth, width)
        val merged =
          if (pathExists(s, sketchPath))
            s.read.parquet(sketchPath).unionByName(bs)
              .groupBy(col("_r"), col("_b")).agg(sum(col("_cell")).as("_cell"))
          else bs
        // materialize before overwriting the dir the left side was read from
        merged.localCheckpoint().write.mode("overwrite").parquet(sketchPath)
      }
      .start()
  }
}
