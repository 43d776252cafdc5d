package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement scratchpad (exempt in SourceGuardSpec; never part
  * of the query surface). Current experiment: where do the ~72 ms/file of
  * non-CPU wait in the date-partitioned fact writes go, and which write
  * configuration removes them. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // local-fs chmod-fork removal (no libhadoop in this environment):
      // see graft.sources.BareLocalFileSystem
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.BareLocalFileSystem].getName)
      // v2 output committer: task-parallel commit renames instead of the
      // driver-serial job-commit merge — O(files) driver work removed from
      // every partitioned write (zones are idempotent overwrite targets,
      // so v2's weaker mid-job atomicity is safe here)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = System.getProperty("java.io.tmpdir") + "/graft_scratch_write"

    def fact = spark.range(0L, 150000L, 1L, 32)
      .select(col("id").as("o_orderkey"),
        pmod(xxhash64(col("id")), lit(150000)).as("customer_key"),
        (lit(19920101) + pmod(col("id"), lit(2405))).cast("int").as("date_key"),
        (pmod(xxhash64(col("id"), lit(1)), lit(100000)).cast("double") / 100).as("o_totalprice"),
        lit("O").as("o_orderstatus"))
      .repartition(spark.sparkContext.defaultParallelism, col("date_key"))
      .sortWithinPartitions(col("o_orderkey"))

    def timed(label: String)(body: => Unit): Unit = {
      // warm once, then two timed reps
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-60s ${ts.drop(1).min}%7.2f s  (cold ${ts.head}%7.2f)")
    }

    timed("noop (compute only)") {
      fact.write.mode("overwrite").format("noop").save()
    }
    timed("parquet flat (no partitionBy)") {
      fact.write.mode("overwrite").parquet(s"$root/flat")
    }
    timed("parquet partitionBy(date_key) v1 committer") {
      fact.write.mode("overwrite").partitionBy("date_key").parquet(s"$root/p1")
    }
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    timed("parquet partitionBy(date_key) v2 committer") {
      fact.write.mode("overwrite").partitionBy("date_key").parquet(s"$root/p2")
    }
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "64")
    timed("parquet partitionBy(date_key) v1 + concurrent writers") {
      fact.write.mode("overwrite").partitionBy("date_key").parquet(s"$root/p3")
    }
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    timed("parquet partitionBy(date_key) v2 + concurrent writers") {
      fact.write.mode("overwrite").partitionBy("date_key").parquet(s"$root/p4")
    }
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "0")
    spark.conf.set("spark.hadoop.parquet.summary.metadata.level", "NONE")
    timed("parquet partitionBy v2, no summary metadata") {
      fact.write.mode("overwrite").partitionBy("date_key").parquet(s"$root/p5")
    }
    // read-back count cost (the Pipeline.scala:140 shape)
    timed("count read-back of 2405-dir fact") {
      println("  n=" + spark.read.parquet(s"$root/p2").count())
    }
    spark.stop()
  }
}
