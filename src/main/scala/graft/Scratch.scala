package graft

import org.apache.spark.sql.SparkSession

/** Throwaway measurement scratchpad (exempt in SourceGuardSpec; never part
  * of the query surface). Current experiment: AQE coalescing collapses
  * small-bytes/CPU-dense verify stages (containment/setsim joins) to ~5
  * tasks at sf0.1 — measure whether a lower coalesce minPartitionSize
  * restores parallelism without hurting the small queries. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = if (args.length > 1) args.drop(1).toSeq
      else Seq("containment_join", "setsim_join", "lm_kn_trigram")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // local-fs chmod-fork removal (no libhadoop in this environment):
      // see graft.sources.BareLocalFileSystem
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.BareLocalFileSystem].getName)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // AQE coalescing floor: the 1MB default collapses small-bytes but
      // CPU-DENSE post-shuffle stages (similarity-join verify: 5.7MB of
      // candidate pairs -> 5 tasks x 1.3s of array_intersect) to a handful
      // of tasks. 256KB keeps such stages parallel; at production shuffle
      // sizes bytes/parallelism >> 256KB so the floor never binds there.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256KB")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeQ(q: String): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    import org.apache.spark.sql.functions._
    val root = System.getProperty("java.io.tmpdir") + "/graft_scratch_crc"
    def fact = spark.range(0L, 150000L, 1L, 32)
      .select(col("id").as("k"),
        (lit(19920101) + pmod(col("id"), lit(2405))).cast("int").as("date_key"),
        (pmod(xxhash64(col("id"), lit(1)), lit(100000)).cast("double") / 100).as("v"),
        lit("O").as("st"))
      .repartition(spark.sparkContext.defaultParallelism, col("date_key"))
      .sortWithinPartitions(col("k"))
    def run(tag: String): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fact.write.mode("overwrite").partitionBy("date_key").parquet(s"$root/$tag")
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s min=${ts.drop(1).min}%6.2f s")
    }
    run("checksummed")
    // flip the live FileSystem for file:// to the raw no-chmod fs
    spark.sparkContext.hadoopConfiguration.set("fs.file.impl",
      "graft.sources.BareRawLocalFileSystem")
    org.apache.hadoop.fs.FileSystem.closeAll()
    run("raw-no-crc")
    spark.stop()
  }
}
