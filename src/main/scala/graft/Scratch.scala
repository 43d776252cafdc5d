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

    // Current experiment (r20 item 9): does a CONSTANT-partitioned window
    // (partitionBy(lit(0))) silence WindowExec's "No Partition Defined"
    // WARN without the optimizer folding the constant away, and is the
    // result row-identical to the global window?
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 1000).select(col("id"), pmod(col("id"), lit(7)).as("v"))
    println("=== global window (expect WARN above) ===")
    val a = df.withColumn("rn", row_number().over(Window.orderBy(col("v"), col("id"))))
      .withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    a.write.mode("overwrite").format("noop").save()
    println("=== lit(0)-partitioned window (expect NO warn) ===")
    val w0 = Window.partitionBy(lit(0))
    val b = df.withColumn("rn", row_number().over(w0.orderBy(col("v"), col("id"))))
      .withColumn("cum", sum(col("v")).over(
        w0.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    b.write.mode("overwrite").format("noop").save()
    println("rows equal: " + (a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty))
    println("--- constant-partitioned physical plan ---")
    println(b.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Window") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
