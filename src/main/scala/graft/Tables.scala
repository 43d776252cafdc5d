package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver's TPC-H-ish testdata layout
  * (`<dir>/<name>.parquet`). All operators take DataFrames, so these are
  * only the entry-point bindings used by SparkEntry/Bench.
  */
/** Recommended runtime tuning for graft workloads — applied to a live
  * session (all of these are runtime-settable SQL confs). At cluster scale:
  * AQE re-plans joins and coalesces shuffle partitions from runtime stats,
  * skew-join splits hot partitions, and maxPartitionBytes keeps scan tasks
  * at a size that fits executor memory alongside shuffle buffers.
  *
  * One STATIC conf belongs in the session BUILDER (it cannot be set here):
  * `spark.sql.codegen.cache.maxEntries = 5000`. The default 100-entry
  * whole-stage-codegen cache thrashes under this library's full query
  * surface (~1500 distinct codegen units), so every stage of every query
  * re-pays janino compilation on every run — measured at 0.3-1.0s per
  * query at small SF, and pure waste in any long-lived session.
  */
object GraftSession {
  def tune(spark: SparkSession, shufflePartitions: Option[Int] = None): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728") // 128 MiB
    shufflePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n.toString))
  }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  /** `events.ts` has shipped in two parquet encodings across testdata
    * vintages, and both must normalize to a session-zone TIMESTAMP:
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright, so read
    *    nanos as long and convert with integer division (the testdata has
    *    no sub-microsecond components, so this is exact);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ, which refuses numeric casts downstream — reinterpret
    *    in the session zone (UTC everywhere in graft), which is exactly how
    *    DuckDB reads the same file for the oracle. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ -> TIMESTAMP cast below reinterprets the naive wall clock in
    // the SESSION zone, so the two vintages would yield different instants
    // under a non-UTC session (graft's own sessions all pin UTC, but this
    // loader also runs under the external driver's session, which graft
    // does not build). Force UTC before the cast is ANALYZED (the zone is
    // baked into the Cast at resolution), making both vintages and the
    // DuckDB oracle agree regardless of the caller's zone.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  /** The testdata ships every table as ONE unsplittable parquet row group,
    * so without a spread every scan stage — and all narrow work fused into
    * it — runs on a single core. Spread the CORPUS tables (heavy per-row
    * work: shingling, minhash, n-gram explosion, cosine math) to full
    * parallelism, but only when the source actually arrived under-parallel
    * (on a real cluster the input has many splits and this is a no-op).
    * The relational tables stay unspread: their per-row work is light, and
    * measurement shows the extra shuffle costs more than the parallelism
    * returns (+0.4-0.9s per query at sf0.1). */
  /** Spread a PROJECTION of the named table: under-parallelism is probed
    * from the table's parquet footer ([[parquetRowGroups]]), never via
    * `df.rdd` — the RDD conversion re-planned the query on every
    * invocation just to read a partition count. */
  def spread(s: SparkSession, d: String, name: String, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (parquetRowGroups(s, s"$d/$name.parquet") < target) df.repartition(target) else df
  }
  /** Listing-based under-parallelism probe for a parquet source: row groups
    * are parquet's unit of scan parallelism, and the count comes from the
    * file footer — a metadata read, no plan-to-RDD conversion (which
    * [[spread]] pays via `df.rdd` on EVERY corpus load) and no Spark job.
    * Falls back to "assume well-split" if the path layout is unexpected. */
  /** Per-path cache entries carry the root MODIFICATION TIME they were
    * probed at, so an in-session rewrite of the table re-probes instead of
    * serving a stale count (stale entries are REPLACED, not accumulated).
    * Caveat: the probed mtime is the ROOT's (file, or directory for
    * multi-part tables) — on object stores (S3A) directory mtime is
    * synthetic or absent, so an in-session rewrite there may still serve a
    * stale row-group count. Perf-only (the spread repartition may be
    * skipped once); deriving freshness from the max part-file mtime would
    * close it at the cost of a full listStatus per load.
    * The freshness check costs one getFileStatus per load — metadata only —
    * against `sparkContext.hadoopConfiguration` directly (building a fresh
    * SQLConf-merged Configuration per call is the expensive part, and scan
    * options don't affect a footer read). A probe FAILURE (unexpected
    * layout, permission error) logs a warning before assuming "well-split",
    * because that assumption silently disables the spread repartition — a
    * perf guarantee turned off should leave a trace. */
  private val rowGroupCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()
  private def parquetRowGroups(s: SparkSession, path: String): Int = {
    val conf = s.sparkContext.hadoopConfiguration
    val mtime =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(conf).getFileStatus(p).getModificationTime
      } catch { case _: Exception => -1L }
    rowGroupCache.compute(path, (p, prev) =>
      if (prev != null && prev._1 == mtime) prev
      else (mtime, readRowGroups(conf, p)))._2
  }
  private def readRowGroups(conf: org.apache.hadoop.conf.Configuration, path: String): Int = {
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val stat = fs.getFileStatus(p)
      val files =
        if (stat.isDirectory)
          fs.listStatus(p).toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        else Seq(stat)
      files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size finally r.close()
      }.sum
    } catch {
      case e: Exception =>
        org.apache.log4j.Logger.getLogger(getClass)
          .warn(s"row-group probe failed for $path (assuming well-split; " +
            s"spread repartition disabled): $e")
        Int.MaxValue
    }
  }
  private def spreadLoad(s: SparkSession, d: String, name: String): DataFrame = {
    val df = load(s, d, name)
    val target = s.sparkContext.defaultParallelism
    if (parquetRowGroups(s, s"$d/$name.parquet") < target) df.repartition(target) else df
  }
  def documents(s: SparkSession, d: String): DataFrame = spreadLoad(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = spreadLoad(s, d, "embeddings")
}
