package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for iterating on hot queries (not part of the
  * library surface; excluded from SparkEntry). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    Tables.documents(s, d).count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import operators.Dedup
    val docs = Tables.documents(s, d)
    // candidate volume diagnostics: how many prefix postings, raw join
    // matches, distinct candidates, verified pairs
    val sh = docs.select(col("doc_id").as("_id"), Dedup.shingles(col("text"), 3).as("_sh"))
      .where(size(col("_sh")) > 0)
    val grams = sh.select(col("_id"), explode(col("_sh")).as("_g"))
    val dfq = grams.groupBy(col("_g")).agg(count(lit(1)).as("_df"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_df"), col("_g"))
    val full = byDoc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val a = col("_s") * 1 + lit(1)
    val ceilTs = ((a - pmod(a, lit(2))) / 2).cast("long")
    val pfx = grams.join(dfq, "_g")
      .select(col("_id"), col("_g"),
        row_number().over(byDoc).as("_rn"),
        count(lit(1)).over(full).as("_s"))
      .where(col("_rn") <= col("_s") - ceilTs + 1)
    println("docs=" + sh.count() + " grams=" + grams.count() +
      " distinct_grams=" + dfq.count() + " prefix_postings=" + pfx.count())
    val raw = pfx.as("x").join(pfx.as("y"),
      col("x._g") === col("y._g") && col("x._id") < col("y._id") &&
        least(col("x._s"), col("y._s")) * 2 >= greatest(col("x._s"), col("y._s")) * 1)
    println("raw_matches=" + raw.count())
    val pos = raw.where((lit(1) + least(col("x._s") - col("x._rn"),
      col("y._s") - col("y._rn"))) * 3 >= (col("x._s") + col("y._s")) * 1)
    println("pos_filtered_matches=" + pos.count())
    println("cand_distinct=" + raw.select(col("x._id"), col("y._id")).distinct().count())
    println("cand_pos_distinct=" + pos.select(col("x._id"), col("y._id")).distinct().count())

    val posPfx = pfx.select(col("_id"), col("_g"), col("_rn"), col("_s"))
    val cand2 = posPfx.as("x").join(posPfx.as("y"),
        col("x._g") === col("y._g") && col("x._id") < col("y._id") &&
        least(col("x._s"), col("y._s")) * 2 >= greatest(col("x._s"), col("y._s")) &&
        (lit(1) + least(col("x._s") - col("x._rn"), col("y._s") - col("y._rn"))) * 3 >=
          (col("x._s") + col("y._s")))
      .select(col("x._id").as("doc_a"), col("y._id").as("doc_b")).distinct()
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      time("stage: pfx only") { noop(posPfx) }
      time("stage: cand distinct") { noop(cand2) }
      time("stage: verify only") {
        noop(Dedup.ngramJaccard(cand2, docs.withColumnRenamed("doc_id", "did"), "did", "text", 3)
          .where(col("jaccard") >= 0.5))
      }
      time("setsim_join") { noop(SparkEntry.queries("setsim_join")(s, d)) }
      time("setsim_join_hashed") { noop(SparkEntry.queries("setsim_join_hashed")(s, d)) }
      time("dsir_weights") { noop(SparkEntry.queries("dsir_weights")(s, d)) }
    }
    spark.stop()
  }
}
