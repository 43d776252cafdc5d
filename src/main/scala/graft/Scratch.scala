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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    Seq(Tables.nation _, Tables.customer _, Tables.supplier _,
        Tables.part _, Tables.orders _, Tables.lineitem _)
      .foreach(t => t(s, d).count())

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val dimC = time("dimC construct (eager pivot)") {
        operators.Star.withSurrogateKey(
          Tables.customer(s, d).select(col("c_custkey")), "c_custkey", "customer_key")
      }
      val dimP = time("dimP construct") {
        operators.Star.withSurrogateKey(
          Tables.part(s, d).select(col("p_partkey")), "p_partkey", "part_key")
      }
      val dimS = time("dimS construct") {
        operators.Star.withSurrogateKey(
          Tables.supplier(s, d).select(col("s_suppkey")), "s_suppkey", "supplier_key")
      }
      val dimN = time("dimN construct") {
        operators.Star.withSurrogateKey(
          Tables.nation(s, d).select(col("n_nationkey")), "n_nationkey", "nation_key")
      }
      time("dimC materialize")(dimC.write.mode("overwrite").format("noop").save())
      time("fact join only") {
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
          .join(Tables.orders(s, d).select(
            col("o_orderkey").as("l_orderkey"), col("o_custkey").as("c_custkey"),
            col("o_orderdate")), Seq("l_orderkey"))
          .join(broadcast(Tables.supplier(s, d).select(
            col("s_suppkey").as("l_suppkey"), col("s_nationkey").as("n_nationkey"))),
            Seq("l_suppkey"))
          .write.mode("overwrite").format("noop").save()
      }
      time("star_full end-to-end") {
        SparkEntry.queries("star_full")(s, d).write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
