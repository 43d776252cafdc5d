package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Quality, Star}
import graft.sources.IngestDiscovery

/** End-to-end pipeline orchestrator — the Spark re-expression of the
  * reference's top-level entry point (RUN_ALL_STEPS.py: producer → raw
  * consumer → quality engine → transform & load, with per-step timing and a
  * run report; PIPELINE_DIRECT_LOAD.py is the broker-less variant this
  * mirrors).
  *
  * Stages:
  *  1. `stage_raw`   — read the sources, attach staged metadata
  *     (`_source/_run_id/_extract_time`), write the raw zone.
  *  2. `quality`     — rule-engine split; clean and error zones written
  *     (error rows carry `_errors` reasons).
  *  3. `transform_load` — star fact build over the CLEAN zone with broadcast
  *     dim lookups, written partitioned by date_key (the DWH zone).
  *
  * Returns the run report as a DataFrame: (stage, rows, seconds) — the
  * reference's step_times/step_results table.
  */
object Pipeline {

  final case class StageReport(stage: String, rows: Long, seconds: Double)

  def runAll(spark: SparkSession, sfDir: String, outRoot: String,
             runId: String, extractTime: String = "2026-01-01 00:00:00"): DataFrame = {
    import spark.implicits._
    var reports = Vector.empty[StageReport]
    def timed(stage: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      reports :+= StageReport(stage, rows, (System.nanoTime() - t0) / 1e9)
    }

    // 1. stage raw: sources -> raw zone with staged metadata
    val orders = IngestDiscovery.staged(Tables.orders(spark, sfDir), "parquet", runId, extractTime)
    val customer = Tables.customer(spark, sfDir)
    timed("stage_raw") {
      IngestDiscovery.writeZone(orders, outRoot, "raw", "orders")
      IngestDiscovery.writeZone(customer, outRoot, "raw", "customer")
      spark.read.parquet(s"$outRoot/raw/orders").count()
    }

    // 2. quality: rule engine over the raw zone -> clean/error zones
    timed("quality") {
      val raw = spark.read.parquet(s"$outRoot/raw/orders")
      val (addRn, dupRule) = Quality.duplicateKeyRule("duplicate_key",
        col("o_orderkey"), Seq(col("_run_id")))
      val (addFk, fkRule) = Quality.fkRule("fk_customer", col("o_custkey"),
        customer, "c_custkey")
      val rules = Seq(
        Quality.Rule("null_custkey", col("o_custkey").isNull),
        fkRule,
        Quality.Rule("nonpositive_price", col("o_totalprice") <= 0),
        dupRule)
      val annotated = Quality.annotate(addFk(addRn(raw)), rules)
        .drop("_rn_duplicate_key", "_fk_ok_fk_customer")
      IngestDiscovery.writeZone(Quality.cleanZone(annotated), outRoot, "clean", "orders")
      IngestDiscovery.writeZone(Quality.errorZone(annotated), outRoot, "error", "orders")
      spark.read.parquet(s"$outRoot/clean/orders").count()
    }

    // 3. transform & load: star fact over the clean zone, partitioned DWH
    timed("transform_load") {
      val clean = spark.read.parquet(s"$outRoot/clean/orders")
      val dimC = Star.withSurrogateKey(customer.select(col("c_custkey")), "c_custkey", "customer_key")
      val fact = Star.lookupDim(
        clean.withColumnRenamed("o_custkey", "c_custkey"), dimC, "c_custkey", "customer_key")
        .select(col("o_orderkey"), col("customer_key"),
          (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
            dayofmonth(col("o_orderdate"))).as("date_key"),
          col("o_totalprice"), col("o_orderstatus"))
      Star.writeFactPartitioned(fact, s"$outRoot/dwh/fact_orders", "date_key", "o_orderkey")
      spark.read.parquet(s"$outRoot/dwh/fact_orders").count()
    }

    reports.toDF()
  }
}
