package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC staging-table reader — the reference's relational second source
  * (etl/db/sql_client.py:1-225 reads SQL Server staging tables through a
  * connection factory, database_factory.py:1-167 dispatches on engine) as
  * Spark's built-in JDBC relation.
  *
  * Scale design: [[readPartitioned]] is the path a big staging table takes —
  * `numPartitions` range-bounded queries on a numeric partition column run
  * in parallel (one connection per task), instead of a single connection
  * streaming the whole table through the driver side of one executor.
  * Filters and column selection push INTO the remote SQL (the JDBCRelation
  * shows PushedFilters in `.explain`), so the database does the pruning and
  * only surviving rows cross the wire — the same discipline as parquet scan
  * pushdown. Use [[read]] only for small dimension/config tables.
  */
object JdbcSource {

  private def props(options: Map[String, String]): Properties = {
    val p = new Properties()
    options.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Single-connection read of a small table (dims, config, watermarks).
    * Schema resolution connects eagerly, so the connect is retried
    * (reference: every sql_client connect goes through the retry
    * decorator, etl/utils/retry.py:6-39). */
  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    Retry.withRetry(label = s"jdbc_read:$table") {
      spark.read.jdbc(url, table, props(options))
    }

  /** Parallel range-partitioned read of a big staging table: each of
    * `numPartitions` tasks issues its own bounded query on `partitionCol`
    * (the staging PK or a monotone load id). Rows outside
    * [lower, upper] are still read — the bounds shape parallelism, not a
    * filter — matching `spark.read.jdbc`'s contract. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame =
    Retry.withRetry(label = s"jdbc_read_partitioned:$table") {
      spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
        props(options))
    }

  /** Staging write-back — the reference's StagingWriter
    * (etl/db/staging_writer.py:1-159: per-entity row INSERTs into
    * staging.*_tbl) re-expressed as Spark's batched JDBC writer: each
    * partition opens one connection and flushes `batchSize`-row
    * PreparedStatement batches — the distributed analog of the reference's
    * row loop, minus the per-row round trip.
    *
    * Semantics:
    *  - `mode="append"`: add this run's rows (the reference's normal load).
    *  - `mode="overwrite"`, `truncate=true`: TRUNCATE + reload, keeping the
    *    table's DDL (indexes, grants) — the staging reset-per-run shape.
    *    Without `truncate`, Spark drops and recreates the table.
    *  - `numPartitions` caps writer concurrency so a 1000-task stage can't
    *    open 1000 database connections (coalesce, no shuffle).
    *
    * The retry wraps the whole write for the idempotent overwrite path;
    * an append that fails mid-write can leave partial rows behind (the
    * reference has the same exposure — its per-row writers return False
    * and move on), which is why the reference's staging loads, and this
    * method's default, reset the table per run. */
  def writeStaging(df: DataFrame, url: String, table: String,
                   mode: String = "overwrite", truncate: Boolean = true,
                   batchSize: Int = 1000, numPartitions: Option[Int] = None,
                   options: Map[String, String] = Map.empty): Unit = {
    val bounded = numPartitions.fold(df)(n => df.coalesce(n))
    val retries = if (mode == "overwrite") 3 else 1
    Retry.withRetry(times = retries, label = s"jdbc_write:$table") {
      bounded.write.mode(mode)
        .option("batchsize", batchSize.toString)
        .option("truncate", truncate.toString)
        .jdbc(url, table, props(options))
    }
  }
}
