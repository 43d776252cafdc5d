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

  /** Single-connection read of a small table (dims, config, watermarks). */
  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Parallel range-partitioned read of a big staging table: each of
    * `numPartitions` tasks issues its own bounded query on `partitionCol`
    * (the staging PK or a monotone load id). Rows outside
    * [lower, upper] are still read — the bounds shape parallelism, not a
    * filter — matching `spark.read.jdbc`'s contract. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      props(options))
}
