package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.relational.Queries

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every key in [[queries]] with an entry in [[oracleSql]] is
  * hash-compared against DuckDB running the SQL on the same parquet.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b1_pricing_summary" -> (Queries.pricingSummary _)
  )

  /** DuckDB-runnable oracle SQL per query (same column aliases). */
  def oracleSql: Map[String, String] = Map(
    "b1_pricing_summary" -> Queries.pricingSummarySql
  )
}
