package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational analytics block (SURVEY.md §2 B): the solardb.py query
  * surface (filter / order / group / limit / join) re-expressed over the
  * TPC-H-ish testdata, plus event sessionization and JSON extraction.
  *
  * Determinism rules (SURVEY.md §5): money/quantity aggregated as BIGINT
  * cents — `round(x*100)` is bit-stable across engines because the money
  * columns are 2-dp values whose `*100` lands far from .5 ties — and every
  * result carries a total ORDER BY.
  */
object Queries {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * lit(100.0), 0).cast("long")

  /** B1: TPC-H Q1-style pricing summary; exact integer aggregation. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    l.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_base_c"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_c"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge_c"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(ROUND(l_quantity*100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100.0) AS BIGINT)) AS BIGINT) AS sum_base_c,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100.0) AS BIGINT)) AS BIGINT) AS sum_disc_c,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*100.0) AS BIGINT)) AS BIGINT) AS sum_charge_c,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
