package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's city-list input (gather_city_shapes.py:13-25): a
  * headerless `city, state` CSV read with `skipinitialspace=True` —
  * here Spark's csv source with an explicit schema (never inferSchema:
  * schema inference is an extra full pass over 100 TB) and
  * leading/trailing whitespace trimmed to match the reference's
  * parsing. Rows with a missing city or state are dropped, mirroring
  * the reference's assumption that every row is a pair.
  */
object CityCsv {

  val schema: StructType = StructType(Seq(
    StructField("city", StringType, nullable = true),
    StructField("state", StringType, nullable = true)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "false")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .schema(schema)
      .csv(path)
      .filter(col("city").isNotNull && col("state").isNotNull)

  /** Round-trip writer (one directory of part files — the distributed
    * shape; single-file CSV would force a coalesce(1) bottleneck).
    */
  def write(df: DataFrame, path: String): Unit =
    df.select("city", "state").write.mode("overwrite")
      .option("header", "false").csv(path)
}
