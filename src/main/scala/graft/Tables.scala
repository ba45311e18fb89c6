package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver's testdata layout
  * (`<sfDir>/<name>.parquet`, see TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to epoch microseconds (`us`).
    *
    * The driver writes `ts` as parquet TIMESTAMP(NANOS), which Spark only
    * reads with `spark.sql.legacy.parquet.nanosAsLong=true` (as a BIGINT
    * of nanos); handle both that shape and a plain timestamp column.
    */
  def eventsWithUs(spark: SparkSession, dir: String): DataFrame = {
    val e = apply(spark, dir, "events")
    val us = e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => org.apache.spark.sql.functions.expr("ts div 1000")
      case _ => org.apache.spark.sql.functions.unix_micros(org.apache.spark.sql.functions.col("ts"))
    }
    e.withColumn("us", us)
  }
}
