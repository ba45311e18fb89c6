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
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val us = e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      // parquet timestamp with isAdjustedToUTC=false reads as NTZ, which
      // unix_micros rejects; the session runs UTC, so casting pins the
      // same wall-clock instant the oracle's naive timestamp sees
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }
    e.withColumn("us", us)
  }
}
