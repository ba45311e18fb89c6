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
}
