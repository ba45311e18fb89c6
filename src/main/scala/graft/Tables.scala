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

  /** The ONE events read every event-family query goes through: the raw
    * table minus quarantined (NULL event-time) rows — the b55 ingest
    * contract, the events twin of `EmbedQueries.vectors`. A NULL `ts`
    * is the job-killing/diverging class the r16 probe proved: the typed
    * session encoder CRASHES on it (NOT_NULL_ASSERT_VIOLATION — one
    * poisoned row kills a corpus-wide job), watermarked streams silently
    * drop it while batch windows keep a NULL bucket, and epoch-µs window
    * frames emit NULL bounds — the engines diverge on exactly the rows
    * the contract removes. The oracle twin is [[fevCte]]; the
    * quarantine REPORT over the raw table is b55_event_quarantine.
    * NULL user_id / event_type / value are NOT quarantined: they are
    * reported by b55 but outside the generated domain (neither the
    * driver testdata nor the fuzz corpus plants them — the typed
    * D-block folds' primitive-Long encoders assume them non-null, the
    * same crash class `ts` had; §7n records this as the scoped
    * residual).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    apply(spark, dir, "events").filter(col("ts").isNotNull)
  }

  /** DuckDB twin of [[events]]. Every oracle SQL that reads the events
    * table routes through this CTE (pasted verbatim — a spec pins the
    * text, so a drifted copy fails CI); the sole raw-table reader is
    * b55's quarantine report itself.
    */
  val fevCte: String = "fev AS (SELECT * FROM events WHERE ts IS NOT NULL)"

  /** `events` with `ts` normalized to epoch microseconds (`us`).
    *
    * The driver writes `ts` as parquet TIMESTAMP(NANOS), which Spark only
    * reads with `spark.sql.legacy.parquet.nanosAsLong=true` (as a BIGINT
    * of nanos); handle both that shape and a plain timestamp column.
    */
  def eventsWithUs(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir) // quarantined view — the b55 contract
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
