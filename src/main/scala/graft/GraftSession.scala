package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory (SURVEY.md §2 E): one place where the
  * scale-sensitive knobs live so every main (Verify, Bench, user code)
  * runs the same engine configuration.
  *
  * - AQE on (default in Spark 4) with skew-join handling: runtime
  *   re-planning replaces hand-tuned partition counts at 100 TB.
  * - shuffle.partitions sized to the local core count here; on a real
  *   cluster this is executors×cores×2-3 or left to AQE coalescing.
  * - Broadcast threshold raised to 64 MB: every dimension table in this
  *   engine (polygons, centroids, nation/region/customer at test SFs,
  *   ANN probe sets) must broadcast — a shuffle join on the fact side is
  *   always the wrong plan for them.
  * - Parquet nanos-as-long: the driver testdata writes TIMESTAMP(NANOS).
  */
object GraftSession {

  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // the MERGE INTO-capable copy-on-write catalog (B43)
      .config("spark.sql.catalog.graft", classOf[graft.sources.UpsertCatalog].getName)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
