package graft

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (iteration aid;
    // the driver always runs the full surface with two args)
    val (sfDir, outDir, keep) = args match {
      case Array(s, o) => (s, o, (_: String) => true)
      case Array(s, o, names) =>
        val set = names.split(',').toSet
        (s, o, set.contains _)
    }
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    OracleJson.write(outDir, keep)
    spark.stop()
  }
}
