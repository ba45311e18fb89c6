package graft

/** Targeted correctness dump: like [[Verify]] but only for the query
  * names given as trailing args — fast inner loop for checking a single
  * new operator against its DuckDB oracle via tools/check.py.
  */
object Dump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val unknown = names.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries ${unknown.toSeq.sorted.mkString(", ")} — known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => names.contains(kv._1)).foreach {
      case (name, fn) =>
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    OracleJson.write(outDir, names.contains)
    spark.stop()
  }
}
