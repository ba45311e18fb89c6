package graft
/** Driver-run benchmark: every SparkEntry query timed end-to-end
  * (plan + execute + count) on SPARK_GRAFT_SF_DIR; one JSON line out.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // warm the parquet footers + JIT once so per-query numbers measure the
    // query, not first-touch costs (the driver compares totals; keep it in)
    Tables.names.foreach(n =>
      try Tables(spark, sfDir, n).count() catch { case _: Throwable => () })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
