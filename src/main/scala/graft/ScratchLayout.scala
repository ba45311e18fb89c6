package graft

/** Throwaway measurement main for the composed_tables prep line (r19
  * guide-§1 profiling — deleted once the numbers are recorded in
  * OPTIMIZATION_r19.md).
  */
object ScratchLayout {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import org.apache.spark.sql.functions._
    def t[A](n: String)(b: => A): Unit = {
      val t0 = System.nanoTime()
      b
      println(f"[scratch] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val src = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM").as("l_month"))
    println("[scratch] months = " + src.select("l_month").distinct().count()
      + ", rows = " + src.count())
    t("noop scan+project")(src.write.format("noop").mode("overwrite").save())
    t("repartition(16,okey)+noop")(src.repartition(16, col("l_orderkey"))
      .write.format("noop").mode("overwrite").save())
    t("composed write, 16-task (shipped form)") {
      src.repartition(16, col("l_orderkey"))
        .write.format("parquet").partitionBy("l_month")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("cpx_a")
    }
    t("composed write, (month,bucket)-keyed repartition") {
      src.repartition(col("l_month"), expr("pmod(hash(l_orderkey), 16)"))
        .write.format("parquet").partitionBy("l_month")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("cpx_b")
    }
    t("composed write, 16-task, snappy") {
      src.repartition(16, col("l_orderkey"))
        .write.format("parquet").option("compression", "snappy")
        .partitionBy("l_month")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("cpx_c")
    }
    spark.stop()
  }
}
