package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class BottomKSpec extends SparkTestBase {

  test("bottom_k equals sorted-distinct-take-k, independent of partitioning") {
    val ev = Tables.eventsWithUs(spark, sf)
      .select(col("event_type"), (col("us") % 1000003L).as("v"))
    val got = ev.repartition(17) // force many partial buffers to merge
      .groupBy("event_type").agg(aggs.bottom_k(col("v"), 8).as("bk"))
    val want = ev.distinct()
      .groupBy("event_type").agg(slice(array_sort(collect_set("v")), 1, 8).as("bk"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("bottom_k dedups and returns the whole set when k exceeds group size") {
    val df = spark.range(0, 100)
      .select((col("id") % 5).as("g"), (col("id") % 10).as("v"))
    val r = df.groupBy("g").agg(aggs.bottom_k(col("v"), 64).as("bk"))
    // each group sees only 2 distinct values (id%10 restricted by id%5)
    assert(r.filter(size(col("bk")) =!= 2).count() == 0)
  }

  test("bottom_k is registered as a SQL function via GraftExtensions") {
    Tables(spark, sf, "orders").createOrReplaceTempView("bk_orders_v")
    val r = spark.sql(
      "SELECT bottom_k(o_custkey, 3) AS bk FROM bk_orders_v").head
    val arr = r.getSeq[Long](0)
    assert(arr.length == 3 && arr == arr.sorted)
  }
}
