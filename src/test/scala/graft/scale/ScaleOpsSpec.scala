package graft.scale

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class ScaleOpsSpec extends SparkTestBase {

  test("saltedJoin is row-identical to the plain join") {
    val l = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val dim = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = l.join(dim, Seq("l_orderkey"))
    val salted = ScaleOps.saltedJoin(l, dim, "l_orderkey", buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("boxAntiJoin equals the brute-force theta anti-join, with no nested loop") {
    val boxes = spark.range(300).select(col("id"),
      (col("id") * 7919L % 1000L).as("minx"),
      (col("id") * 7919L % 1000L + col("id") * 104729L % 30L).as("maxx"),
      (col("id") * 12347L % 1000L).as("miny"),
      (col("id") * 12347L % 1000L + col("id") * 31L % 25L).as("maxy"))
    val points = spark.range(5000)
      .select((col("id") * 48271L % 1030L).as("px"), (col("id") * 16807L % 1030L).as("py"))
    val fast = ScaleOps.boxAntiJoin(boxes, Seq("id"), points, 16L)
    val slow = boxes.join(broadcast(points),
      col("px").between(col("minx"), col("maxx"))
        && col("py").between(col("miny"), col("maxy")), "left_anti")
    assert(fast.select("id").exceptAll(slow.select("id")).count() == 0)
    assert(slow.select("id").exceptAll(fast.select("id")).count() == 0)
    assert(fast.count() > 0 && fast.count() < 300) // non-trivial on both sides
    assert(!fast.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("bucketed tables join without an exchange on the bucketed sides") {
    val l = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    ScaleOps.writeBucketed(l, "l_bucketed", 4, Seq("l_orderkey"))
    ScaleOps.writeBucketed(o, "o_bucketed", 4, Seq("l_orderkey"))
    val joined = ScaleOps.bucketedJoin(spark, "l_bucketed", "o_bucketed", Seq("l_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == l.join(o, Seq("l_orderkey")).count())
    spark.sql("DROP TABLE IF EXISTS l_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
