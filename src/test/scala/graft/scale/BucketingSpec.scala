package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class BucketingSpec extends SparkTestBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  private lazy val tablesReady: Unit = {
    Bucketing.writeBucketed(
      Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_quantity"),
      "bk_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables(spark, sf, "orders").select("o_orderkey", "o_custkey"),
      "bk_orders", "o_orderkey", 8)
  }

  test("co-bucketed join on the bucket key plans with zero Exchange") {
    tablesReady
    val j = Bucketing.cobucketedJoin(spark, "bk_lineitem", "bk_orders",
      "l_orderkey", "o_orderkey")
    val plan = finalPlan(j)
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"), plan.take(2000))
    // one file per bucket (repartition(buckets, key) at write) lets the
    // scan expose the per-bucket sortBy order, which Spark 3+ only
    // consults behind this flag (SPARK-28595) — with it on, the SMJ
    // needs no Sort either
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j2 = Bucketing.cobucketedJoin(spark, "bk_lineitem", "bk_orders",
        "l_orderkey", "o_orderkey")
      val plan2 = finalPlan(j2)
      assert(!plan2.contains("Sort ["), plan2.take(2000))
      assert(!plan2.contains("Exchange"), plan2.take(2000))
    } finally spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    // row parity vs the plain (shuffled) join
    val expected = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(j.count() == expected)
  }

  test("aggregation on the bucket key reuses the bucket layout (no Exchange)") {
    tablesReady
    val agg = spark.table("bk_lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    val plan = finalPlan(agg)
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("b52 query key: only the 5-row priority rollup shuffles — never the orderkey") {
    val df = graft.relational.Queries.bucketedJoin(spark, sf)
    // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan"
    // section, which duplicates every node — assert on the final plan only
    val plan = finalPlan(df).split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    // the co-bucketed layout must leave exactly the two tiny
    // priority-side exchanges (the final rollup's hash partitioning and
    // the ORDER BY's range partitioning); any Exchange mentioning the
    // orderkey means the layout was not reused and the fact table
    // re-shuffled — the cost bucketing exists to eliminate
    val exLines = plan.split("\n").filter(_.contains("Exchange"))
    assert(exLines.forall(l => l.contains("o_orderpriority")),
      s"an Exchange off the priority rollup survived:\n${exLines.mkString("\n")}")
    assert(exLines.nonEmpty && exLines.length <= 2, plan.take(3000))
    // value sanity: every order with lineitems is counted exactly once
    val totalOrders = df.agg(sum("n_orders")).head.getLong(0)
    val expected = Tables(spark, sf, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(totalOrders == expected,
      s"b52 counted $totalOrders orders, expected $expected")
  }

  test("b53 query key: the month predicate prunes partitions at planning time") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE hides scans inside leaf QueryStageExec nodes — descend explicitly
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case q: QueryStageExec => allScans(q.plan)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    }.flatten
    val df = graft.relational.Queries.b53PartitionPrune(spark, sf)
    df.collect()
    val scans = allScans(df.queryExecution.executedPlan)
      .filter(_.tableIdentifier.exists(_.table.startsWith("pt53_")))
    assert(scans.nonEmpty, "no scan over the partitioned table in the plan")
    val scan = scans.head
    // the month equality must be a PARTITION filter (directory pruning,
    // resolved against the catalog listing), not a post-scan data filter
    assert(scan.partitionFilters.exists(_.toString.contains("o_month")),
      s"month predicate missing from PartitionFilters: ${scan.partitionFilters}")
    // and it must actually prune: the scan reads strictly fewer files
    // than the table holds (one month's directory out of many)
    val filesRead = scan.metrics("numFiles").value
    val table = scans.head.tableIdentifier.get.table
    val months = spark.table(table).select("o_month").distinct().count()
    assert(months > 1, "fixture has a single month — pruning untestable")
    val allFiles = {
      val full = spark.table(table)
      full.collect()
      allScans(full.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    }
    assert(filesRead > 0 && filesRead < allFiles,
      s"scan read $filesRead of $allFiles files — no pruning happened")
    // layout never changes answers: plain recompute on the raw table
    val m0 = Tables(spark, sf, "orders")
      .agg(date_format(min("o_orderdate"), "yyyy-MM")).head.getString(0)
    val want = Tables(spark, sf, "orders")
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === m0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(o_totalprice * 100.0) AS BIGINT)")).as("r"))
      .orderBy("o_orderpriority").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    val got = df.collect()
      .map(x => (x.getString(1), x.getLong(2), x.getLong(3))).toSeq
    assert(got == want)
  }

  test("b54 query key: partition pruning AND bucket reuse compose in one plan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case q: QueryStageExec => allScans(q.plan)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    }.flatten
    val df = graft.relational.Queries.b54ComposedLayout(spark, sf)
    df.collect()
    // lever 1 — partition pruning: the month equality is a PARTITION
    // filter on the composed table's scan, and it actually prunes
    val scans = allScans(df.queryExecution.executedPlan)
      .filter(_.tableIdentifier.exists(_.table.startsWith("cp54_")))
    assert(scans.nonEmpty, "no scan over the composed table in the plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("l_month")),
      s"month predicate missing from PartitionFilters: ${scan.partitionFilters}")
    val table = scan.tableIdentifier.get.table
    val months = spark.table(table).select("l_month").distinct().count()
    assert(months > 1, "fixture has a single month — pruning untestable")
    val filesRead = scan.metrics("numFiles").value
    val allFiles = {
      val full = spark.table(table)
      full.collect()
      allScans(full.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    }
    assert(filesRead > 0 && filesRead < allFiles,
      s"scan read $filesRead of $allFiles files — no pruning happened")
    // lever 2 — bucket reuse: in the SAME executed plan, the orderkey
    // agg and the join to the co-bucketed orders table shuffle nothing;
    // only the priority rollup + its ORDER BY may Exchange
    val plan = {
      val s = df.queryExecution.executedPlan.toString
      s.split("== Initial Plan ==")(0)
    }
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    val exLines = plan.split("\n").filter(_.contains("Exchange"))
    assert(exLines.forall(_.contains("o_orderpriority")),
      s"an Exchange off the priority rollup survived:\n${exLines.mkString("\n")}")
    assert(exLines.nonEmpty && exLines.length <= 2, plan.take(3000))
    // layout never changes answers: plain recompute on the raw tables
    val m0 = Tables(spark, sf, "lineitem")
      .agg(date_format(min("l_shipdate"), "yyyy-MM")).head.getString(0)
    val want = Tables(spark, sf, "lineitem")
      .filter(date_format(col("l_shipdate"), "yyyy-MM") === m0)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_c"))
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("n_items").as("ni"), sum("qty_c").as("qc"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("point filter on the bucket key prunes to a single bucket") {
    tablesReady
    // a bare filter doesn't need the bucketing DISTRIBUTION, so AQE's
    // auto-bucketed-scan turns bucketed reading off for parallelism;
    // force it on to exercise bucket pruning (a real deployment leaves
    // this on for point-lookup-heavy tables)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val key = spark.table("bk_lineitem").select(min("l_orderkey")).head.getLong(0)
      val q = spark.table("bk_lineitem").filter(col("l_orderkey") === key)
      val plan = finalPlan(q)
      // FileSourceScanExec reports bucket pruning as SelectedBucketsCount
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(2000))
    } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }
}
