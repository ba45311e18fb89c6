package graft.relational

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class RelationalSpec extends SparkTestBase {

  test("b1 pricing summary: cent sums are exact and groups are complete") {
    val r = Queries.pricingSummary(spark, sf)
    assert(r.count() > 0)
    assert(r.filter(col("sum_qty_c") <= 0 || col("count_order") <= 0).count() == 0)
  }

  test("b2 top-unshipped returns at most 10 rows in strict revenue order") {
    val rows = Queries.topUnshipped(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Long]("revenue_c"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("b4 top-k per group: at most 3 per segment, ranks 1..3 contiguous") {
    val r = Queries.topkPerGroup(spark, sf)
    val bad = r.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
      .filter(col("n") > 3 || col("maxrk") =!= col("n")).count()
    assert(bad == 0)
  }

  test("b5 sessionization: session bounds ordered, gaps within sessions <= 30min") {
    val s = Queries.eventSessions(spark, sf)
    assert(s.filter(col("start_us") > col("end_us")).count() == 0)
    // sessions of one user must not overlap and must be separated by > gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sess_seq")
    val overlaps = s.withColumn("prev_end", lag("end_us", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_us") - col("prev_end") <= 1800000000L).count()
    assert(overlaps == 0)
  }

  test("b6 windowed agg event count equals total events") {
    val total = Queries.eventWindowed(spark, sf).agg(sum("n")).head.getLong(0)
    assert(total == Tables(spark, sf, "events").count())
  }

  test("b9 as-of join: click precedes its error, and it is the LATEST such click") {
    val ev = Tables.eventsWithUs(spark, sf)
    val r = Queries.asofJoin(spark, sf)
    assert(r.count() > 0)
    assert(r.filter(col("gap_us") < 0).count() == 0)
    // no click of the same user lies strictly between the matched click
    // and the error (i.e. the match is the most recent prior click)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("other_us"))
    val skipped = r.join(clicks, "user_id")
      .filter(col("other_us") > col("click_us") && col("other_us") <= col("err_us"))
    assert(skipped.count() == 0)
    // errors with an earlier click are all matched (inner as-of completeness)
    val expected = ev.filter(col("event_type") === "error").as("e")
      .join(clicks.as("c"), col("e.user_id") === col("c.user_id")
        && col("c.other_us") <= col("e.us"), "leftsemi")
      .count()
    assert(r.count() == expected)
  }

  test("b11 rollup: per-year totals sum detail rows, grand total covers all orders") {
    val r = Queries.rollupRevenue(spark, sf).collect()
    val detail = r.filter(_.getAs[Long]("gid") == 0)
    val years = r.filter(_.getAs[Long]("gid") == 1)
    val grand = r.filter(_.getAs[Long]("gid") == 3)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_orders") == Tables(spark, sf, "orders").count())
    assert(detail.map(_.getAs[Long]("sum_price_c")).sum ==
      grand.head.getAs[Long]("sum_price_c"))
    assert(years.map(_.getAs[Long]("n_orders")).sum ==
      grand.head.getAs[Long]("n_orders"))
  }

  test("b12 small-qty revenue: integer threshold agrees with the double form") {
    val r = Queries.smallQtyRevenue(spark, sf)
    assert(r.count() > 0)
    // the integer predicate 5*qty_c*cnt < sum_qty_c must equal qty < 0.2*avg
    val l = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_quantity"))
    val avg20 = l.groupBy("l_partkey").agg((avg("l_quantity") * 0.2).as("thr"))
    val expected = l.join(avg20, "l_partkey")
      .filter(col("l_quantity") < col("thr")).count()
    assert(r.agg(sum("n_small")).head.getLong(0) == expected)
  }

  test("b13 lapsed customers: non-empty, none has a recent order, all above mean") {
    val r = Queries.noOrderCustomers(spark, sf)
    assert(r.count() > 0)
    val c = Tables(spark, sf, "customer")
    val recent = Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit(Queries.LapsedCutoff).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val meanPos = c.filter(col("c_acctbal") > 0).agg(avg("c_acctbal")).head.getDouble(0)
    val expected = c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .filter(col("c_acctbal") * 100 > meanPos * 100 - 1e-6).count()
    assert(r.agg(sum("n_cust")).head.getLong(0) == expected)
  }

  test("b14 exists-returned: semi join counts match a distinct-key join") {
    val r = Queries.existsReturned(spark, sf)
    val expected = Tables(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(r.agg(sum("n_orders")).head.getLong(0) == expected)
  }

  test("b15 KMV sketch: exact below k, estimate within 50% above k") {
    val r = Queries.distinctSketch(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getAs[Long]("n_exact")
      val nk = row.getAs[Long]("n_k")
      val est = row.getAs[Long]("est_distinct")
      assert(nk <= Queries.KmvK)
      if (nk < Queries.KmvK) assert(est == nk)
      // k=64 gives ~12% expected relative error; 50% is a loose gate that
      // still catches an off-by-bucket or wrong-modulus estimator
      else assert(math.abs(est - exact).toDouble / exact < 0.5,
        s"ym=${row.getAs[Long]("ym")} est=$est exact=$exact")
    }
  }

  test("b17 native session_window agrees with B5's lag/cumsum sessions on real data") {
    val b5 = Queries.eventSessions(spark, sf)
      .select("user_id", "start_us", "end_us", "n_events", "sum_value_c")
    val b17 = Queries.sessionWindow(spark, sf)
    // the testdata has no exactly-30-min gaps, so the two gap semantics
    // (> vs >=) coincide and the constructions must agree row-for-row
    assert(b17.count() == b5.count())
    assert(b17.exceptAll(b5).count() == 0 && b5.exceptAll(b17).count() == 0)
  }

  test("b17 session_window merges touching sessions: exactly-30-min gap does NOT split") {
    import spark.implicits._
    val gap = 1800000000L
    def sessions(usVals: Long*): Long = usVals.map((1L, _)).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("event_time"))
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .count().count()
    // this pins the boundary semantics the b17 oracle encodes (B5's >):
    // an event at exactly last+gap extends; one microsecond later splits
    assert(sessions(0L, gap) == 1)
    assert(sessions(0L, gap + 1) == 2)
  }

  test("b18 pivot cells sum to the total revenue and cover every order") {
    val r = Queries.pivotRevenue(spark, sf)
    val cellSum = r.select(Queries.PivotYears.map(y => sum(col("y" + y))): _*)
      .head().toSeq.map { case l: Long => l case null => 0L }.sum
    val want = Tables(spark, sf, "orders")
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head().getLong(0)
    assert(cellSum == want)
  }

  test("b10 bucketed range join matches the naive theta-join row set exactly") {
    val ev = Tables.eventsWithUs(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("click_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("us").as("err_us"))
    val naive = errors.join(clicks, Seq("user_id"))
      .filter(col("click_us").between(col("err_us") - Queries.RangeWindowUs, col("err_us")))
      .select("event_id", "user_id", "err_us", "click_id", "click_us")
    val got = Queries.rangeJoin(spark, sf)
    assert(got.count() == naive.count())
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0)
  }

  test("b20 cube: all four grouping sets present, each slice sums to the grand total") {
    val r = Queries.cubeRevenue(spark, sf)
    val nOrders = Tables(spark, sf, "orders").count()
    // gid 0 = (year, region), 1 = year only, 2 = region only, 3 = total
    assert(r.select("gid").distinct().count() == 4)
    val byGid = r.groupBy("gid").agg(sum("n_orders").as("n"), sum("sum_price_c").as("s"))
      .collect().map(row => row.getAs[Long]("gid") -> (row.getAs[Long]("n"), row.getAs[Long]("s"))).toMap
    // every grouping set partitions the same fact rows
    assert(byGid.values.map(_._1).toSet == Set(nOrders))
    assert(byGid.values.map(_._2).toSet.size == 1)
    // grand total is a single row with both dims collapsed
    assert(r.filter(col("gid") === 3).count() == 1)
    assert(r.filter(col("gid") === 3 && (col("o_year") =!= -1 || col("r_name") =!= "ALL")).count() == 0)
  }

  test("b21 salted enrich equals the plain unsalted join, and the dim is not broadcast") {
    val r = Queries.saltedEnrich(spark, sf)
    // plain-join reference computed inline (the oracle's shape)
    val cents = (c: org.apache.spark.sql.Column) => round(c * lit(100.0), 0).cast("long")
    val fact = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"), cents(col("value")).as("value_c"))
    val dim = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("spend_c"))
    val plain = fact.join(dim, Seq("user_id"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("n_orders").isNotNull, 1L).otherwise(0L)).as("n_with_history"),
        sum("value_c").as("sum_value_c"),
        sum(coalesce(col("n_orders"), lit(0L))).as("sum_orders"),
        sum(coalesce(col("spend_c"), lit(0L))).as("sum_spend_c"))
    assert(r.exceptAll(plain).count() == 0 && plain.exceptAll(r).count() == 0)
    // the de-skew demo must exercise the SHUFFLE path: no broadcast join
    // of the salted dim even though it is tiny at test scale
    val plan = Queries.saltedEnrich(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), "salted dim was broadcast — hint lost")
  }

  test("b22 avg-qty filter equals a per-part window-average recompute") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_partkey")
    val survivors = Tables(spark, sf, "lineitem")
      .withColumn("qty_c", round(col("l_quantity") * 100.0, 0).cast("long"))
      .withColumn("sum_c", sum("qty_c").over(w))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("qty_c") * col("n") * 5 < col("sum_c"))
    val r = Queries.avgQtyRevenue(spark, sf)
    assert(r.count() > 0)
    assert(r.agg(sum("n_small")).head.getLong(0) == survivors.count())
    // the cross-multiplied predicate is the exact 20%-of-average test
    assert(survivors
      .filter(!(col("qty_c").cast("double") < col("sum_c").cast("double") / col("n") / 5.0))
      .count() == 0)
  }

  test("b23 moving average: RANGE frame equals a brute-force trailing-week recompute") {
    val r = Queries.movingAvgRevenue(spark, sf)
    assert(r.count() > 0)
    // frame bounds: between 1 and 7 days present in any trailing week
    assert(r.filter(col("n_days_7") < 1 || col("n_days_7") > 7).count() == 0)
    // brute force: for each (priority, day d), re-sum rev_c over the
    // days present in [d-6, d] via a self-join — no window involved
    val daily = r.select(col("priority"), col("day_idx"), col("rev_c"))
    val brute2 = daily.toDF("priority", "d", "rc")
      .join(daily, Seq("priority"))
      .filter(col("day_idx").between(col("d") - 6, col("d")))
      .groupBy(col("priority"), col("d").as("day_idx"))
      .agg(sum("rev_c").as("brute_rev"), count(lit(1)).as("brute_days"))
    val j = r.join(brute2, Seq("priority", "day_idx"))
    assert(j.count() == r.count())
    assert(j.filter(col("rev_7d_c") =!= col("brute_rev")).count() == 0)
    assert(j.filter(col("n_days_7") =!= col("brute_days")).count() == 0)
    // gaps exist at sf0.001 (not every priority ships every day), so the
    // RANGE-vs-ROWS distinction is actually exercised
    assert(r.filter(col("n_days_7") < 7).count() > 0)
  }

  test("b24 set ops equal the one-pass full-outer tagging, all statuses occur") {
    val r = Queries.setOpsRetention(spark, sf)
    def yr(y: Int) = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    val fo = yr(1995).withColumn("a", lit(1))
      .join(yr(1996).withColumn("b", lit(1)), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        when(col("a").isNotNull && col("b").isNotNull, "retained")
          .when(col("a").isNotNull, "lapsed").otherwise("acquired").as("status"))
    assert(r.count() == fo.count())
    assert(r.exceptAll(fo).count() == 0 && fo.exceptAll(r).count() == 0)
    Seq("retained", "lapsed", "acquired").foreach(s =>
      assert(r.filter(col("status") === s).count() > 0, s))
    // a customer appears exactly once — the three branches partition
    assert(r.groupBy("o_custkey").count().filter(col("count") > 1).count() == 0)
  }

  test("b25 unpivot round-trips b18's pivot back to the plain groupBy") {
    val long = Queries.unpivotRevenue(spark, sf)
    val direct = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")).between(
        Queries.PivotYears.head, Queries.PivotYears.last))
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(round(col("o_totalprice") * 100.0, 0).cast("long")).as("revenue_c"))
    assert(long.count() > 0 && long.count() == direct.count())
    assert(long.exceptAll(direct).count() == 0 && direct.exceptAll(long).count() == 0)
  }

  test("b26 NOT IN three-valued logic: corners pinned and NAAJ planned as hash join") {
    val r = Queries.notInNulls(spark, sf).head()
    val nNotExists = r.getLong(r.fieldIndex("n_not_exists"))
    val nNotIn = r.getLong(r.fieldIndex("n_not_in"))
    val nNotInNull = r.getLong(r.fieldIndex("n_not_in_null"))
    val nOuterNull = r.getLong(r.fieldIndex("n_outer_null"))
    // non-null keys on both sides → NOT IN and NOT EXISTS agree exactly
    assert(nNotIn == nNotExists && nNotIn > 0)
    // a NULL in the subquery makes NOT IN UNKNOWN for every outer row
    assert(nNotInNull == 0L)
    // one passing outer key nulled → exactly one fewer survivor
    assert(nOuterNull == nNotIn - 1)
    // the null-aware anti joins must plan as hash joins (the
    // ExtractSingleColumnNullAwareAntiJoin rewrite), never an anti NLJ —
    // the whole point of expressing NOT IN this way at scale
    val lines = Queries.notInNulls(spark, sf).queryExecution.executedPlan
      .toString.linesIterator.toSeq
    assert(!lines.exists(l =>
        l.contains("BroadcastNestedLoopJoin") && l.contains("LeftAnti")),
      "null-aware anti join fell back to a nested-loop scan")
    assert(lines.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      "expected hash anti joins")
  }

  test("b27 distribution window: ranks over the aggregated dim frame are total and bounded") {
    val r = Queries.nationPercentile(spark, sf).localCheckpoint()
    val n = r.count()
    assert(n > 0 && n <= 25) // one row per nation — the window input IS the dim
    // percent_rank spans [0, 1] starting at 0; cume_dist ends at exactly 1
    assert(r.agg(min("pct_rank")).head().getDouble(0) == 0.0)
    assert(r.agg(max("cume")).head().getDouble(0) == 1.0)
    // quartiles partition the frame into 4 near-equal groups (ntile
    // contract: sizes differ by at most 1)
    val sizes = r.groupBy("quartile").count().collect().map(_.getLong(1))
    assert(sizes.length == math.min(4, n.toInt))
    assert(sizes.max - sizes.min <= 1)
    // the distribution functions agree with their definitions on the
    // revenue total order: pct_rank = (rank−1)/(n−1) under a tie-free
    // ordering, recomputed directly from the revenue column
    val rows = r.orderBy(col("revenue_c").desc, col("n_name")).collect()
    rows.zipWithIndex.foreach { case (row, i) =>
      val expect = BigDecimal(i.toDouble / (n - 1).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getDouble(row.fieldIndex("pct_rank")) == expect)
    }
  }

  test("b28 date spine: contiguous calendar, zero-filled gaps, conserved totals") {
    val r = Queries.dateSpineRevenue(spark, sf).localCheckpoint()
    val bounds = r.agg(min("day_idx"), max("day_idx"), count(lit(1))).head()
    // one row per calendar day between the observed extremes, no holes
    assert(bounds.getLong(2) == bounds.getLong(1) - bounds.getLong(0) + 1)
    // gap rows are exactly the zero-activity days
    assert(r.filter(col("is_gap") === 1L &&
      (col("n_orders") =!= 0L || col("rev_c") =!= 0L)).count() == 0)
    assert(r.filter(col("is_gap") === 0L && col("n_orders") === 0L).count() == 0)
    // the running total ends at the corpus total revenue
    val totalC = graft.Tables(spark, sf, "orders")
      .agg(sum(round(col("o_totalprice") * 100.0, 0).cast("long"))).head.getLong(0)
    assert(r.orderBy(col("day_idx").desc).select("cum_rev_c").head.getLong(0) == totalC)
  }

  test("b29 streaks: brute-force recompute per customer agrees") {
    val r = Queries.orderStreaks(spark, sf).collect()
      .map(x => x.getAs[Long]("o_custkey") ->
        (x.getAs[Long]("n_active"), x.getAs[Long]("n_streaks"),
          x.getAs[Long]("max_streak"), x.getAs[Long]("best_start"))).toMap
    val months = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12L + month(col("o_orderdate")) - 1L).as("m"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toVector)
    assert(r.keySet == months.keys.toSet)
    months.foreach { case (cust, ms) =>
      // walk the sorted month list, cutting where the gap exceeds 1
      val runs = ms.foldLeft(Vector.empty[Vector[Long]]) { (acc, m) =>
        if (acc.nonEmpty && acc.last.last == m - 1) acc.init :+ (acc.last :+ m)
        else acc :+ Vector(m)
      }
      val best = runs.maxBy(run => (run.length, -run.head))
      val (nActive, nStreaks, maxStreak, bestStart) = r(cust)
      assert(nActive == ms.length && nStreaks == runs.length)
      assert(maxStreak == best.length && bestStart == best.head)
    }
  }

  test("b30 multi-distinct: one Expand pass, values agree with separate jobs") {
    val df = Queries.multiDistinct(spark, sf)
    // Catalyst plans the two COUNT(DISTINCT) via a single Expand — the
    // one-pass contract (a per-distinct-column rescan would show none)
    assert(df.queryExecution.executedPlan.toString.contains("Expand"))
    val r = df.collect().map(x => x.getString(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    val orders = graft.Tables(spark, sf, "orders")
    r.foreach { case (prio, (nc, nm, no)) =>
      val o = orders.filter(col("o_orderpriority") === prio)
      assert(nc == o.select("o_custkey").distinct().count())
      assert(nm == o.select(year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .distinct().count())
      assert(no == o.count())
    }
  }

  test("b31 scd2: intervals tile each user's history, types compress, one open tail") {
    val r = Queries.scd2Intervals(spark, sf).localCheckpoint()
    // exactly one current (open) interval per user
    val users = r.select("user_id").distinct().count()
    assert(r.filter(col("is_current") === 1L).count() == users)
    // versions are 1..n per user
    val badV = r.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("version").as("mx"), min("version").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(badV.count() == 0)
    // adjacent intervals: to == next from, and the type actually changes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val adj = r.select(col("user_id"), col("version"), col("event_type"),
        col("effective_from"), col("effective_to"))
      .withColumn("nxt_from", lead("effective_from", 1).over(w))
      .withColumn("nxt_type", lead("event_type", 1).over(w))
    assert(adj.filter(col("nxt_from").isNotNull &&
      col("effective_to") =!= col("nxt_from")).count() == 0)
    assert(adj.filter(col("nxt_type").isNotNull &&
      col("nxt_type") === col("event_type")).count() == 0)
    // brute-force recompute: per user, sort by (ts, event_id), compress
    // equal-type runs — the interval list must match row for row
    val ev = graft.Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getAs[java.time.LocalDateTime](1), x.getLong(2),
        x.getString(3)))
      .groupBy(_._1)
    val got = r.collect().map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("version")) ->
      (x.getAs[String]("event_type"), x.getAs[java.time.LocalDateTime]("effective_from"),
        Option(x.getAs[java.time.LocalDateTime]("effective_to")))).toMap
    var expected = 0
    ev.foreach { case (uid, rows) =>
      val sorted = rows.sortBy(t =>
        (t._2.toEpochSecond(java.time.ZoneOffset.UTC), t._2.getNano, t._3)).toVector
      val starts = sorted.zipWithIndex.filter { case (t, i) =>
        i == 0 || sorted(i - 1)._4 != t._4
      }.map(_._1)
      expected += starts.length
      starts.zipWithIndex.foreach { case (s, v) =>
        val (tpe, from, to) = got((uid, v + 1L))
        assert(tpe == s._4 && from == s._2)
        val nextFrom = if (v + 1 < starts.length) Some(starts(v + 1)._2) else None
        assert(to == nextFrom)
      }
    }
    assert(got.size == expected)
  }

  test("b32 percentile_cont: brute-force sorted-list interpolation agrees") {
    val out = Queries.percentileCont(spark, sf).collect()
    assert(out.nonEmpty)
    val prices = graft.Tables(spark, sf, "orders")
      .select(col("o_orderpriority"),
        (round(col("o_totalprice") * 100.0, 0).cast("long") / 100L).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector)
    out.foreach { r =>
      val (prio, q) = (r.getString(0), r.getAs[Long]("q_ppm"))
      val vs = prices(prio)
      val t = (vs.length - 1L) * q
      val lo = (t / 1000000L).toInt
      val hi = ((t + 999999L) / 1000000L).toInt
      val frac = t % 1000000L
      val expect = vs(lo) * 1000000L + frac * (vs(hi) - vs(lo))
      assert(r.getAs[Long]("pct_micro") == expect, s"$prio q=$q")
      assert(r.getAs[Long]("n") == vs.length)
    }
  }

  test("b33 grouping sets: exactly 3 slices, each re-summing to the grand total") {
    val r = Queries.groupingSetsRevenue(spark, sf).collect()
    val byGid = r.groupBy(_.getAs[Long]("gid"))
    // sets (year)=1, (prio)=2, ()=3 — and NO (year, prio) cross cells (gid 0)
    assert(byGid.keySet == Set(1L, 2L, 3L))
    val total = byGid(3L) match { case Array(row) => row.getAs[Long]("rev_c") }
    Seq(1L, 2L).foreach { gid =>
      assert(byGid(gid).map(_.getAs[Long]("rev_c")).sum == total, s"slice $gid")
    }
    // year slice carries the ALL sentinel for prio and vice versa
    assert(byGid(1L).forall(_.getAs[String]("prio") == "ALL"))
    assert(byGid(2L).forall(_.getAs[Long]("o_year") == -1L))
  }

  test("b34 cumulative distinct: brute-force prefix recompute per priority") {
    val out = Queries.cumulativeDistinct(spark, sf).collect()
    assert(out.nonEmpty)
    val src = graft.Tables(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_custkey"),
        (year(col("o_orderdate")) * 12L + month(col("o_orderdate")) - 1L).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { r =>
      val (prio, m) = (r.getString(0), r.getAs[Long]("month_idx"))
      val upTo = src.filter(t => t._1 == prio && t._3 <= m).map(_._2).distinct.size
      val inMonth = src.filter(t => t._1 == prio && t._3 == m).map(_._2).distinct.size
      assert(r.getAs[Long]("cum_distinct") == upTo, s"$prio $m")
      assert(r.getAs[Long]("n_active_custs") == inMonth)
      assert(r.getAs[Long]("new_custs") <= inMonth && inMonth <= upTo)
    }
  }

  test("b35 merge upsert: brute-force classification per customer") {
    val out = Queries.mergeUpsert(spark, sf).collect()
    assert(out.nonEmpty)
    val orders = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val old = orders.filter(_._2 < Queries.MergeCut).groupBy(_._1)
    val nw = orders.filter(_._2 >= Queries.MergeCut).groupBy(_._1)
    assert(out.map(_.getAs[Long]("cust")).toSet == old.keySet ++ nw.keySet)
    out.foreach { r =>
      val c = r.getAs[Long]("cust")
      val (oc, nc) = (old.get(c).map(_.length).getOrElse(0), nw.get(c).map(_.length).getOrElse(0))
      val expect =
        if (oc > 0 && nc > 0) "update"
        else if (oc == 0) "insert"
        else if (old(c).map(_._2).max < Queries.DormantCut) "delete" else "keep"
      assert(r.getAs[String]("action") == expect, s"cust $c")
      assert(r.getAs[Long]("old_cnt") == oc && r.getAs[Long]("new_cnt") == nc)
      val mergedC = if (expect == "delete") 0L
        else old.get(c).map(_.map(_._3).sum).getOrElse(0L) +
          nw.get(c).map(_.map(_._3).sum).getOrElse(0L)
      assert(r.getAs[Long]("merged_cnt") == (if (expect == "delete") 0 else oc + nc))
      assert(r.getAs[Long]("merged_price_c") == mergedC)
    }
    // all four branches actually occur at this sf
    assert(out.map(_.getAs[String]("action")).toSet == Set("update", "insert", "delete", "keep"))
  }

  test("b37 retention cohorts: brute-force matrix recompute, age-0 diagonal full") {
    val out = Queries.retentionCohorts(spark, sf).collect()
    assert(out.nonEmpty)
    val src = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12L + month(col("o_orderdate")) - 1L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstM = src.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = src.map { case (c, m) => (firstM(c), m - firstM(c), c) }
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).distinct.size.toLong).toMap
    assert(out.map(r => ((r.getAs[Long]("cohort"), r.getAs[Long]("age")),
      r.getAs[Long]("n_active"))).toMap == expect.toMap)
    out.foreach { r =>
      val size = expect((r.getAs[Long]("cohort"), 0L))
      assert(r.getAs[Long]("cohort_size") == size)
      assert(r.getAs[Long]("retention_ppm") == r.getAs[Long]("n_active") * 1000000L / size)
      // at age 0 every cohort member is active by definition
      if (r.getAs[Long]("age") == 0L) assert(r.getAs[Long]("retention_ppm") == 1000000L)
    }
  }

  test("b42 ratio-to-report: shares sum to 1e6 per region and globally") {
    val out = Queries.ratioToReport(spark, sf).collect()
    assert(out.nonEmpty)
    // per region, nation revenues re-sum to the region total and
    // integer-division shares sum within nation-count slack of 1e6
    out.groupBy(_.getString(0)).values.foreach { g =>
      assert(g.map(_.getAs[Long]("rev_c")).sum == g.head.getAs[Long]("region_rev_c"))
      val s = g.map(_.getAs[Long]("region_share_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - g.length)
    }
    val gs = out.map(_.getAs[Long]("global_share_ppm")).sum
    assert(gs <= 1000000L && gs > 1000000L - out.length)
    // exact recompute of one nation from raw joins
    val r0 = out.head
    val direct = graft.Tables(spark, sf, "orders")
      .join(graft.Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === r0.getString(1))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))).head.getLong(0)
    assert(direct == r0.getAs[Long]("rev_c"))
  }

  test("b41 late supplier: brute-force Q21-shape recompute") {
    val out = Queries.lateSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    val li = graft.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val blame = li.groupBy(_._1).values.flatMap { g =>
      val maxd = g.map(_._3).max
      val supps = g.map(_._2).distinct
      val late = g.filter(_._3 == maxd).map(_._2).distinct
      if (supps.size >= 2 && late.size == 1) Some(late.head) else None
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = blame.toSeq.sortBy { case (s, n) => (-n, s) }
      .take(Queries.BlameTopK)
    assert(out.map(r => (r.getAs[Long]("l_suppkey"),
      r.getAs[Long]("n_blamed_orders"))).toSeq == expect)
  }

  test("b40 order fanout: count-of-counts recompute, mass conserved") {
    val out = Queries.orderFanout(spark, sf).collect()
    val li = graft.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), round(col("l_extendedprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perOrder = li.groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum))
    val expect = perOrder.values.toSeq.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    assert(out.map(r => (r.getAs[Long]("k"),
      (r.getAs[Long]("n_orders"), r.getAs[Long]("sum_rev_c")))).toMap == expect.toMap)
    assert(out.map(r => r.getAs[Long]("k") * r.getAs[Long]("n_orders")).sum == li.length)
  }

  test("b39 ship latency: histogram mass equals lineitem count, days plausible") {
    val out = Queries.shipLatency(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_items")).sum ==
      graft.Tables(spark, sf, "lineitem").count())
    // the synthetic dates are uncorrelated, so days span at most the
    // whole 1992-1998 date range in either direction
    assert(out.forall(r => math.abs(r.getAs[Long]("days")) <= 2600))
    // spot-check one (prio, days) cell against a direct recompute
    val r = out.maxBy(_.getAs[Long]("n_items"))
    val direct = graft.Tables(spark, sf, "orders")
      .join(graft.Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderpriority") === r.getString(0) &&
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          === r.getAs[Long]("days"))
      .count()
    assert(direct == r.getAs[Long]("n_items"))
  }

  test("b38 MoM growth: brute-force monthly recompute, lag/delta/ppm consistent") {
    val out = Queries.momGrowth(spark, sf).collect()
    assert(out.length > 12)
    val monthly = graft.Tables(spark, sf, "orders")
      .select((year(col("o_orderdate")) * 12L + month(col("o_orderdate")) - 1L).as("m"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val months = monthly.keys.toSeq.sorted
    assert(out.map(_.getAs[Long]("month_idx")).toSeq == months)
    out.zipWithIndex.foreach { case (r, i) =>
      val m = r.getAs[Long]("month_idx")
      assert(r.getAs[Long]("n_orders") == monthly(m)._1)
      assert(r.getAs[Long]("rev_c") == monthly(m)._2)
      if (i == 0) assert(r.isNullAt(r.fieldIndex("growth_ppm")))
      else {
        val prev = monthly(months(i - 1))._2
        assert(r.getAs[Long]("prev_rev_c") == prev)
        assert(r.getAs[Long]("delta_c") == monthly(m)._2 - prev)
        assert(r.getAs[Long]("growth_ppm") == (monthly(m)._2 - prev) * 1000000L / prev)
      }
    }
  }

  test("b36 above-avg: brute-force recompute; the correlated subquery decorrelates") {
    val df = Queries.aboveAvg(spark, sf)
    val out = df.collect()
    assert(out.nonEmpty)
    val orders = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCust = orders.groupBy(_._1)
    val expect = orders.filter { case (c, _, p) =>
      val g = byCust(c); 2 * p * g.length > 3 * g.map(_._3).sum
    }.map(t => (t._1, t._2)).sortBy(identity)
    assert(out.map(r => (r.getAs[Long]("cust"), r.getAs[Long]("o_orderkey"))).toSeq == expect.toSeq)
    out.foreach { r =>
      val g = byCust(r.getAs[Long]("cust"))
      assert(r.getAs[Long]("n_orders") == g.length)
      assert(r.getAs[Long]("sum_c") == g.map(_._3).sum)
    }
    // Catalyst decorrelated: no scalar subqueries survive optimization
    assert(!df.queryExecution.optimizedPlan.toString.contains("scalar-subquery"))
  }

  test("b45 LATERAL top-n == the window top-k form, row for row") {
    val df = Queries.lateralTopn(spark, sf)
    val out = df.collect()
    assert(out.nonEmpty)
    // brute force: per nation, top-2 customers by (bal desc, custkey)
    val nations = Tables(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val custs = Tables(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"), col("c_custkey"),
        round(col("c_acctbal") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = custs.groupBy(_._1).toSeq.flatMap { case (nk, g) =>
      g.sortBy { case (_, ck, bal) => (-bal, ck) }.take(2).toSeq
        .map { case (_, ck, bal) => (nations(nk), ck, bal) }
    }.toSet
    assert(out.map(r => (r.getString(0), r.getAs[Long]("c_custkey"),
      r.getAs[Long]("bal_c"))).toSet == expect)
    // every nation with at least one customer contributes exactly its top-2
    assert(out.length == expect.size)
    // the correlation was decorrelated into a join, not a per-row replan
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LateralJoin"), plan)
  }

  test("b46 recursive spine: gap-free month series, zero-filled, brute-force parity") {
    val out = Queries.recursiveSpine(spark, sf).collect()
      .map(r => (r.getAs[Int]("yr"), r.getAs[Int]("mon"),
        r.getAs[Long]("n_orders"), r.getAs[Long]("rev_c")))
    val orders = Tables(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map { r =>
        val d = r.getDate(0).toLocalDate
        (d.getYear * 12 + d.getMonthValue - 1, r.getLong(1))
      }
    val lo = orders.map(_._1).min
    val hi = orders.map(_._1).max
    val byM = orders.groupBy(_._1)
    val expect = (lo to hi).map { m =>
      val g = byM.getOrElse(m, Array.empty)
      (m / 12, m % 12 + 1, g.length.toLong, g.map(_._2).sum)
    }
    assert(out.toSeq == expect)
    // the spine is genuinely gap-free even where no orders exist
    assert(out.length == hi - lo + 1)
  }

  test("b47 native asof: AsOfJoinExec in the plan, row-identical to b9's rewrite") {
    val native = Queries.asofNative(spark, sf)
    val plan = native.queryExecution.executedPlan.toString
    // the strategy genuinely planned the custom exec — not a fallback
    assert(plan.contains("AsOfJoin"), s"no AsOfJoinExec in:\n$plan")
    // ...and none of the composed rewrite's window machinery
    assert(!plan.contains("Window"), "window operator leaked into the native plan")
    val got = native.collect().map(_.toSeq)
    val want = Queries.asofJoin(spark, sf).collect().map(_.toSeq)
    assert(got.length == want.length)
    assert(got.toSeq == want.toSeq)
    // brute-force semantic recompute: latest click at-or-before, max
    // (us, id) tie rule, inner drop when no prior click exists
    val ev = graft.Tables.eventsWithUs(spark, sf)
      .select("event_id", "user_id", "us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicks = ev.filter(_._4 == "click").groupBy(_._2)
    val expect = ev.filter(_._4 == "error").sortBy(_._1).flatMap {
      case (eid, user, us, _) =>
        val prior = clicks.getOrElse(user, Array.empty)
          .filter(c => c._3 <= us)
        if (prior.isEmpty) None else {
          val best = prior.maxBy(c => (c._3, c._1))
          Some(Seq(eid, user, us, best._1, best._3, us - best._3))
        }
    }
    assert(got.toSeq == expect.toSeq)
  }

  test("b49 nearest event: brute-force bidirectional argmin, tie rules, sentinel path") {
    val out = Queries.nearestEvent(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val ev = graft.Tables.eventsWithUs(spark, sf)
      .select("event_id", "user_id", "us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val expect = ev.filter(_._4 == "error").sortBy(_._1).map { case (eid, u, eus, _) =>
      val cs = clicksByUser.getOrElse(u, Array.empty)
      if (cs.isEmpty) (eid, u, eus, -1L, -1L, 0L, 0L)
      else {
        val best = cs.minBy(c => (math.abs(c._3 - eus), c._3, c._1))
        (eid, u, eus, best._1, best._3, best._3 - eus, 1L)
      }
    }
    assert(out.toSeq == expect.toSeq)
    // backward- and forward-nearest both genuinely appear in the corpus
    assert(out.exists(r => r._7 == 1L && r._6 < 0L), "no backward-nearest case")
    assert(out.exists(r => r._7 == 1L && r._6 > 0L), "no forward-nearest case")
    // planted frame: clickless-user sentinels, exact |gap| ties → backward
    import spark.implicits._
    val planted = Seq(
      (1L, 10L, 100L, "error"), // user 10 has no clicks at all
      (2L, 11L, 200L, "error"), // equidistant clicks at 150/250 → backward
      (3L, 11L, 150L, "click"),
      (4L, 11L, 250L, "click"),
      (5L, 12L, 300L, "error"), // same-us click = backward gap 0
      (6L, 12L, 300L, "click")
    ).toDF("event_id", "user_id", "us", "event_type")
    val p = Queries.nearestEventOn(planted).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(p.toSeq == Seq(
      (1L, -1L, -1L, 0L, 0L),
      (2L, 3L, 150L, -50L, 1L),
      (5L, 6L, 300L, 0L, 1L)))
  }

  test("b50 cusum: exact deviation recompute, endpoints at zero, signal witness") {
    val out = Queries.cusumChangepoint(spark, sf).collect()
      .map(r => (r.getAs[Int]("rk"), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val ev = graft.Tables.eventsWithUs(spark, sf)
      .select(col("us"), round(col("value") * 100, 0).cast("long")).collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getLong(1)))
    val byDay = ev.groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }
    val lo = byDay.keys.min
    val hi = byDay.keys.max
    val n = hi - lo + 1
    val xs = (lo to hi).map(d => (d, byDay.getOrElse(d, 0L)))
    val t = xs.map(_._2).sum
    var prefix = 0L
    val devs = xs.zipWithIndex.map { case ((d, x), i) =>
      prefix += x
      (d, x, prefix, n * prefix - (i + 1L) * t)
    }
    val expect = devs.sortBy(v => (-math.abs(v._4), v._1)).take(10).zipWithIndex.map {
      case ((d, x, p, dev), i) => (i + 1, d, x, p, dev, n, t)
    }
    assert(out.toSeq == expect)
    // the LAST day's deviation is exactly zero by construction, so the
    // statistic has a well-defined interior maximum
    assert(devs.last._4 == 0L)
    // the series genuinely deviates from the constant-rate line
    assert(out.head._5 != 0L)
  }

  test("b51 ntile+listagg: exact quartile recompute incl. remainder rule, ordered lists") {
    val out = Queries.ntileListagg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val c = Tables(spark, sf, "customer")
      .join(Tables(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sf, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("c_custkey"),
        round(col("c_acctbal") * 100, 0).cast("long")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = c.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (region, g) =>
      val sorted = g.sortBy(x => (-x._4, x._3))
      val n = sorted.length
      // SQL NTILE: first (n % 4) tiles get ceil(n/4), the rest floor
      val base = n / 4
      val extra = n % 4
      val tiles = (1 to 4).flatMap(t =>
        Seq.fill(base + (if (t <= extra) 1 else 0))(t.toLong))
      sorted.zip(tiles).groupBy(_._2).toSeq.sortBy(_._1).map { case (q, rows) =>
        val bals = rows.map(_._1._4)
        (region, q, rows.length.toLong, bals.min, bals.max,
          rows.map(_._1._2).distinct.sorted.mkString(","))
      }
    }
    assert(out.toSeq == expect)
    // quartile sizes differ by at most one within a region
    out.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._3).max - g.map(_._3).min <= 1)
    }
  }

  test("b48 LOCF gap fill: carry/staleness exact vs sequential recompute, real gaps") {
    val out = Queries.gapFillLocf(spark, sf).collect()
      .map(r => (r.getAs[String]("priority"), r.getAs[Long]("day_idx"),
        r.getAs[Long]("n_orders"), r.getAs[Long]("is_gap"),
        r.getAs[Long]("locf_rev_c"), r.getAs[Long]("days_since_obs")))
    // brute-force: per (priority, day) cent sums, then a sequential carry
    val obs = Tables(spark, sf, "orders")
      .select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")).cast("long"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val byKey = obs.groupBy(_._1).map { case (k, vs) => k -> (vs.length.toLong, vs.map(_._2).sum) }
    val lo = obs.map(_._1._2).min
    val hi = obs.map(_._1._2).max
    val expect = obs.map(_._1._1).distinct.sorted.flatMap { p =>
      var carry = -1L
      var lastObs = -1L
      (lo to hi).map { d =>
        val o = byKey.get((p, d))
        o.foreach { case (_, rev) => carry = rev; lastObs = d }
        (p, d, o.map(_._1).getOrElse(0L), if (o.isEmpty) 1L else 0L,
          carry, if (lastObs < 0) -1L else d - lastObs)
      }
    }
    assert(out.toSeq == expect.toSeq)
    // the corpus genuinely exercises all three regimes
    assert(out.exists(_._4 == 1L), "no gaps — day granularity lost its point")
    assert(out.exists(r => r._4 == 1L && r._5 >= 0L), "no carried value over a gap")
    assert(out.exists(_._6 > 1L), "staleness never exceeded one day")
    assert(out.exists(r => r._5 == -1L && r._6 == -1L), "no pre-observation sentinel rows")
  }
}
