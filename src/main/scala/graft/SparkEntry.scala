package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.relational.Queries

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every key in [[queries]] with an entry in [[oracleSql]] is
  * hash-compared against DuckDB running the SQL on the same parquet.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.tiles.GeoQueries.queries ++
    graft.text.TextQueries.queries ++
    graft.text.FunnelQueries.queries ++
    graft.dedup.DedupQueries.queries ++
    graft.embed.EmbedQueries.queries ++
    graft.multimodal.Multimodal.queries ++
    graft.streaming.StreamingQueries.queries ++ Map(
    "b1_pricing_summary" -> (Queries.pricingSummary _),
    "b2_top_unshipped" -> (Queries.topUnshipped _),
    "b3_region_volume" -> (Queries.regionVolume _),
    "b4_topk_per_group" -> (Queries.topkPerGroup _),
    "b5_event_sessions" -> (Queries.eventSessions _),
    "b6_event_windowed" -> (Queries.eventWindowed _),
    "b7_json_extract" -> (Queries.jsonExtract _),
    "b8_promo_revenue" -> (Queries.promoRevenue _),
    "b9_asof_join" -> (Queries.asofJoin _),
    "b10_range_join" -> (Queries.rangeJoin _),
    "b11_rollup_revenue" -> (Queries.rollupRevenue _),
    "b12_small_qty_revenue" -> (Queries.smallQtyRevenue _),
    "b13_no_order_customers" -> (Queries.noOrderCustomers _),
    "b14_exists_returned" -> (Queries.existsReturned _),
    "b15_distinct_sketch" -> (Queries.distinctSketch _),
    "b16_big_orders" -> (Queries.bigOrders _),
    "b17_session_window" -> (Queries.sessionWindow _),
    "b18_pivot_revenue" -> (Queries.pivotRevenue _),
    "b19_event_funnel" -> (Queries.eventFunnel _),
    "b20_cube_revenue" -> (Queries.cubeRevenue _),
    "b21_salted_enrich" -> (Queries.saltedEnrich _),
    "b22_avg_qty_revenue" -> (Queries.avgQtyRevenue _),
    "b23_moving_avg" -> (Queries.movingAvgRevenue _),
    "b24_set_ops" -> (Queries.setOpsRetention _),
    "b25_unpivot" -> (Queries.unpivotRevenue _),
    "b26_not_in_nulls" -> (Queries.notInNulls _),
    "b27_nation_percentile" -> (Queries.nationPercentile _),
    "b28_date_spine" -> (Queries.dateSpineRevenue _),
    "b29_order_streaks" -> (Queries.orderStreaks _),
    "b30_multi_distinct" -> (Queries.multiDistinct _),
    "b31_scd2" -> (Queries.scd2Intervals _),
    "b32_percentile_cont" -> (Queries.percentileCont _),
    "b33_grouping_sets" -> (Queries.groupingSetsRevenue _),
    "b34_cumulative_distinct" -> (Queries.cumulativeDistinct _),
    "b35_merge_upsert" -> (Queries.mergeUpsert _),
    "b36_above_avg" -> (Queries.aboveAvg _),
    "b37_retention_cohorts" -> (Queries.retentionCohorts _),
    "b38_mom_growth" -> (Queries.momGrowth _),
    "b39_ship_latency" -> (Queries.shipLatency _),
    "b40_order_fanout" -> (Queries.orderFanout _),
    "b41_late_supplier" -> (Queries.lateSupplier _),
    "b42_ratio_to_report" -> (Queries.ratioToReport _),
    "b43_merge_committed" -> (Queries.mergeCommitted _),
    "b44_merge_delta" -> (Queries.mergeDelta _),
    "b45_lateral_topn" -> (Queries.lateralTopn _),
    "b46_recursive_spine" -> (Queries.recursiveSpine _),
    "b47_asof_native" -> (Queries.asofNative _),
    "b48_gap_fill_locf" -> (Queries.gapFillLocf _),
    "b49_nearest_event" -> (Queries.nearestEvent _),
    "b50_cusum_changepoint" -> (Queries.cusumChangepoint _),
    "b51_ntile_listagg" -> (Queries.ntileListagg _),
    "b52_bucketed_join" -> (Queries.bucketedJoin _),
    "b53_partition_prune" -> (Queries.b53PartitionPrune _),
    "b54_composed_layout" -> (Queries.b54ComposedLayout _),
    "b55_event_quarantine" -> (Queries.b55EventQuarantine _),
    "b56_order_quarantine" -> (Queries.b56OrderQuarantine _),
    "b57_props_quality" -> (Queries.b57PropsQuality _)
  )

  /** Quarantine-view CTEs, keyed by the view name oracle SQL reads.
    * `fev`/`femb` predate the injector and paste their CTE text at each
    * site (29 sites — GuardPathSpec pins the pastes); `fdoc`/`ford`
    * arrived with ~155 read sites, where per-site pasting stops being
    * reviewable, so [[injectQuarantineCtes]] prepends the definition at
    * THIS assembly point instead — the oracle map the driver, fuzz
    * loop, and specs consume is always post-injection.
    */
  private val quarantineCtes: Seq[(String, String)] = Seq(
    "fev" -> Tables.fevCte,
    "fdoc" -> Tables.fdocCte,
    "ford" -> Tables.fordCte,
    "femb" -> graft.embed.EmbedQueries.fembCte)

  /** Prepend the quarantine CTEs a SQL references but does not define.
    * Handles the three statement shapes the oracles use: `WITH
    * RECURSIVE …` (the CTE list joins under the RECURSIVE keyword —
    * non-recursive members are legal there), `WITH …`, and a bare
    * query. A nested `WITH` inside a derived table is untouched (the
    * outer definition is shadowed there, which is the same view).
    */
  private[graft] def injectQuarantineCtes(sql: String): String = {
    val needed = quarantineCtes.collect {
      case (name, cte) if ("\\b" + name + "\\b").r.findFirstIn(sql).isDefined
        && !sql.contains(cte) =>
        // A definition that isn't the canonical text (whitespace/case
        // variant, or a drifted predicate) would be double-defined by
        // injection and fail at DuckDB runtime — fail loudly HERE
        // instead, naming the site. GuardPathSpec pins the canonical
        // pastes, so exact-text match is the only accepted definition.
        val defRe = ("(?is)\\b" + name + "\\s+AS\\s*\\(").r
        require(defRe.findFirstIn(sql).isEmpty,
          s"oracle SQL defines a variant of quarantine CTE '$name' " +
            "(not the canonical Tables.*Cte text) — use the canonical " +
            "paste or drop the local definition")
        cte
    }
    if (needed.isEmpty) sql
    else if (sql.startsWith("WITH RECURSIVE "))
      "WITH RECURSIVE " + needed.mkString(",\n") + ",\n" + sql.drop("WITH RECURSIVE ".length)
    else if (sql.startsWith("WITH "))
      "WITH " + needed.mkString(",\n") + ",\n" + sql.drop("WITH ".length)
    else
      "WITH " + needed.mkString(",\n") + "\n" + sql
  }

  /** DuckDB-runnable oracle SQL per query (same column aliases). */
  def oracleSql: Map[String, String] = rawOracleSql.map {
    case (k, sql) => k -> injectQuarantineCtes(sql)
  }

  private def rawOracleSql: Map[String, String] =
    graft.tiles.GeoQueries.oracles ++
    graft.text.TextQueries.oracles ++
    graft.text.FunnelQueries.oracles ++
    graft.dedup.DedupQueries.oracles ++
    graft.embed.EmbedQueries.oracles ++
    graft.multimodal.Multimodal.oracles ++
    graft.streaming.StreamingQueries.oracles ++ Map(
    "b1_pricing_summary" -> Queries.pricingSummarySql,
    "b2_top_unshipped" -> Queries.topUnshippedSql,
    "b3_region_volume" -> Queries.regionVolumeSql,
    "b4_topk_per_group" -> Queries.topkPerGroupSql,
    "b5_event_sessions" -> Queries.eventSessionsSql,
    "b6_event_windowed" -> Queries.eventWindowedSql,
    "b7_json_extract" -> Queries.jsonExtractSql,
    "b8_promo_revenue" -> Queries.promoRevenueSql,
    "b9_asof_join" -> Queries.asofJoinSql,
    "b10_range_join" -> Queries.rangeJoinSql,
    "b11_rollup_revenue" -> Queries.rollupRevenueSql,
    "b12_small_qty_revenue" -> Queries.smallQtyRevenueSql,
    "b13_no_order_customers" -> Queries.noOrderCustomersSql,
    "b14_exists_returned" -> Queries.existsReturnedSql,
    "b15_distinct_sketch" -> Queries.distinctSketchSql,
    "b16_big_orders" -> Queries.bigOrdersSql,
    "b17_session_window" -> Queries.sessionWindowSql,
    "b18_pivot_revenue" -> Queries.pivotRevenueSql,
    "b19_event_funnel" -> Queries.eventFunnelSql,
    "b20_cube_revenue" -> Queries.cubeRevenueSql,
    "b21_salted_enrich" -> Queries.saltedEnrichSql,
    "b22_avg_qty_revenue" -> Queries.avgQtyRevenueSql,
    "b23_moving_avg" -> Queries.movingAvgRevenueSql,
    "b24_set_ops" -> Queries.setOpsRetentionSql,
    "b25_unpivot" -> Queries.unpivotRevenueSql,
    "b26_not_in_nulls" -> Queries.notInNullsSql,
    "b27_nation_percentile" -> Queries.nationPercentileSql,
    "b28_date_spine" -> Queries.dateSpineRevenueSql,
    "b29_order_streaks" -> Queries.orderStreaksSql,
    "b30_multi_distinct" -> Queries.multiDistinctSql,
    "b31_scd2" -> Queries.scd2IntervalsSql,
    "b32_percentile_cont" -> Queries.percentileContSql,
    "b33_grouping_sets" -> Queries.groupingSetsRevenueSql,
    "b34_cumulative_distinct" -> Queries.cumulativeDistinctSql,
    "b35_merge_upsert" -> Queries.mergeUpsertSql,
    "b36_above_avg" -> Queries.aboveAvgSql,
    "b37_retention_cohorts" -> Queries.retentionCohortsSql,
    "b38_mom_growth" -> Queries.momGrowthSql,
    "b39_ship_latency" -> Queries.shipLatencySql,
    "b40_order_fanout" -> Queries.orderFanoutSql,
    "b41_late_supplier" -> Queries.lateSupplierSql,
    "b42_ratio_to_report" -> Queries.ratioToReportSql,
    "b43_merge_committed" -> Queries.mergeCommittedSql,
    "b44_merge_delta" -> Queries.mergeDeltaSql,
    "b45_lateral_topn" -> Queries.lateralTopnSql,
    "b46_recursive_spine" -> Queries.recursiveSpineSql,
    "b47_asof_native" -> Queries.asofNativeSql,
    "b48_gap_fill_locf" -> Queries.gapFillLocfSql,
    "b49_nearest_event" -> Queries.nearestEventSql,
    "b50_cusum_changepoint" -> Queries.cusumChangepointSql,
    "b51_ntile_listagg" -> Queries.ntileListaggSql,
    "b52_bucketed_join" -> Queries.bucketedJoinSql,
    "b53_partition_prune" -> Queries.b53Sql,
    "b54_composed_layout" -> Queries.b54Sql,
    "b55_event_quarantine" -> Queries.b55Sql,
    "b56_order_quarantine" -> Queries.b56Sql,
    "b57_props_quality" -> Queries.b57Sql
  )
}
