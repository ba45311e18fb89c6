package graft

/** Physical-plan contracts over the WHOLE batch query surface — the
  * automated form of the per-round `.explain` audit. A regression that
  * silently turns a bucketed equi-join back into a
  * BroadcastNestedLoopJoin (the round-2 c9/a13 bugs) passes every
  * value-correctness check and only shows up at scale; this spec makes
  * it a test failure instead.
  */
class PlanContractSpec extends SparkTestBase {

  /** The intentional exceptions, each justified at its definition site.
    * Every one broadcasts a BOUNDED side — a 1-row aggregate, a constant
    * frame, or a ≤1% probe/codebook set — so the "nested loop" is a
    * map-side scalar/constant application, not an O(N·M) hazard:
    * a18 crosses 9 stitch constants, a31 the 1-row persisted-max-id
    * aggregate, b13 the 1-row avg-balance aggregate, c10 the ~1% probe
    * set, c18 the 64-row IVF codebook, c21/c30 a 1-row corpus total.
    * (a13 left this list in round 6: exact tile-membership containment
    * made it equi-join-only, and a25 with it.)
    */
  private val allowedNlj = Set(
    "a18_stitch_plan", "a31_incremental_cluster",
    "b13_no_order_customers", "c10_ann_bruteforce", "c18_ann_ivf",
    // c62 embeds c18's coarse assignment (same bounded codebook cross);
    // its own scoring joins are all broadcast/shuffled HASH equi-joins
    "c62_ivf_pq",
    "c21_tfidf_topk", "c30_domain_mix",
    // c43 crosses the 1-row (raw_total, tgt_total) aggregate into the
    // 256-row ratio table — both sides bounded constants
    "c43_dsir_weights",
    // c41/c42/c131 embed the c10 probe-broadcast as their ground-truth
    // side (c131's own per-width searches are bucket equi-joins)
    "c41_ann_recall", "c42_mrl_recall", "c131_bucket_recall",
    // c133 embeds both the c10 ground truth and c18's bounded-codebook
    // crosses; its sweep scoring is one cid equi-join filtered per np
    "c133_ivf_recall",
    // c134 embeds c18's codebook cross + the 1-row totals broadcast
    // (b42's scalar-on-bounded shape); its own agg is cid-keyed
    "c134_ivf_balance",
    // c47 crosses the 1-row corpus-total aggregate into the surviving
    // phrase candidates (same shape as c21/c30's corpus totals)
    "c47_phrase_mining",
    // c50 crosses the KmCents(=8)-row centroid codebook — the bounded
    // constant-table pattern c18's IVF codebook already uses; c51 and
    // c56 embed the same assignment (c56's update step itself is pure
    // partial agg + a K·dims-row broadcast), their own joins equi-join
    "c50_kmeans_assign", "c51_semdedup", "c56_kmeans_update",
    // c114 crosses the same KmCents-row centroid codebook as c50 (one
    // map-side pass; the only agg collects K-bounded distance lists)
    "c114_silhouette",
    // c115 crosses a 1-row center frame per greedy round (the a31
    // scalar-broadcast shape); the running-min join is a vec_id hash
    // equi-join
    "c115_kcenter",
    // c59 crosses the 1-row winning-pair aggregate (LIMIT 1) and the
    // 1-row merged/after counts into each iteration summary — every
    // corpus-sized join in the loop is a BroadcastHashJoin on
    // (doc_id, pos)
    "c59_bpe_merges",
    // b26 crosses four 1-row count aggregates (and the 1-row kpick
    // scalar) into its single output row; every anti join in the plan
    // is a BroadcastHashJoin (incl. the null-aware ones — the NAAJ
    // rewrite is asserted by its own spec)
    "b26_not_in_nulls",
    // c67 crosses the 1-row midpoint-cut aggregate into the corpus
    // before the old/new split — the b13 scalar-broadcast shape; both
    // dedup joins are hash equi-joins on the text key
    "c67_incremental_dedup",
    // c68 crosses the 1-row bigram-type total into the scored pairs
    // (c21/c30's corpus-total shape); the model joins are w1/w2 hash
    // equi-joins
    "c68_kn_bigram",
    // c70 embeds c50's bounded KmCents-row codebook cross; its own
    // centroid/count joins are broadcast HASH equi-joins on
    // (cluster, d) / cluster
    "c70_prototypicality",
    // c73 crosses three 1-row scalar aggregates (midpoint cut, the
    // (n_old, n_new) totals, the js sum) — the b13/c21/c30 shape;
    // the only corpus-sized shuffle is the token-key histogram agg
    "c73_corpus_drift",
    // c75 crosses the 1-row (n_tokens, n_1) corpus-totals aggregate
    // into the ≤GtMaxR-row count-of-counts report — both sides bounded
    // constants (the c43 shape); the only corpus-sized shuffle is the
    // gram-hash tf agg
    "c75_good_turing",
    // c78 crosses the L-row (=10 labels) centroid codebook into the
    // vector scan — the c50/c18 bounded-codebook pattern; the argmin
    // folds in the same partial agg, the confusion matrix is L²-bounded
    "c78_centroid_eval",
    // c81 is c10's broadcast-probe-set pattern verbatim (the ~1% probe
    // side broadcasts, the corpus scans once) with one extra
    // wrong-label predicate — same bounded build side as c10/c41/c42
    "c81_hard_negatives",
    // c87 embeds c30's 1-row max-tokens cross and adds its own 1-row
    // (w_tot, tok_tot) totals cross — the b13/c21/c30 bounded-scalar
    // shape twice over a source-sized frame
    "c87_epoch_plan",
    // c88 crosses the 1-row (n_docs, sum_dl) corpus-length aggregate
    // into the candidate (doc, term) frame — the same bounded-scalar
    // shape; candidate generation itself is a token hash equi-join
    // against the ≤15-row broadcast query-term table
    "c88_bm25",
    // c89 crosses the 1-row token-total and 1-row pair-total aggregates
    // into the vocab²-bounded pair frame — bounded scalars again; the
    // window pairing itself is a (doc, position) hash equi-join
    "c89_pmi_pairs",
    // c90 crosses a 1-row sequence-count aggregate into a 1-row
    // corpus-stats aggregate per sweep level — both sides single rows
    "c90_pack_sweep",
    // c91 embeds c43's 1-row (raw_total, tgt_total) cross (already
    // whitelisted there) — same bounded-scalar shape
    "c91_dsir_draw",
    // b42 crosses the 1-row grand-total aggregate into the ≤25-row
    // nation frame — the b13 scalar shape on dimension-sized data
    "b42_ratio_to_report",
    // c92 crosses the ≤40-row checkpoint frame into per-doc/vocab
    // aggregates (the bounded ≤-inequality fan-out is the operator)
    // and the 1-row regression fit into the ≤40-row point frame
    "c92_heaps_law",
    // c99 inherits c88's 1-row (n_docs) corpus-total cross on both
    // retrieval runs — the same bounded-scalar shape; the fusion
    // itself is a full-outer hash join of two ≤(queries·K)-row frames
    "c99_rrf_fusion",
    // c101 crosses the 1-row n_total aggregate into the ≤10-row bucket
    // frame for the ECE weights — the b42 scalar-on-bounded shape
    "c101_calibration",
    // c102 crosses the 1-row dangling-mass aggregate into the node
    // frame once per power iteration — the canonical PageRank scalar
    // broadcast; the per-iteration edge work is a src-keyed hash join
    "c102_pagerank",
    // c110 is c102's loop on the word graph — the same 1-row
    // dangling-mass cross per iteration; the corpus-sized pairing is a
    // (doc, position) hash equi-join, the iterate joins are vocab-keyed
    "c110_textrank",
    // c117 crosses the 1-row midpoint cut (c73's shape) and the 1-row
    // (n_old, n_new) totals into the distinct-score frame — bounded
    // scalars; the cumsum prefix join is a rng hash equi-join and the
    // only corpus-sized shuffle is the score-keyed histogram agg
    "c117_ks_drift",
    // c121 embeds the shared rrfJoined build, which inherits c99/c88's
    // 1-row corpus-total crosses; its own pair self-join is a qid hash
    // equi-join over two ≤Q·K-row frames
    "c121_rank_corr",
    // c124's rnk ≤ k inequality join runs on the ≤(101·langs)-row
    // ranked vocab frame × the 4-row broadcast depth table — both
    // sides bounded constants (the c92 ≤-fan-out shape); the only
    // corpus-sized shuffle is the (lang, token) tf agg
    "c124_hill",
    // c125 crosses the 1-row midpoint-cut aggregate into the
    // segmentation scan (c67/c73's scalar shape); the only corpus-sized
    // shuffle is the (lang, half) agg
    "c125_fertility_drift",
    // c123 crosses the 1-row conformal-threshold aggregate into the
    // scored scan (the b13/c67 scalar-broadcast shape); the only
    // corpus-sized shuffle is the val-score histogram agg
    "c123_conformal",
    // c120 crosses the 1-row doc-count aggregate into the 20-row top
    // frame — the b42 scalar-on-bounded shape
    "c120_burstiness",
    // b50 crosses the 1-row total aggregate into the calendar-bounded
    // day frame (b42's scalar-on-bounded shape); the corpus-sized work
    // is the day-keyed partial agg, joined back by hash equi-join
    "b50_cusum_changepoint",
    // b48 crosses the generated calendar spine (value-domain bounded —
    // days, not rows) with the ≤5-row distinct-priority frame; the
    // corpus-sized work is the (priority, day) partial agg, which
    // joins back by hash equi-join
    "b48_gap_fill_locf",
    // c137 crosses the per-factorization 1-row cost aggregate with the
    // 1-row detection aggregate (the b42 scalar-on-scalar shape, ×5
    // factorizations); the corpus-sized work is the (band, bh) partial
    // agg and the bounded truth⋈signature pass, both hash-shuffled
    "c137_lsh_tune")

  test("no unexpected BroadcastNestedLoopJoin / CartesianProduct in any batch plan") {
    val batch = SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("d"))
    val offenders = batch.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      val nlj = plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct")
      if (nlj && !allowedNlj.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian joins in: ${offenders.mkString(", ")}")
  }

  test("column pruning reaches the scan: a1 reads 3 of lineitem's 11 columns") {
    val plan = SparkEntry.queries("a1_deg2num")(spark, sf)
      .queryExecution.executedPlan.toString
    // the derivation needs only orderkey/partkey/linenumber; any other
    // lineitem column in the plan means pruning broke and a 100 TB scan
    // would read the wide fact for a 3-column projection
    Seq("l_extendedprice", "l_quantity", "l_shipdate", "l_returnflag")
      .foreach(c => assert(!plan.contains(c), s"unpruned column $c in a1 scan"))
    assert(plan.contains("ReadSchema"))
  }

  test("predicate pushdown reaches the scan: b9's event_type filters are in PushedFilters") {
    // raise the scan-metadata truncation width for this render: the b55
    // quarantine contract puts four IsNotNull filters AHEAD of the
    // EqualTo in the pushed list, and the default 100-char elision cut
    // the EqualTo mid-value ("EqualTo(event_type,c...") — the pushdown
    // was intact, the STRING was not (found by this pin, r17)
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "400")
    val plan =
      try SparkEntry.queries("b9_asof_join")(spark, sf)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    // both union branches filter event_type on the raw parquet column —
    // the scan, not a post-scan Filter, must carry it. Match loosely:
    // the exact rendering ("EqualTo(event_type,click)") varies across
    // Spark versions, so accept any pushed-filters clause that mentions
    // the column/value pair, and require the clause itself to exist so a
    // renamed label can't make the check vacuous.
    val pushed = "(?i)pushedfilters:?\\s*\\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).mkString("; ")
    assert(pushed.nonEmpty, "no PushedFilters clause found in the b9 plan")
    assert("(?i)event_type\\W{0,5}click".r.findFirstIn(pushed).isDefined,
      s"click filter not pushed to the events scan (pushed=[$pushed])")
    assert("(?i)event_type\\W{0,5}error".r.findFirstIn(pushed).isDefined,
      s"error filter not pushed to the events scan (pushed=[$pushed])")
  }

  test("b7 plan contract: json_strict_field compiles into whole-stage codegen") {
    // the StrictJson expressions provide doGenCode (a static call into
    // the scanner); if that ever breaks, Spark silently falls back to
    // interpreted eval for the whole stage — this pin makes the
    // fallback loud. The check: the generated code for b7's scan stage
    // references the scanner class, i.e. the expression was CODEGEN'D,
    // not wrapped in a fallback evaluator.
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val df = SparkEntry.queries("b7_json_extract")(spark, sf)
    df.collect(): Unit // materialize: AQE inserts codegen stages per-stage
    // manual walk: both the AQE wrapper and QueryStageExec hide their
    // finalized subplans from plain collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[WholeStageCodegenExec] = {
      val here = p match { case w: WholeStageCodegenExec => Seq(w); case _ => Nil }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(walk)
    }
    val stages = walk(df.queryExecution.executedPlan)
    assert(stages.nonEmpty, "b7 plan has no whole-stage codegen stages at all")
    val generated = stages.map(_.doCodeGen()._2.body).mkString("\n")
    assert(generated.contains("StrictJson"),
      "json_strict_field did not land inside a WholeStageCodegen stage — " +
        "the expression fell back to interpreted eval")
  }

  test("c97 blocklist derivation plans as TakeOrderedAndProject, never an unpartitioned window") {
    // the r19 fix: the K-term selection must be a top-K
    // (TakeOrderedAndProject — partial per-partition top-K, then one
    // K-row merge), not a row_number window with no PARTITION BY, which
    // sorts the full ≥4-char vocabulary on a single task at corpus
    // scale (the r17-verdict d26 risk, removed from the BM25 family in
    // r18 and from c97 here)
    val plan = graft.text.TextQueries.blocklistTerms(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"blocklist selection is not a top-K:\n$plan")
    assert(!plan.contains("Window"),
      s"unpartitioned window survived in the blocklist derivation:\n$plan")
  }

  test("a44 plan contract: one fold, no checkpoint scans, bounded exchanges") {
    // the round-11 rewrite's shape must not regress to the join-cascade
    // form: no materialized-RDD scans (localCheckpoint leaves 'Scan
    // ExistingRDD'), no joins at all, and only the aggregate exchange
    // plus the output range sort move data
    val plan = SparkEntry.queries("a44_simplify_polygon")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), "checkpointed RDD scan in the a44 plan")
    assert(!plan.contains("Join"), "the a44 fold must not re-grow a join cascade")
    assert(plan.toLowerCase.contains("simplifypolygonstats"),
      "native fold expression missing from the a44 plan")
    val exchanges = "(?i)exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"$exchanges exchanges in the a44 plan — expected agg + sort")
  }
}
