package graft

/** Dev tool: dump formatted physical plans for a set of queries so scan
  * pruning (ReadSchema), PushedFilters, broadcast choices, and
  * WholeStageCodegen spans can be audited (SURVEY.md §6 last bullet).
  * Usage: runMain graft.ExplainAudit [queryName ...]
  *
  * Besides declared query names, a few `internal:` probes expose
  * eager-derivation subplans that never appear in a final frame's
  * explain (r19 plan evidence):
  *  - internal:c97_terms — the C97 blocklist selection (top-K vs window)
  *  - internal:c7_classes — C7's class-compressed branch (forced via
  *    graft.dedup.c7.impl)
  *  - internal:c19_collapse — the dedup_collapse prep body
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q =====")
      q match {
        case "internal:c97_terms" =>
          graft.text.TextQueries.blocklistTerms(spark, sf).explain("formatted")
        case "internal:c7_classes" =>
          spark.conf.set("graft.dedup.c7.impl", "classes")
          try graft.dedup.DedupQueries.c7NgramJaccard(spark, sf).explain("formatted")
          finally spark.conf.unset("graft.dedup.c7.impl")
        case "internal:c19_collapse" =>
          graft.dedup.DedupQueries.c19DedupCollapse(spark, sf).explain("formatted")
        case name =>
          SparkEntry.queries(name)(spark, sf).explain("formatted")
      }
    }
    spark.stop()
  }
}
