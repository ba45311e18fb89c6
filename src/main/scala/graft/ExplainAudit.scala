package graft

/** Dev tool: dump formatted physical plans for a set of queries so scan
  * pruning (ReadSchema), PushedFilters, broadcast choices, and
  * WholeStageCodegen spans can be audited (SURVEY.md §6 last bullet).
  * Usage: runMain graft.ExplainAudit [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
