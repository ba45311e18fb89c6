package graft

/** Dev tool: print the executed physical plan of named queries (all
  * batch queries if no names given) — the manual form of the
  * PlanContractSpec audit, for eyeballing Exchange/scan shapes.
  *
  * Usage: runMain graft.Explain [sfDir] [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = args.toSeq match {
      case Seq() => ("/root/testdata/sf0.001", Seq.empty[String])
      case head +: tail if head.startsWith("/") => (head, tail)
      case all => ("/root/testdata/sf0.001", all)
    }
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val keys =
      if (names.nonEmpty) names
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("d"))
    keys.foreach { n =>
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
