package graft.tiles

import graft.GraftSession

/** Dev tool: time the connected-components loop round by round at a
  * given SF dir (default sf0.1). Usage: runMain graft.tiles.CCProfile.
  */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val t0 = System.nanoTime()
    val pos = GeoDerive.positives(spark, dir)
    println(s"positives: ${pos.count()} cells in ${(System.nanoTime() - t0) / 1e9}s")
    val t1 = System.nanoTime()
    val cc = Clustering.connectedComponents4(pos)
    println(s"cc rows: ${cc.count()} in ${(System.nanoTime() - t1) / 1e9}s")
    spark.stop()
  }
}
