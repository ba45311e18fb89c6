package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (Spark startup dominates
  * test wall-clock otherwise).
  */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession.builder(4).appName("graft-test").getOrCreate()
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = { val s = TestSpark.spark; s.sparkContext.setLogLevel("WARN"); s }
  /** Smallest driver testdata — specs verify invariants here; the driver's
    * DuckDB oracle does value-exact checking at sf0.01.
    */
  val sf = "/root/testdata/sf0.001"
}
