package graft

class SparkEntrySmokeSpec extends SparkTestBase {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query implementation") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query executes with a non-empty schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      assert(df.count() >= 0, s"$name: failed to execute")
    }
  }

  test("iterative/windowed/hashed queries are run-to-run deterministic") {
    // the shapes where nondeterminism would hide: iterative convergence,
    // window tiebreaks, hash families, float folds
    val risky = Seq("a7_grid_cluster", "a17_upsert_ignore", "c6_minhash_lsh",
      "c8_simhash", "c9_cosine_pairs", "c10_ann_bruteforce", "b4_topk_per_group")
    risky.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().map(_.toString).sorted
      val b = fn(spark, sf).collect().map(_.toString).sorted
      assert(a.sameElements(b), s"$name: results differ between runs")
    }
  }
}
