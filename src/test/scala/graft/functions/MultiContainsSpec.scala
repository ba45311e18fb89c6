package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.multisearch.multi_contains

class MultiContainsSpec extends SparkTestBase {

  private val kws = Seq("abc", "bcd", "xyz", "aa")

  test("bitmask semantics incl. overlapping and nested matches") {
    import spark.implicits._
    val r = Seq(
      (1L, "zzabcdzz"),   // "abc" and "bcd" overlap; both present
      (2L, "aaa"),        // "aa" present (overlapping occurrences, one bit)
      (3L, "ab cd xyz"),  // only "xyz"
      (4L, ""),
      (5L, "abcbcdxyzaa") // all four
    ).toDF("doc_id", "text")
      .select(col("doc_id"), multi_contains(col("text"), kws).as("m"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toList
    assert(r == List(1L | 2L, 8L, 4L, 0L, 15L))
  }

  test("equals K independent contains scans on the real corpus") {
    val docs = Tables(spark, sf, "documents").limit(300)
    val realKws = Seq("the", "and", "data", "model", "of")
    val naive = realKws.zipWithIndex
      .map { case (k, i) =>
        when(col("text").contains(k), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    assert(docs.select(
        multi_contains(col("text"), realKws).as("fast"), naive.as("slow"))
      .filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("prefix keywords and failure links: mask merges suffix outputs") {
    import spark.implicits._
    // "abcd" arrives: states walk a->ab->abc (match abc) ->? 'd' fails
    // from abc, restarts via failure into bcd's path — bcd must still
    // be reported (output-mask merging through fail links)
    val r = Seq((1L, "abcd")).toDF("doc_id", "text")
      .select(multi_contains(col("text"), Seq("abc", "bcd", "cd")).as("m"))
      .head.getLong(0)
    assert(r == 7L)
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    val df = Tables(spark, sf, "documents")
      .select(multi_contains(col("text"), kws).as("m"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }

  test("SQL surface: multi_contains and bpe_segment registered via extensions") {
    val r = spark.sql(
      """SELECT multi_contains('zzabcdzz', array('abc', 'bcd')) AS m,
        |       bpe_segment('x x x p q', array('x','x', 'p','q')) AS t""".stripMargin).head
    assert(r.getLong(0) == 3L)
    assert(r.getSeq[String](1).toList == List("x_x", "x", "p_q"))
  }

  test("SQL surface: wordpiece_segment registered via extensions") {
    val r = spark.sql(
      """SELECT wordpiece_segment('abc ba',
        |  array('ab', 'a', 'b', 'c'), array('bc', 'a', 'b', 'c')) AS t""".stripMargin).head
    assert(r.getSeq[String](0).toList == List("ab", "##c", "b", "##a"))
    // config validation rides the same foldableStrings guard
    val m = intercept[Exception](
      spark.sql("SELECT wordpiece_segment('x', array(1), array('a'))").head).getMessage
    assert(m.contains("foldable array<string>"))
  }

  test("SQL surface rejects malformed config arrays with a clear message") {
    def msg(sql: String): String =
      intercept[Exception](spark.sql(sql).head).getMessage
    // non-string element type
    assert(msg("SELECT multi_contains('x', array(1, 2))")
      .contains("foldable array<string>"))
    // NULL element inside the literal
    assert(msg("SELECT multi_contains('x', array('a', CAST(NULL AS STRING)))")
      .contains("must not contain NULL"))
    // NULL config array
    assert(msg("SELECT bpe_segment('x', CAST(NULL AS ARRAY<STRING>))")
      .contains("NULL"))
    // non-foldable config (a column reference cannot fold)
    assert(msg("SELECT bpe_segment(x, array(x, x)) FROM VALUES ('a') t(x)")
      .contains("foldable"))
  }
}
