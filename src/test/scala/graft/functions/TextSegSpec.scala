package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.textseg.bpe_segment
import graft.text.TextQueries

class TextSegSpec extends SparkTestBase {

  private val merges = Seq(("x", "x"), ("p", "q"), ("x_x", "x"))

  test("greedy non-overlap per merge, sequential over the merge list") {
    import spark.implicits._
    val r = Seq(
      (1L, "x x x x x"),
      (2L, "p q p q p"),
      (3L, "a b c"),
      (4L, "x"),
      (5L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), bpe_segment(col("text"), merges).as("t"))
      .orderBy("doc_id").collect()
      .map(row => row.getSeq[String](1).toList)
    // doc 1: (x,x) greedy → [x_x, x_x, x]; (p,q) no-op;
    // (x_x,x_x) is NOT in the list, but (x_x, x) only matches at the
    // LAST adjacent pair → [x_x, x_x_x]
    assert(r(0) == List("x_x", "x_x_x"))
    // doc 2: (p,q) at 0-1 and 2-3, trailing p untouched
    assert(r(1) == List("p_q", "p_q", "p"))
    assert(r(2) == List("a", "b", "c"))
    assert(r(3) == List("x"))
    // split('', ' ') keeps the single empty token (Spark split semantics)
    assert(r(4) == List(""))
  }

  test("one-pass apply equals the per-merge corpus iteration (planted corpus)") {
    import spark.implicits._
    val docs = Seq((1L, "x x x x x"), (2L, "p q p q")).toDF("doc_id", "text")
    // learn BpeIters merges from the corpus itself, then compare the
    // one-pass expression against bpeApplyOn's iterated stream stats
    val learned = TextQueries.bpeMergesOn(docs).orderBy("iter").collect()
      .map(row => (row.getString(1), row.getString(2))).toSeq
    val onePass = TextQueries.bpeSegmentStats(docs, learned)
      .select("doc_id", "n_toks", "n_types", "max_tok_len")
      .orderBy("doc_id").collect().map(_.toSeq)
    val iterated = TextQueries.bpeApplyOn(docs)
      .select("doc_id", "n_toks", "n_types", "max_tok_len")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(onePass.toList == iterated.toList)
  }

  test("one-pass apply equals the iterated stream on the real corpus (full stats)") {
    // same check at corpus scale, including the dense-position
    // fingerprint: c95's sparse-position fp differs by construction, so
    // recompute the iterated side densely via row_number semantics
    val docs = Tables(spark, sf, "documents").limit(200).select("doc_id", "text")
    val learned = TextQueries.bpeMergesOn(docs).orderBy("iter").collect()
      .map(row => (row.getString(1), row.getString(2))).toSeq
    val onePass = TextQueries.bpeSegmentStats(docs, learned)
    val iterated = TextQueries.bpeApplyOn(docs)
      .select("doc_id", "n_toks", "n_types", "max_tok_len")
    assert(onePass.select("doc_id", "n_toks", "n_types", "max_tok_len")
      .exceptAll(iterated).count() == 0)
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    val df = Tables(spark, sf, "documents")
      .select(bpe_segment(col("text"), merges).as("t"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }

  test("wordpiece: longest-match-first, position-aware vocab, ## tagging, loud no-cover") {
    import spark.implicits._
    import graft.functions.textseg.wordpiece_segment
    // 'ab' only initial; 'b'/'c' only continuation chars via cont set;
    // 'bc' only continuation
    val init = Seq("ab", "a", "b", "c")
    val cont = Seq("bc", "a", "b", "c")
    val r = Seq(
      (1L, "abc"), // ab (init, longest) + ##c — NOT a + ##bc (greedy first-match)
      (2L, "abca abc"), // multiple words, each restarts in initial position
      (3L, "ba"), // 'b' initial exists; 'a' continuation
      (4L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), wordpiece_segment(col("text"), init, cont).as("t"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1).toList)
    assert(r(0) == List("ab", "##c"))
    assert(r(1) == List("ab", "##c", "##a", "ab", "##c"))
    assert(r(2) == List("b", "##a"))
    assert(r(3) == Nil) // the empty word contributes no pieces
    // a character outside the vocab is a construction bug: loud throw
    // the local-relation path may evaluate eagerly (constant folding),
    // so the raw IllegalStateException can surface unwrapped
    val ex = intercept[Exception] {
      Seq((1L, "xyz")).toDF("doc_id", "text")
        .select(wordpiece_segment(col("text"), init, cont)).collect()
    }
    assert(ex.getMessage.contains("wordpiece") ||
      Option(ex.getCause).exists(_.getMessage.contains("wordpiece")))
  }

  test("unigram: Viterbi DP walks CODE POINTS, not UTF-16 chars (non-BMP cover)") {
    import spark.implicits._
    import graft.functions.textseg.unigram_segment
    // 𝕏 (U+1D54F) is a surrogate pair: a char-indexed DP would probe the
    // high surrogate alone (never a vocab key) and throw no-cover. The
    // vocab seed and the DuckDB oracle slice by code points, so the
    // kernel must too.
    val x = "𝕏"
    // single-char layer covers; the 2-code-point piece (3 UTF-16 chars)
    // exercises the code-point maxLen and DP transition length
    val pieces = Seq(x, "a", x + "a")
    val costs = Seq(-2L, -2L, -3L)
    val r = Seq((1L, s"$x${x}a a"), (2L, s"$x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), unigram_segment(col("text"), pieces, costs).as("t"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1).toList)
    // word 1: [𝕏, 𝕏a] scores -2 + -3 = -5 beats [𝕏, 𝕏, a] = -6
    assert(r(0) == List(x, x + "a", "a"))
    assert(r(1) == List(x))
  }

  test("wordpiece participates in whole-stage codegen") {
    import graft.functions.textseg.wordpiece_segment
    val (init, cont) = graft.text.TextQueries.wpVocab(spark, sf)
    val df = Tables(spark, sf, "documents")
      .select(wordpiece_segment(col("text"), init, cont).as("t"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}
