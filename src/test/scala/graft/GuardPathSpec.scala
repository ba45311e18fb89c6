package graft

import org.apache.spark.sql.functions._

/** Entry-level guard-path pins: every loud-failure guard must be
  * reachable THROUGH the public `SparkEntry.queries` surface, so a
  * refactor that reroutes a query off its guarded kernel fails here —
  * not silently at 100 TB when the guard would have fired.
  *
  * Two pin shapes, by guard reachability:
  *  - guards whose trigger data is constructible at test scale are
  *    DRIVEN through the entry (c105's source-cardinality require);
  *  - guards whose trigger needs ~10⁹-row pathologies (the c135/c137
  *    DECIMAL→BIGINT overflows, c138's merge-inflation impossibility)
  *    or a broken internal contract (WordPiece/unigram cover,
  *    MomentMatrix state restored under a different d) are pinned
  *    STRUCTURALLY: the entry's analyzed plan must still carry the
  *    raise_error / guarded expression, plus a unit-level intercept of
  *    the guard body itself (TextDedupSpec / TextSegSpec /
  *    MomentMatrixPropSpec and below).
  */
class GuardPathSpec extends SparkTestBase {

  private def analyzedOf(key: String): String =
    SparkEntry.queries(key)(spark.newSession(), sf)
      .queryExecution.analyzed.toString

  test("c135 entry plan carries the pair-mass overflow raise_error") {
    assert(analyzedOf("c135_lsh_balance").contains(
      "c135: per-band candidate-pair mass"),
      "the c135 entry no longer routes through the guarded rollup")
  }

  test("c137 entry plan carries the pair-mass overflow raise_error") {
    assert(analyzedOf("c137_lsh_tune").contains(
      "c137: candidate-pair mass overflows BIGINT"),
      "the c137 entry no longer routes through the guarded cost rollup")
  }

  test("c138 entry plan carries the compression-overflow raise_error") {
    assert(analyzedOf("c138_merge_sweep").contains(
      "c138: post-merge token total"),
      "the c138 entry no longer routes through the guarded ppm math")
  }

  test("c119 entry plan carries the cover-guarded WordPiece segmenter") {
    assert(analyzedOf("c119_wordpiece").toLowerCase.contains("wordpiece"),
      "the c119 entry no longer routes through WordPieceSegment " +
        "(whose cover guard throws on a broken builder contract)")
  }

  test("c132 entry plan carries the cover-guarded unigram segmenter") {
    assert(analyzedOf("c132_unigram_lm").toLowerCase.contains("unigram"),
      "the c132 entry no longer routes through UnigramSegment")
  }

  test("c105 entry fails loudly on an unbounded source domain") {
    // 4200 docs, every source distinct — past the 4096-source cap the
    // driver-side DoReMi fold refuses to materialize
    val dir = java.nio.file.Files.createTempDirectory("graft-guard-c105").toString
    import spark.implicits._
    (0 until 4200).map(i =>
        (i.toLong, s"doc $i tokens here", "en", s"uniq_src_$i", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("c105_doremi")(spark.newSession(), dir).collect()
    }
    assert(e.getMessage.contains("expected a bounded domain"),
      s"wrong failure: ${e.getMessage}")
  }

  test("every oracle reads quarantined tables through their CTEs") {
    // The b55/b56/c139/c140 ingest contracts hold only if BOTH engines
    // filter: a raw `FROM events/documents/orders/embeddings` in an
    // oracle would silently diverge from the quarantined Spark side on
    // poisoned corpora. fev/femb are pasted per site (`$.k`-style
    // payloads forbid s-strings); fdoc/ford are injected centrally
    // (SparkEntry.injectQuarantineCtes) — either way the FINAL oracle
    // map must carry the canonical definition next to every read.
    val contracts = Seq(
      ("events", Tables.fevCte, Set("b55_event_quarantine")),
      ("documents", Tables.fdocCte, Set("c140_doc_quarantine")),
      ("orders", Tables.fordCte, Set("b56_order_quarantine")),
      ("embeddings", graft.embed.EmbedQueries.fembCte,
        Set("c139_vector_quarantine")))
    for ((k, sql) <- SparkEntry.oracleSql) {
      for ((table, cte, exempt) <- contracts) {
        val stripped = contracts.foldLeft(sql)((s, c) => s.replace(c._2, ""))
        if (!exempt(k))
          // `,\s*` (not ", ") so a FROM-list item split across lines or
          // written without a space after the comma can't evade the check
          assert(s"(FROM|JOIN|,)\\s*$table\\b".r.findFirstIn(stripped).isEmpty,
            s"$k oracle reads the RAW $table table (wants its quarantine CTE)")
        val view = cte.takeWhile(_ != ' ')
        if (s"\\b$view\\b".r.findFirstIn(sql).isDefined)
          assert(sql.contains(cte),
            s"$k reads $view but lacks the canonical CTE text (drifted or uninjected)")
      }
    }
  }

  test("MomentMatrix state restored under a different d fails loudly") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val d3 = graft.functions.MomentMatrix(
      BoundReference(0, ArrayType(LongType, containsNull = false), nullable = false),
      Literal(3))
    val d4 = graft.functions.MomentMatrix(
      BoundReference(0, ArrayType(LongType, containsNull = false), nullable = false),
      Literal(4))
    val bytes = d3.serialize(d3.createAggregationBuffer())
    val e = intercept[IllegalArgumentException](d4.deserialize(bytes))
    assert(e.getMessage.contains("different dimension"),
      s"wrong failure: ${e.getMessage}")
  }
}
