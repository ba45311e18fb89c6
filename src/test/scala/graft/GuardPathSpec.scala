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

  test("every oracle reads events/embeddings through the quarantine CTEs") {
    // The b55/c139 ingest contracts hold only if BOTH engines filter:
    // a raw `FROM events` / `FROM embeddings` in an oracle would
    // silently diverge from the quarantined Spark side on poisoned
    // corpora. The CTE text is pasted (not interpolated — `$.k`-style
    // payloads forbid s-strings), so also pin each paste against the
    // canonical constant: a drifted copy fails here, not in a fuzz run.
    val rawEvents = "(FROM|JOIN)\\s+events\\b".r
    val rawEmb = "(FROM|JOIN)\\s+embeddings\\b".r
    val exemptEvents = Set("b55_event_quarantine")
    val exemptEmb = Set("c139_vector_quarantine")
    for ((k, sql) <- SparkEntry.oracleSql) {
      val stripped = sql
        .replace(Tables.fevCte, "")
        .replace(graft.embed.EmbedQueries.fembCte, "")
      if (!exemptEvents(k))
        assert(rawEvents.findFirstIn(stripped).isEmpty,
          s"$k oracle reads the RAW events table (wants the fev CTE)")
      if (!exemptEmb(k))
        assert(rawEmb.findFirstIn(stripped).isEmpty,
          s"$k oracle reads the RAW embeddings table (wants the femb CTE)")
      if (sql.contains("FROM fev"))
        assert(sql.contains(Tables.fevCte),
          s"$k reads fev but its CTE text drifted from Tables.fevCte")
      if (sql.contains("FROM femb"))
        assert(sql.contains(graft.embed.EmbedQueries.fembCte),
          s"$k reads femb but its CTE text drifted from EmbedQueries.fembCte")
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
