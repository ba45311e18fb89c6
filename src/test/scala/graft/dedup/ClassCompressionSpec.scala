package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** r18 optimization pin: the class-compressed forms of C60/C74/C93
  * (kernel work per set-class pair, doc-level answers via exact
  * integer multiplicities or equi-join expansion — see
  * [[DedupQueries.setClassUniverse]]) are value-identical to the
  * doc-level reference forms that score every candidate pair.
  *
  * Driven on BOTH the sf0.001 corpus and a synthetic corpus planted
  * with every compression-relevant structure: identical texts under
  * different ids/langs (text classes), different texts with identical
  * token SETS (set classes — the case where text-level compression
  * alone would under-merge), near-dup sets straddling the τ=0.5 cut,
  * disjoint docs, a NULL-lang doc, and singleton classes.
  */
class ClassCompressionSpec extends SparkTestBase {

  /** Stage a (doc_id, text, lang) corpus as a documents.parquet dir so
    * the session-path queries (which read Tables.documents) see it.
    */
  private def stage(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ccspec").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private val planted: Seq[(Long, String, String)] = {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      // text class of 3 (two langs — cross-lingual identical dups)
      (1L, base, "en"), (2L, base, "de"), (3L, base, "en"),
      // same token SET, different text (order + dup tokens differ)
      (4L, "beta alpha alpha gamma delta epsilon zeta eta theta", "fr"),
      // near-dup: 7/9 overlap — above the 0.5 cut
      (5L, "alpha beta gamma delta epsilon zeta eta iota", "en"),
      // mid-dup: below the cut but a likely band candidate
      (6L, "alpha beta gamma delta omega psi chi phi", "de"),
      // disjoint
      (7L, "one two three four five six", "en"),
      // NULL lang rides a dup class
      (8L, base, null),
      // singleton near the small docs
      (9L, "one two three four five seven", "fr"),
      // NULL-text docs (r18 advice): the universe filters them
      // EXPLICITLY, every reference drops them via NULL-key equi-joins
      // — two of them, so an accidental NULL-key class would produce a
      // visible intra pair in any form that diverges
      (10L, null, "en"), (11L, null, "de"))
  }

  private def docs(dir: String): DataFrame = graft.Tables(spark, dir, "documents")

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.mkString("|"))

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.schema.map(_.dataType) == b.schema.map(_.dataType))
    assert(sortedRows(a) == sortedRows(b))
  }

  private def referenceC74(docs: DataFrame, cand: DataFrame): DataFrame = {
    import MinHashLsh._
    val sigs = docs
      .select(col("doc_id"), shingleHashes(col("text")).as("ths"))
      .select(col("doc_id"), signature(col("ths")).as("sig"),
        array_sort(array_distinct(col("ths"))).as("hs"))
    cand.select("doc_a", "doc_b")
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("siga"),
        col("hs").as("ha")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sigb"),
        col("hs").as("hb")), "doc_b")
      .withColumn("matched", expr(
        "aggregate(zip_with(siga, sigb, (x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END), 0L, (a, v) -> a + v)"))
      .withColumn("ni", expr("sorted_intersect_count(ha, hb)"))
      .withColumn("est_micro", expr(s"matched * 1000000 div $NumPerms"))
      .withColumn("jac_micro", expr("ni * 1000000 div (size(ha) + size(hb) - ni)"))
      .withColumn("decile", least(expr("jac_micro div 100000"), lit(9L)))
      .withColumn("abs_err", abs(col("est_micro") - col("jac_micro")))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(est_micro) div count(1)").as("mean_est_micro"),
        expr("sum(jac_micro) div count(1)").as("mean_jac_micro"),
        expr("sum(abs_err) div count(1)").as("mean_err_micro"))
      .orderBy("decile")
  }

  /** Doc-level C6 reference: the literal per-band bucket self-join the
    * oracle SQL states (no supernode compression, no class expansion).
    */
  private def referenceC6(d: DataFrame): DataFrame = {
    val b = DedupQueries.bandRowsOn(d)
    val l = b.select(col("band").as("b1"), col("bh").as("h1"), col("doc_id").as("doc_a"))
    val r = b.select(col("band").as("b2"), col("bh").as("h2"), col("doc_id").as("doc_b"))
    l.join(r, col("b1") === col("b2") && col("h1") === col("h2")
        && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_bands"))
  }

  /** Doc-level C7 reference: score every candidate pair's STRING token
    * sets (the pre-r19 implementation).
    */
  private def referenceC7(d: DataFrame, cand: DataFrame): DataFrame = {
    val sets = d.select(col("doc_id"),
      array_distinct(graft.text.TextQueries.tokens(col("text"))).as("s"))
    cand.select("doc_a", "doc_b")
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sa"), col("sb"))).cast("double")
          / size(array_union(col("sa"), col("sb"))), 6).as("jaccard"))
  }

  /** Doc-level C66 reference: per-candidate-pair hashed-set containment
    * (the pre-r19 implementation).
    */
  private def referenceC66(d: DataFrame, cand: DataFrame): DataFrame = {
    val sets = d.select(col("doc_id"),
      array_sort(array_distinct(MinHashLsh.shingleHashes(col("text")))).as("hs"))
    cand.select("doc_a", "doc_b")
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("sorted_intersect_count(ha, hb)").as("n_common"),
        size(col("ha")).cast("long").as("na"),
        size(col("hb")).cast("long").as("nb"))
      .withColumn("cont_a_micro", expr("n_common * 1000000 div na"))
      .withColumn("cont_b_micro", expr("n_common * 1000000 div nb"))
      .withColumn("is_contained",
        (greatest(col("cont_a_micro"), col("cont_b_micro"))
          >= DedupQueries.ContainMicro).cast("long"))
  }

  private def checkAll(dir: String): Unit = {
    val d = docs(dir)
    val cand = DedupQueries.candidatePairsOn(d)
    assertSame(DedupQueries.c60LshCurve(spark, dir),
      DedupQueries.lshCurveScore(d, cand))
    assertSame(DedupQueries.c74MinhashError(spark, dir),
      referenceC74(d, cand))
    assertSame(DedupQueries.c93CrossLingual(spark, dir),
      DedupQueries.crossLingualScore(d, cand))
    // r19 additions: c6 by expansion, c7 text-class-compressed (BOTH
    // dispatch branches), c66 set-class-compressed — each against its
    // literal doc-level form
    assertSame(DedupQueries.c6MinhashLsh(spark, dir), referenceC6(d))
    for (impl <- Seq("docs", "classes")) {
      spark.conf.set("graft.dedup.c7.impl", impl)
      try assertSame(DedupQueries.c7NgramJaccard(spark, dir),
        referenceC7(d, cand.select("doc_a", "doc_b")))
      finally spark.conf.unset("graft.dedup.c7.impl")
    }
    assertSame(DedupQueries.c66Containment(spark, dir),
      referenceC66(d, cand.select("doc_a", "doc_b")))
  }

  test("planted corpus: class-compressed c60/c74/c93 == doc-level reference") {
    checkAll(stage(planted))
  }

  test("sf0.001: class-compressed c60/c74/c93 == doc-level reference") {
    checkAll(sf)
  }

  test("universe invariants: srep partitions docs; class candidates cover doc candidates") {
    val dir = stage(planted)
    val u = DedupQueries.setClassUniverse(spark, dir)
    val d = docs(dir)
    // NULL-text docs are OUTSIDE the universe by explicit contract
    assert(u.docMap.count() == d.filter(col("text").isNotNull).count())
    assert(u.docMap.count() < d.count(), "planted NULL-text rows missing")
    // identical sets share an srep: docs 1,2,3,4,8 form one class
    val m = u.docMap.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(2L, 3L, 4L, 8L).forall(i => m(i) == m(1L)))
    assert(m(5L) != m(1L) && m(7L) != m(9L))
    // doc-level candidates == class candidates expanded + intra pairs
    val docCand = DedupQueries.candidatePairsOn(d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cls = u.repCands.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byClass = m.toSeq.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val expanded = cls.flatMap { case (ra, rb) =>
      for (a <- byClass(ra); b <- byClass(rb))
        yield (math.min(a, b), math.max(a, b))
    } ++ byClass.values.flatMap(ds =>
      for (a <- ds; b <- ds if a < b) yield (a, b))
    assert(docCand == expanded)
  }
}
