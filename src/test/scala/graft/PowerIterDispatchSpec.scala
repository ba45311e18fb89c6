package graft

import org.apache.spark.sql.DataFrame

/** r18 optimization pin: the single-task local power-iteration kernels
  * (c102 PageRank, c110 TextRank — the GraphCC size-dispatch idiom
  * applied to the Pregel loops) are bit-identical to the DataFrame
  * iterates they replace below [[graft.embed.EmbedQueries.PrLocalMaxEdges]].
  */
class PowerIterDispatchSpec extends SparkTestBase {

  private def rows(df: DataFrame): Seq[String] = df.collect().toSeq.map(_.toString)

  private def withImpl[A](key: String, impl: String)(body: => A): A = {
    spark.conf.set(key, impl)
    try body finally spark.conf.unset(key)
  }

  test("c102 pagerank: local single-task kernel == DataFrame iterate") {
    val df = withImpl("graft.pr.impl", "df")(
      rows(graft.embed.EmbedQueries.c102Pagerank(spark, sf)))
    val loc = withImpl("graft.pr.impl", "local")(
      rows(graft.embed.EmbedQueries.c102Pagerank(spark, sf)))
    assert(df.nonEmpty && df == loc)
  }

  test("c110 textrank: local single-task kernel == DataFrame iterate") {
    val df = withImpl("graft.tr.impl", "df")(
      rows(graft.text.TextQueries.c110Textrank(spark, sf)))
    val loc = withImpl("graft.tr.impl", "local")(
      rows(graft.text.TextQueries.c110Textrank(spark, sf)))
    assert(df.nonEmpty && df == loc)
  }

  test("c115 k-center: local single-task kernel == DataFrame greedy loop") {
    val df = withImpl("graft.kc.impl", "df")(
      rows(graft.embed.EmbedQueries.c115KCenter(spark, sf)))
    val loc = withImpl("graft.kc.impl", "local")(
      rows(graft.embed.EmbedQueries.c115KCenter(spark, sf)))
    assert(df.nonEmpty && df == loc)
  }

  test("c108 graph-ann: local single-task walk == DataFrame walk (sf corpus)") {
    val df = withImpl("graft.beam.impl", "df")(
      rows(graft.embed.EmbedQueries.c108GraphAnn(spark, sf)))
    val loc = withImpl("graft.beam.impl", "local")(
      rows(graft.embed.EmbedQueries.c108GraphAnn(spark, sf)))
    assert(df.nonEmpty && df == loc)
  }

  test("c108 graph-ann: planted duplicate-vector ties and a zero-norm candidate") {
    import spark.implicits._
    // duplicates of the probe force exact cosine TIES (the cand-asc tie
    // rule must agree across paths) and the zero vector carries a NULL
    // cosine (try_divide), which must rank NULLS LAST identically
    val base = (0 until 64).map(i => 0.01f * ((i % 7) + 1))
    def vec(eps: Float, at: Int): Seq[Float] = base.updated(at, base(at) + eps)
    val planted: Seq[(Long, Seq[Float], String)] = Seq(
      (0L, base, "p"),
      (1L, base, "dup"),
      (2L, vec(0.001f, 3), "near"),
      (3L, vec(0.001f, 5), "near"),
      (4L, vec(-0.001f, 7), "near"),
      (5L, Seq.fill(64)(0.0f), "zero"),
      (100L, vec(0.002f, 9), "p2"))
    val dir = java.nio.file.Files.createTempDirectory("graft-beamspec").toString
    planted.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = withImpl("graft.beam.impl", "df")(
      rows(graft.embed.EmbedQueries.c108GraphAnn(spark, dir)))
    val loc = withImpl("graft.beam.impl", "local")(
      rows(graft.embed.EmbedQueries.c108GraphAnn(spark, dir)))
    assert(df.nonEmpty, "degenerate fixture: planted graph produced no beam rows")
    assert(df == loc)
  }

  test("c59/c95 corpus BPE loop: local single-task kernel == DataFrame loop") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val mDf = withImpl("graft.bpeloop.impl", "df")(
      rows(graft.text.TextQueries.bpeMergesOn(docs)))
    val mLoc = withImpl("graft.bpeloop.impl", "local")(
      rows(graft.text.TextQueries.bpeMergesOn(docs)))
    assert(mDf.nonEmpty && mDf == mLoc)
    val aDf = withImpl("graft.bpeloop.impl", "df")(
      rows(graft.text.TextQueries.bpeApplyOn(docs)))
    val aLoc = withImpl("graft.bpeloop.impl", "local")(
      rows(graft.text.TextQueries.bpeApplyOn(docs)))
    assert(aDf.nonEmpty && aDf == aLoc)
  }

  private def dfMerges(docs: org.apache.spark.sql.DataFrame, iters: Int): Seq[(String, String)] =
    graft.text.TextQueries.bpeMergesOn(docs).orderBy("iter").collect()
      .toSeq.take(iters).map(r => (r.getString(1), r.getString(2)))

  test("bpe sample-learn: local single-task kernel == DataFrame loop (sf sample)") {
    import org.apache.spark.sql.functions._
    val sample = Tables(spark, sf, "documents")
      .filter(col("doc_id").isNotNull &&
        col("doc_id") % graft.text.TextQueries.SegmentSampleMod === 0)
      .select("doc_id", "text")
    val df = dfMerges(sample, 2)
    val loc = graft.text.TextQueries.bpeLearnLocal(sample, 2)
    assert(df.nonEmpty && df == loc)
  }

  test("bpe sample-learn: UTF-8-byte tie-break (supplementary plane vs BMP)") {
    import spark.implicits._
    // (x, ｡) and (x, 𐀀) tie on count; UTF-8 bytes say
    // ｡ (EF BD A1) < U+10000 (F0 90 80 80), Java UTF-16 compareTo
    // says the opposite — the kernel must match Spark/DuckDB binary
    // order, and the DF loop is the arbiter.
    val hi = new String(Character.toChars(0x10000))
    val docs = Seq(
      (1L, s"x ｡ q x $hi"),
      (2L, s"x ｡ r x $hi"),
      (3L, s"x ｡ s x $hi"))
      .toDF("doc_id", "text")
    val df = dfMerges(docs, 2)
    val loc = graft.text.TextQueries.bpeLearnLocal(docs, 2)
    assert(df == loc && df.head._2 == "｡")
  }
}
