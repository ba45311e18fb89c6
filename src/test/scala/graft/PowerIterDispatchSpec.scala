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
}
