package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.DedupQueries

/** C61: the curation funnel itself as one driver-checked query — stage
  * attribution over the corpus the pipeline would process (SURVEY §2
  * C61). Lives in its own object: the oracle composes TextQueries' and
  * DedupQueries' full oracle SQL as subqueries, and those two objects
  * already reference each other during init — a leaf object keeps the
  * composition outside that cycle.
  */
object FunnelQueries {

  /** Per-doc survival flags for the four corpus filters — quality gate
    * (C36), exact dedup keep-min-id (C1), near-dup collapse canonical
    * (C19), decontamination (C29 train-side screen) — and their RUNNING
    * INTERSECTION as doc/token counts per stage.
    *
    * Semantics: each filter is evaluated on the FULL corpus and the
    * funnel is the intersection chain — stage attribution at a fixed
    * corpus, the report a curation run publishes next to its output.
    * (The executable `CurationPipeline` applies the stages
    * SEQUENTIALLY — each stage sees only survivors, so its numbers
    * differ by construction; PipelineSpec pins those. This query is the
    * oracle-checkable twin of the report, every stage reusing the
    * driver-green operator definition it counts.)
    *
    * Scale shape: nothing new — each flag frame is an existing
    * operator's plan (memoized candidate/gram frames included); the
    * flags join on doc_id (one shuffle key), the funnel is ONE
    * all-columns aggregate, and the 5-row output is a map-side stack.
    */
  def c61CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val gate = TextQueries.c36QualityGate(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("keep").cast("long").as("f1"))
    val exact = Tables.documents(spark, dir)
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(1L).as("f2raw"))
    val near = DedupQueries.c19DedupCollapse(spark, dir)
      .select(col("doc_id"), col("keep").cast("long").as("f3"))
    val con = TextQueries.c29Contamination(spark, dir)
      .select(col("doc_id"), lit(0L).as("f4raw"))
    val flags = gate
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"))
      .join(con, Seq("doc_id"), "left")
      .select(col("n_tokens"), col("f1"),
        coalesce(col("f2raw"), lit(0L)).as("f2"),
        col("f3"),
        coalesce(col("f4raw"), lit(1L)).as("f4"))
    flags.agg(
        count(lit(1)).as("n0"), sum("n_tokens").as("t0"),
        sum(col("f1")).as("n1"),
        sum(col("f1") * col("n_tokens")).as("t1"),
        sum(col("f1") * col("f2")).as("n2"),
        sum(col("f1") * col("f2") * col("n_tokens")).as("t2"),
        sum(col("f1") * col("f2") * col("f3")).as("n3"),
        sum(col("f1") * col("f2") * col("f3") * col("n_tokens")).as("t3"),
        sum(col("f1") * col("f2") * col("f3") * col("f4")).as("n4"),
        sum(col("f1") * col("f2") * col("f3") * col("f4") * col("n_tokens")).as("t4"))
      .select(expr(
        """stack(5,
          |  0, 'total', n0, t0,
          |  1, 'quality_gate', n1, t1,
          |  2, 'exact_dedup', n2, t2,
          |  3, 'near_dup_collapse', n3, t3,
          |  4, 'decontamination', n4, t4
          |) AS (stage, stage_name, n_docs, n_tokens)""".stripMargin))
      .orderBy("stage")
  }

  val c61Sql: String =
    s"""WITH gate AS (
       |  SELECT doc_id, n_tokens, CAST(keep AS INT) AS f1 FROM (
       |${TextQueries.c36Sql}
       |)), ex AS (
       |  SELECT MIN(doc_id) AS doc_id FROM fdoc GROUP BY text
       |), near AS (
       |  SELECT doc_id, CAST(keep AS INT) AS f3 FROM (
       |${DedupQueries.c19Sql}
       |)), con AS (
       |  SELECT doc_id FROM (
       |${TextQueries.c29Sql}
       |)), flags AS (
       |  SELECT g.n_tokens, g.f1,
       |    CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f2,
       |    n.f3,
       |    CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END AS f4
       |  FROM gate g
       |  LEFT JOIN ex e ON e.doc_id = g.doc_id
       |  JOIN near n ON n.doc_id = g.doc_id
       |  LEFT JOIN con c ON c.doc_id = g.doc_id
       |), agg AS (
       |  SELECT COUNT(*) AS n0, CAST(SUM(n_tokens) AS BIGINT) AS t0,
       |    CAST(SUM(f1) AS BIGINT) AS n1,
       |    CAST(SUM(f1 * n_tokens) AS BIGINT) AS t1,
       |    CAST(SUM(f1 * f2) AS BIGINT) AS n2,
       |    CAST(SUM(f1 * f2 * n_tokens) AS BIGINT) AS t2,
       |    CAST(SUM(f1 * f2 * f3) AS BIGINT) AS n3,
       |    CAST(SUM(f1 * f2 * f3 * n_tokens) AS BIGINT) AS t3,
       |    CAST(SUM(f1 * f2 * f3 * f4) AS BIGINT) AS n4,
       |    CAST(SUM(f1 * f2 * f3 * f4 * n_tokens) AS BIGINT) AS t4
       |  FROM flags
       |)
       |SELECT CAST(stage AS INT) AS stage, stage_name, n_docs, n_tokens FROM (
       |  SELECT 0 AS stage, 'total' AS stage_name, n0 AS n_docs, t0 AS n_tokens FROM agg
       |  UNION ALL SELECT 1, 'quality_gate', n1, t1 FROM agg
       |  UNION ALL SELECT 2, 'exact_dedup', n2, t2 FROM agg
       |  UNION ALL SELECT 3, 'near_dup_collapse', n3, t3 FROM agg
       |  UNION ALL SELECT 4, 'decontamination', n4, t4 FROM agg
       |) ORDER BY stage""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("c61_curation_funnel" -> (c61CurationFunnel _))

  val oracles: Map[String, String] = Map("c61_curation_funnel" -> c61Sql)
}
