package graft.tiles

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components of positive tiles under 4-neighbor adjacency —
  * the reference's cluster detection (run_inference.py:21-60), which is a
  * driver-recursive DFS there, re-expressed as distributed min-label
  * propagation:
  *
  *   label(c) ← min(label(c), min over 4-neighbors n of label(n))
  *
  * repeated to fixpoint. Each round is one map-side 4-way union of
  * shifted copies plus one aggregation shuffle keyed on (x, y); lineage is
  * truncated every round with eager localCheckpoint so plans stay O(1).
  * Rounds needed = max cluster diameter; convergence is detected via the
  * strictly-decreasing global label sum (one extra agg, no join).
  *
  * At 100 TB the same loop holds: the shuffle key is the cell coordinate
  * (uniform, no skew) and per-round traffic is |positive cells|, never the
  * full fact. For pathological long-diameter components, switch to
  * alternating large-star/small-star (Kiveris et al., "Connected
  * Components in MapReduce"), which this propagation degenerates to for
  * grid graphs in practice.
  */
object Clustering {

  /** cells must have integer columns x, y. Returns (x, y, cluster_id)
    * where cluster_id = min (x*100000+y) over the component.
    */
  def connectedComponents4(cells: DataFrame, maxIter: Int = 200): DataFrame = {
    val keys = cells.select("x", "y").distinct().localCheckpoint(true)
    var labels = keys.withColumn("lbl", col("x") * lit(100000L) + col("y"))
      .localCheckpoint(true)
    var prevSum = labels.agg(sum("lbl")).head.getLong(0)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val shifted = Seq((0L, 1L), (0L, -1L), (1L, 0L), (-1L, 0L)).map { case (dx, dy) =>
        labels.select((col("x") + lit(dx)).as("x"), (col("y") + lit(dy)).as("y"), col("lbl"))
      }.reduce(_ union _)
      val next = shifted.union(labels)
        .groupBy("x", "y").agg(min("lbl").as("lbl"))
        .join(keys, Seq("x", "y"))
        .localCheckpoint(true)
      val s = next.agg(sum("lbl")).head.getLong(0)
      done = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    labels.withColumnRenamed("lbl", "cluster_id")
  }

  /** DuckDB twin: min reachable id via recursive CTE (expects `pos`). */
  val ccCte: String =
    """ids AS (SELECT x, y, x * 100000 + y AS id FROM pos),
      |edge AS (
      |  SELECT a.id AS src, b.id AS dst FROM ids a JOIN ids b
      |  ON (abs(a.x - b.x) + abs(a.y - b.y)) = 1
      |),
      |reach(id, lbl) AS (
      |  SELECT id, id FROM ids
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edge e ON e.src = r.id
      |),
      |cc AS (
      |  SELECT i.x, i.y, m.cluster_id
      |  FROM ids i JOIN (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id) m
      |  ON i.id = m.id
      |)""".stripMargin
}
