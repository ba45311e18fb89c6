package graft.tiles

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components of positive tiles under 4-neighbor adjacency —
  * the reference's cluster detection (run_inference.py:21-60), which is a
  * driver-recursive DFS there, re-expressed as distributed label
  * propagation.
  *
  * Each round does two steps:
  *   1. neighbor-min: label(c) ← min(label over c and its 4 neighbors)
  *      — one map-side 4-way union of shifted copies + one agg shuffle
  *      keyed on (x, y);
  *   2. pointer jump (path halving): label(c) ← label(label(c)) — one
  *      equi-join shuffle keyed on the label id.
  * Neighbor-min alone needs diameter-many rounds (a solar-farm blob at
  * z21 can span thousands of tiles); the jump step doubles propagation
  * distance per round, giving O(log diameter) rounds total. Lineage is
  * truncated every round with eager localCheckpoint so plans stay O(1);
  * convergence is detected via the strictly-decreasing global label sum.
  *
  * At 100 TB the same loop holds: both shuffle keys (cell coordinate,
  * label id) are high-cardinality; per-round traffic is |positive
  * cells|, never the full tile fact; checkpoint would go to durable
  * storage instead of local blocks.
  */
object Clustering {

  /** cells must have integer columns x, y. Returns (x, y, cluster_id)
    * where cluster_id = min (x*100000+y) over the component.
    */
  def connectedComponents4(cells: DataFrame, maxIter: Int = 60): DataFrame = {
    // sum(lbl) is null on an empty frame — coalesce so an empty input
    // converges immediately instead of NPE-ing
    def lblSum(df: DataFrame): Long =
      df.agg(coalesce(sum("lbl"), lit(0L))).head.getLong(0)
    val keys = cells.select("x", "y").distinct().localCheckpoint(true)
    var labels = keys.withColumn("lbl", col("x") * lit(100000L) + col("y"))
      .localCheckpoint(true)
    var prevSum = lblSum(labels)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // 1. neighbor-min over the 4-adjacency
      val shifted = Seq((0L, 1L), (0L, -1L), (1L, 0L), (-1L, 0L)).map { case (dx, dy) =>
        labels.select((col("x") + lit(dx)).as("x"), (col("y") + lit(dy)).as("y"), col("lbl"))
      }.reduce(_ union _)
      val nmin = shifted.union(labels)
        .groupBy("x", "y").agg(min("lbl").as("lbl"))
        .join(keys, Seq("x", "y"))
      // 2. pointer jump: follow the label to ITS current label (labels
      // are always live cell ids, so the self-join always resolves);
      // one jump doubles propagation distance per round — a second jump
      // was measured slower (extra join outweighs the round savings)
      val ids = nmin.select(col("x"), col("y"),
        (col("x") * lit(100000L) + col("y")).as("id"), col("lbl"))
      val parents = ids.select(col("id").as("pid"), col("lbl").as("plbl"))
      val next = ids.join(parents, ids("lbl") === parents("pid"), "left")
        .select(col("x"), col("y"),
          least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val s = lblSum(next)
      done = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    labels.withColumnRenamed("lbl", "cluster_id")
  }

  /** Session-scoped memo of the positive-tile components per testdata
    * dir: four production queries (a7/a8/a13/a15) consume the identical
    * component labeling, so it's computed once and shared — an explicit
    * materialized intermediate, same determinism, same results.
    */
  private val ccCache = TrieMap.empty[(String, String), DataFrame]

  def componentsFor(spark: SparkSession, dir: String): DataFrame =
    ccCache.getOrElseUpdate((spark.sparkContext.applicationId, dir),
      connectedComponents4(GeoDerive.positives(spark, dir)).localCheckpoint(true))

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
