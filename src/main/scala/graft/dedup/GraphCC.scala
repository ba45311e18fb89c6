package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic min-label connected components over an arbitrary undirected
  * edge list — the graph twin of the grid-specialized
  * [[graft.tiles.Clustering]] loop, used to collapse near-duplicate
  * document pairs into canonical clusters (C19).
  *
  * Same algebra: neighbor-min (one edge join + partial-agg shuffle per
  * round) then double pointer jump (label(v) ← label(label(v))), so
  * rounds ≈ log4(component diameter) — and near-dup similarity graphs
  * are near-cliques, so 2-3 rounds in practice. Lineage truncated per
  * round with a lazy localCheckpoint materialized by the convergence
  * sum; the sum runs in DECIMAL(38,0) so packed/large ids can't overflow
  * under ANSI. Per-round traffic is O(|E| + |V|): at 100 TB both shuffle
  * keys (vertex id) are high-cardinality and skew-free after the LSH
  * supernode stage has already collapsed exact-duplicate groups.
  */
object GraphCC {

  /** vertices: one `id` column; edges: `src`, `dst` (any orientation,
    * duplicates fine — both are normalized). Returns (id, cluster_id)
    * where cluster_id = min vertex id of the component.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 40): DataFrame = {
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    def stamp(what: String): Unit =
      if (debug) System.err.println(s"[gcc] $what t=${System.nanoTime() / 1e9}")
    stamp("start")
    // undirected, deduped edge list. The input is sealed FIRST — the
    // union's two branches would otherwise each evaluate the (possibly
    // expensive) edge-derivation subtree.
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val und = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    stamp(s"edges materialized")
    var labels = vertices.select(col("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    stamp("labels")
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = lblSum(labels)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // neighbor-min: push labels across edges (every dst is a real
      // vertex, so no membership filter), aggregate the incoming
      // messages, and fold them into the vertex's own label with a left
      // join + least — deliberately NOT a union of the message and label
      // frames: union children sharing attribute lineage trip Catalyst's
      // constraint rewriting. Materialized eagerly so the two pointer
      // jumps below self-join a sealed frame and plans stay O(1).
      val msgs = und
        .join(labels.select(col("id").as("src"), col("lbl").as("mlbl")), "src")
        .groupBy("dst").agg(min("mlbl").as("mlbl"))
        .withColumnRenamed("dst", "id")
      val nmin = labels.join(msgs, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("mlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val parents = nmin.select(col("id").as("pid"), col("lbl").as("plbl"))
      def jump(df: DataFrame, tag: String): DataFrame =
        df.as("l").join(parents.as(tag), col("l.lbl") === col(s"$tag.pid"), "left")
          .select(col("l.id").as("id"),
            least(col("l.lbl"), coalesce(col(s"$tag.plbl"), col("l.lbl"))).as("lbl"))
      val next = jump(jump(nmin, "p1"), "p2").localCheckpoint(false)
      val s = lblSum(next)
      done = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
      stamp(s"round $iter done=$done")
    }
    labels.withColumnRenamed("lbl", "cluster_id")
  }
}
