package graft.tiles

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}

/** Ordered ring assembly for cluster outlines — the step between A15's
  * boundary edge SET and the polygon coordinate rings the reference
  * writes into MapRoulette challenge GeoJSON
  * (create_clustered_maproulette_geojson, maproulette.py:36-66).
  *
  * Chaining edges into a closed walk is inherently sequential per
  * cluster, so it runs as `flatMapGroups` over each cluster's (small —
  * O(perimeter)) edge list: the typed per-group escape hatch reserved
  * for imperative logic, while the heavy work (deriving the edge set
  * from millions of tiles) stays columnar in a15. Left-hand wall
  * following keeps the tile interior on the walker's left, so outer
  * rings emerge CCW and hole rings CW — GeoJSON RFC 7946 winding.
  */
object Outline {

  final case class BEdge(cluster_id: Long, x1: Long, y1: Long, x2: Long, y2: Long)

  /** One closed ring: vertices in walk order (not repeated at the end);
    * ring_idx 0.. per cluster, holes included.
    */
  final case class Ring(cluster_id: Long, ring_idx: Int, xs: Seq[Long], ys: Seq[Long]) {
    def vertices: Seq[(Long, Long)] = xs.zip(ys)
  }

  private val vertexOrd: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  /** Chain one cluster's unit boundary edges into closed rings. Input
    * edges are unordered unit segments on the lattice (each exactly
    * once); output rings cover every edge exactly once. At degree-4
    * vertices (two squares touching diagonally) the left-first turn
    * rule keeps each ring simple instead of crossing through.
    */
  def chainEdges(segs: Seq[((Long, Long), (Long, Long))]): Seq[Vector[(Long, Long)]] = {
    def norm(a: (Long, Long), b: (Long, Long)): ((Long, Long), (Long, Long)) =
      if (vertexOrd.lteq(a, b)) (a, b) else (b, a)
    val unused = mutable.TreeSet.empty(Ordering.Tuple2(vertexOrd, vertexOrd))
    segs.foreach { case (a, b) => unused += norm(a, b) }
    val rings = Vector.newBuilder[Vector[(Long, Long)]]
    while (unused.nonEmpty) {
      val v0 = unused.head._1 // lexicographically smallest open vertex
      // v0 is a minimal corner of its ring: its unused edges leave in +x
      // and/or +y. Starting along +x (fallback +y) with interior-left
      // walking yields CCW outer rings, CW holes.
      var heading: (Long, Long) =
        if (unused.contains(norm(v0, (v0._1 + 1, v0._2)))) (1L, 0L) else (0L, 1L)
      var cur = v0
      val ring = Vector.newBuilder[(Long, Long)]
      var closed = false
      var guard = 0
      while (!closed) {
        require(guard <= segs.size + 1, s"open boundary chain near $cur")
        guard += 1
        ring += cur
        val nxt = (cur._1 + heading._1, cur._2 + heading._2)
        unused -= norm(cur, nxt)
        cur = nxt
        if (cur == v0) closed = true
        else {
          val turns = Seq(
            (-heading._2, heading._1), // left
            heading, // straight
            (heading._2, -heading._1)) // right
          heading = turns
            .find(d => unused.contains(norm(cur, (cur._1 + d._1, cur._2 + d._2))))
            .getOrElse(sys.error(s"dangling boundary edge at $cur"))
        }
      }
      rings += ring.result()
    }
    // Winding post-pass: the ring holding the cluster's minimum vertex
    // is the outer boundary (CCW per RFC 7946); every other ring is a
    // hole (CW). The walk itself can't tell the two apart — a hole's
    // minimal corner looks locally identical to an outer one.
    val assembled = rings.result()
    if (assembled.isEmpty) assembled
    else {
      val globalMin = assembled.iterator.flatten.min(vertexOrd)
      assembled.map { r =>
        val a = shoelace2(r)
        val outer = r.contains(globalMin)
        if ((outer && a < 0) || (!outer && a > 0)) r.reverse else r
      }
    }
  }

  /** Twice the signed shoelace area, exact in Long. */
  private[tiles] def shoelace2(ring: Seq[(Long, Long)]): Long = {
    var s = 0L
    var j = ring.size - 1
    var i = 0
    while (i < ring.size) {
      s += (ring(i)._1 - ring(j)._1) * (ring(i)._2 + ring(j)._2)
      j = i; i += 1
    }
    -s
  }

  /** Aggregate stats for one vertex-connected boundary component: rings
    * that share a pinch (degree-4) vertex are merged. At that
    * granularity every stat is invariant to HOW `chainEdges` pairs the
    * four edges at a pinch — the edge set, its bbox and the
    * interior-left signed area sum don't depend on the turn rule — so a
    * SQL oracle can recompute them from the raw a15 edge set with plain
    * vertex connected-components, while the Spark values come from the
    * assembled rings and therefore still hash-check the chaining itself
    * (lost edge, broken winding, wrong shoelace all shift a component
    * row). Verified equivalent on all 955 sf0.01 rings before shipping.
    */
  final case class CompStats(cluster_id: Long, comp_x: Long, comp_y: Long,
      n_edges: Long, area2: Long, min_x: Long, min_y: Long,
      max_x: Long, max_y: Long, n_pinch: Long)

  /** Merge one cluster's rings into vertex-connected components and
    * fold each component's stats. O(perimeter α) per cluster — same
    * bound as the chaining that produced the rings.
    */
  def componentStats(cid: Long, ringSeq: Seq[Vector[(Long, Long)]]): Seq[CompStats] = {
    val parent = mutable.Map.empty[Int, Int]
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    ringSeq.indices.foreach(i => parent(i) = i)
    val firstRingOf = mutable.Map.empty[(Long, Long), Int]
    ringSeq.zipWithIndex.foreach { case (r, i) =>
      r.foreach { v =>
        firstRingOf.get(v) match {
          case Some(j) => parent(find(i)) = find(j)
          case None => firstRingOf(v) = i
        }
      }
    }
    val visits = mutable.Map.empty[(Long, Long), Int] // multiplicity 2 = pinch
    ringSeq.foreach(_.foreach(v => visits(v) = visits.getOrElse(v, 0) + 1))
    ringSeq.zipWithIndex
      .groupBy { case (_, i) => find(i) }
      .values.map { group =>
        val rings = group.map(_._1)
        val verts = rings.flatten
        val mn = verts.min(vertexOrd)
        CompStats(cid, mn._1, mn._2,
          n_edges = rings.map(_.size.toLong).sum,
          area2 = rings.map(shoelace2).sum,
          min_x = verts.iterator.map(_._1).min, min_y = verts.iterator.map(_._2).min,
          max_x = verts.iterator.map(_._1).max, max_y = verts.iterator.map(_._2).max,
          n_pinch = verts.distinct.count(v => visits(v) == 2).toLong)
      }.toSeq
  }

  /** Assemble the a15 edge frame (cluster_id, x1, y1, x2, y2) into
    * ordered rings, one row per ring.
    */
  def assembleRings(edges: DataFrame): Dataset[Ring] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select("cluster_id", "x1", "y1", "x2", "y2").as[BEdge]
      .groupByKey(_.cluster_id)
      .flatMapGroups { (cid: Long, it: Iterator[BEdge]) =>
        val segs = it.map(e => ((e.x1, e.y1), (e.x2, e.y2))).toSeq
        chainEdges(segs).zipWithIndex.iterator.map { case (ring, i) =>
          Ring(cid, i, ring.map(_._1), ring.map(_._2))
        }
      }
  }
}
