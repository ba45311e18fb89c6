package graft.geom

/** Pure-Scala computational geometry mirroring the reference's polygon
  * preprocessing (`simplify_polygon`, process_city_shapes.py:93-104:
  * convex hull → Douglas-Peucker simplify → buffer) and the
  * point-in-polygon containment used by the grid fill
  * (process_city_shapes.py:146-171).
  *
  * Driver-side only by design: polygons are the tiny dimension (a city
  * outline has 10²–10⁴ vertices); all per-tile work happens in column
  * expressions (see graft.tiles.GridOps). Nothing here touches Spark.
  */
object Geometry {

  final case class Pt(x: Double, y: Double)

  private def cross(o: Pt, a: Pt, b: Pt): Double =
    (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)

  /** Convex hull, Andrew monotone chain, CCW order, no collinear points.
    * O(n log n); first hull point = lexicographic minimum.
    */
  def convexHull(points: Seq[Pt]): Seq[Pt] = {
    val pts = points.distinct.sortBy(p => (p.x, p.y))
    if (pts.size <= 2) return pts
    def half(ps: Seq[Pt]): Vector[Pt] =
      ps.foldLeft(Vector.empty[Pt]) { (h, p) =>
        var hull = h
        while (hull.size >= 2 && cross(hull(hull.size - 2), hull.last, p) <= 0)
          hull = hull.init
        hull :+ p
      }
    val lower = half(pts)
    val upper = half(pts.reverse)
    (lower.init ++ upper.init)
  }

  /** Douglas-Peucker polyline simplification with tolerance eps:
    * keeps endpoints, recursively keeps the farthest-from-chord vertex
    * while it exceeds eps.
    */
  def simplify(points: Seq[Pt], eps: Double): Seq[Pt] = {
    if (points.size < 3) return points
    def perpDist(p: Pt, a: Pt, b: Pt): Double = {
      val dx = b.x - a.x; val dy = b.y - a.y
      val len = math.hypot(dx, dy)
      if (len == 0) math.hypot(p.x - a.x, p.y - a.y)
      else math.abs(dx * (a.y - p.y) - (a.x - p.x) * dy) / len
    }
    def rec(ps: Seq[Pt]): Seq[Pt] = {
      if (ps.size < 3) return ps
      val (a, b) = (ps.head, ps.last)
      val (maxD, maxI) = ps.zipWithIndex.drop(1).dropRight(1)
        .map { case (p, i) => (perpDist(p, a, b), i) }
        .maxBy(_._1)
      if (maxD <= eps) Seq(a, b)
      else rec(ps.take(maxI + 1)) ++ rec(ps.drop(maxI)).tail
    }
    rec(points)
  }

  /** Closed-ring simplification: simplifies with a fixed anchor (first
    * vertex), as the reference does to its hull before buffering.
    */
  def simplifyRing(ring: Seq[Pt], eps: Double): Seq[Pt] = {
    if (ring.size < 4) ring
    else simplify(ring :+ ring.head, eps).init
  }

  /** Outward buffer of a convex CCW ring by r: Minkowski sum with a
    * disc, approximated by offsetting each edge outward along its normal
    * and intersecting adjacent offset edges (miter join — exact for
    * convex rings, matching the reference's shapely `buffer` use on
    * already-convex hulls).
    */
  def bufferConvex(ring: Seq[Pt], r: Double): Seq[Pt] = {
    val n = ring.size
    require(n >= 3, "ring needs >= 3 vertices")
    // offset line per edge: point + unit outward normal * r
    val lines = (0 until n).map { i =>
      val a = ring(i); val b = ring((i + 1) % n)
      val len = math.hypot(b.x - a.x, b.y - a.y)
      val nx = (b.y - a.y) / len; val ny = -(b.x - a.x) / len // outward for CCW
      (Pt(a.x + nx * r, a.y + ny * r), Pt(b.x + nx * r, b.y + ny * r))
    }
    // vertex i' = intersection of edge (i-1)' and edge i'
    (0 until n).map { i =>
      val (p1, p2) = lines((i + n - 1) % n)
      val (p3, p4) = lines(i)
      val d1x = p2.x - p1.x; val d1y = p2.y - p1.y
      val d2x = p4.x - p3.x; val d2y = p4.y - p3.y
      val den = d1x * d2y - d1y * d2x
      if (math.abs(den) < 1e-12) p3 // collinear edges: offset point
      else {
        val t = ((p3.x - p1.x) * d2y - (p3.y - p1.y) * d2x) / den
        Pt(p1.x + t * d1x, p1.y + t * d1y)
      }
    }
  }

  /** Ray-casting point-in-polygon (boundary counts as inside for
    * horizontal-ray edge crossings on the left).
    */
  def pointInPolygon(p: Pt, ring: Seq[Pt]): Boolean = {
    var inside = false
    var j = ring.size - 1
    var i = 0
    while (i < ring.size) {
      val a = ring(i); val b = ring(j)
      if ((a.y > p.y) != (b.y > p.y) &&
        p.x < (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Signed area (positive for CCW). */
  def signedArea(ring: Seq[Pt]): Double = {
    var s = 0.0
    var j = ring.size - 1
    for (i <- ring.indices) { s += (ring(j).x + ring(i).x) * (ring(j).y - ring(i).y); j = i }
    -s / 2.0
  }

  /** Sutherland–Hodgman clip: intersection of a polygon with a CONVEX
    * CCW clip ring. Exact for convex⋂convex; for a concave subject the
    * result is the standard clipped (possibly degenerate-edged) ring.
    */
  def intersectConvex(subject: Seq[Pt], clip: Seq[Pt]): Seq[Pt] = {
    require(clip.size >= 3, "clip ring needs >= 3 vertices")
    def inside(p: Pt, a: Pt, b: Pt): Boolean = cross(a, b, p) >= 0
    def lineIntersect(p1: Pt, p2: Pt, a: Pt, b: Pt): Pt = {
      val d1x = p2.x - p1.x; val d1y = p2.y - p1.y
      val d2x = b.x - a.x; val d2y = b.y - a.y
      val den = d1x * d2y - d1y * d2x
      val t = ((a.x - p1.x) * d2y - (a.y - p1.y) * d2x) / den
      Pt(p1.x + t * d1x, p1.y + t * d1y)
    }
    clip.indices.foldLeft(subject) { (poly, i) =>
      if (poly.isEmpty) poly
      else {
        val a = clip(i); val b = clip((i + 1) % clip.size)
        val out = Vector.newBuilder[Pt]
        var j = 0
        while (j < poly.size) {
          val cur = poly(j)
          val prev = poly((j + poly.size - 1) % poly.size)
          (inside(prev, a, b), inside(cur, a, b)) match {
            case (true, true) => out += cur
            case (true, false) => out += lineIntersect(prev, cur, a, b)
            case (false, true) => out += lineIntersect(prev, cur, a, b); out += cur
            case (false, false) => ()
          }
          j += 1
        }
        out.result()
      }
    }
  }

  /** Union of polygon rings as the reference consumes it
    * (combine_all_polygons, process_city_shapes.py:80-90, immediately
    * followed by convex_hull in simplify_polygon): hull of the union =
    * hull of all vertices, so the union itself never needs an explicit
    * boundary walk in that chain.
    */
  def unionHull(rings: Seq[Seq[Pt]]): Seq[Pt] = convexHull(rings.flatten)

  /** Exact area of the union of two convex CCW rings by
    * inclusion–exclusion: |A∪B| = |A| + |B| − |A∩B|.
    */
  def unionArea(a: Seq[Pt], b: Seq[Pt]): Double = {
    val inter = intersectConvex(a, b)
    signedArea(a) + signedArea(b) - (if (inter.size >= 3) signedArea(inter) else 0.0)
  }

  /** The reference's full preprocessing chain
    * (process_city_shapes.py:93-104): hull → simplify(eps) → buffer(r).
    */
  def prepareSearchPolygon(points: Seq[Pt], eps: Double, r: Double): Seq[Pt] =
    bufferConvex(simplifyRing(convexHull(points), eps), r)

  /** Multi-ring variant: union-hull of several city rings → one search
    * polygon, the combine_all_polygons → simplify_polygon flow.
    */
  def prepareCombinedSearchPolygon(rings: Seq[Seq[Pt]], eps: Double, r: Double): Seq[Pt] =
    bufferConvex(simplifyRing(unionHull(rings), eps), r)
}
