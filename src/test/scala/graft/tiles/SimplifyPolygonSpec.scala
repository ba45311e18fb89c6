package graft.tiles

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.SimplifyPolygonStats
import graft.geom.Geometry
import graft.geom.Geometry.Pt

/** Operator-specific checks for A44/A45 beyond the PlanContract sweep
  * and the DuckDB oracle: an INDEPENDENT per-shape recompute of the
  * whole hull → DP → buffer fold (different hull algorithm — monotone
  * chain from [[Geometry.convexHull]] instead of the kernel's pairwise
  * characterization — and a recursive DP instead of the kernel's
  * level-BFS), plus the kernel's loud-failure contract and the a45
  * claimants re-expansion.
  */
class SimplifyPolygonSpec extends SparkTestBase {

  private val tol = GeoQueries.DpTol
  private val bufD = GeoQueries.BufD
  private val levels = 5

  /** Independent recompute: monotone-chain hull, recursive depth-capped
    * DP, shoelace/L1 ring algebra — shares no code with the kernel.
    */
  private def expected(ptsIn: Seq[(Long, Long)])
      : Option[(Long, Long, Long, Long, Long, Long)] = {
    val pts = ptsIn.distinct.sorted
    val ring = Geometry.convexHull(pts.map(p => Pt(p._1.toDouble, p._2.toDouble)))
      .map(p => (p.x.toLong, p.y.toLong))
    if (ring.size < 3) return None
    // CCW from lex-min: split at lex-max into lower (asc) / upper (asc)
    val iMax = ring.indexOf(pts.max)
    val lower = ring.take(iMax + 1).toIndexedSeq
    val upper = ((ring.drop(iMax) :+ ring.head).reverse).toIndexedSeq

    def dp(ch: IndexedSeq[(Long, Long)]): Set[Int] = {
      val kept = mutable.Set(0, ch.size - 1)
      def rec(lo: Int, hi: Int, level: Int): Unit = {
        if (level > levels || hi - lo < 2) return
        val (ax, ay) = ch(lo)
        val (bx, by) = ch(hi)
        val (cr, pos) = (lo + 1 until hi)
          .map(p => (math.abs((bx - ax) * (ch(p)._2 - ay) -
            (by - ay) * (ch(p)._1 - ax)), p))
          .maxBy(t => (t._1, -t._2))
        val len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        if (cr * cr > tol * tol * len2) {
          kept += pos
          rec(lo, pos, level + 1)
          rec(pos, hi, level + 1)
        }
      }
      if (ch.size >= 3) rec(0, ch.size - 1, 1)
      kept.toSet
    }

    def stats(seq: Seq[(Long, Long)]): (Long, Long, Long) = {
      val closed = seq :+ seq.head
      val area2 = math.abs(closed.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        x1 * y2 - x2 * y1 }.sum)
      val l1 = closed.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        math.abs(x2 - x1) + math.abs(y2 - y1) }.sum
      (seq.size.toLong, area2, l1)
    }

    def ringOf(keptL: Set[Int], keptU: Set[Int]): Seq[(Long, Long)] =
      lower.indices.filter(keptL).map(lower) ++
        (upper.size - 2 to 1 by -1).filter(keptU).map(upper)

    val (nHull, hullArea2, _) = stats(ringOf(lower.indices.toSet, upper.indices.toSet))
    val (nKept, simpArea2, l1) = stats(ringOf(dp(lower), dp(upper)))
    Some((nHull, hullArea2, nKept, simpArea2, l1,
      simpArea2 + 2L * bufD * l1 + 8L * bufD * bufD))
  }

  test("a44 matches an independent hull+DP+buffer recompute on every sf0.001 shape") {
    val verts = graft.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("shape_id"),
        (col("l_partkey") % 97L).as("vx"),
        when(col("l_orderkey") % 7L === 0L, col("l_partkey") % 97L)
          .otherwise((col("l_partkey") * 31L) % 89L).as("vy"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    val want = verts.flatMap { case (sid, pts) =>
      expected(pts).map(sid -> _) }
    val got = GeoQueries.a44SimplifyPolygon(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == want.keySet)
    assert(want.nonEmpty)
    want.foreach { case (sid, w) =>
      assert(got(sid) == w, s"shape $sid: got ${got(sid)}, want $w")
    }
  }

  test("a44 kernel fails loudly when DP spans outlive the level cap") {
    // strictly convex arch: upper chain has 9 interior points; with
    // tol = 0 every pick passes, so a 1-level cap must leave open spans
    val pts = Seq((0L, 0L), (1L, 5L), (2L, 9L), (3L, 12L), (4L, 14L), (5L, 15L),
      (6L, 14L), (7L, 12L), (8L, 9L), (9L, 5L), (10L, 0L))
    val arr = new GenericArrayData(pts.map { case (x, y) =>
      new GenericInternalRow(Array[Any](x, y)) }.toArray[Any])
    val e = intercept[IllegalStateException](
      SimplifyPolygonStats.fold(arr, 0L, bufD, 1))
    assert(e.getMessage.contains("open DP spans"))
    // the same corpus folds fine with headroom
    SimplifyPolygonStats.fold(arr, 0L, bufD, 9)
  }

  test("a46 overlap matrix == brute-force pairwise set intersection of the fills") {
    val byPoly = GridOps.fillPolygons(spark).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val polys = byPoly.keys.toSeq.sorted
    val want = (for {
      a <- polys; b <- polys if a < b
      sh = (byPoly(a) & byPoly(b)).size.toLong if sh > 0
    } yield {
      val (na, nb) = (byPoly(a).size.toLong, byPoly(b).size.toLong)
      (a, b, na, nb, sh, sh * 1000000L / (na + nb - sh))
    }).sorted
    val got = GeoQueries.a46OverlapMatrix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // the corpus genuinely overlaps somewhere, and never totally
    assert(want.nonEmpty)
    assert(want.forall(t => t._6 > 0L && t._6 < 1000000L))
  }

  test("a45 claimants re-expand to exactly the per-polygon grid fills") {
    val fills = GridOps.fillPolygons(spark).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val got = GeoQueries.a45PolygonUnion(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.length == fills.size)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val polys = r.getAs[String]("claimants").split(',').map(_.toLong).toSeq
      assert(r.getLong(2) == polys.size, s"tile $key n_claims")
      assert(polys == fills(key), s"tile $key claimants ${polys} != ${fills(key)}")
    }
  }
}
