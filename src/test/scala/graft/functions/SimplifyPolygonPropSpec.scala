package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the A44 kernel over RANDOM integer point sets
  * — duplicates, collinear runs, and degenerate (< 3-vertex-hull)
  * clouds included — against a third derivation (the oracle CTE chain
  * and SimplifyPolygonSpec's monotone-chain recompute are the other
  * two): a direct straddling-pair chain test + recursive depth-capped
  * DP, written independently of the kernel's sorted-index loops.
  */
class SimplifyPolygonPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val ptGen: Gen[(Long, Long)] = for {
    x <- Gen.chooseNum(0L, 12L) // small domain → duplicates + collinear hits
    y <- Gen.chooseNum(0L, 12L)
  } yield (x, y)

  private val cloudGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 14).flatMap(n => Gen.listOfN(n, ptGen))

  private def fold(pts: Seq[(Long, Long)], tol: Long, bufD: Long,
      levels: Int): (Long, Long, Long, Long, Long, Long) = {
    val arr = new GenericArrayData(pts.map { case (x, y) =>
      new GenericInternalRow(Array[Any](x, y)) }.toArray[Any])
    val r = SimplifyPolygonStats.fold(arr, tol, bufD, levels)
      .asInstanceOf[InternalRow]
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))
  }

  /** Independent recompute — set-comprehension chain test, recursion. */
  private def reference(ptsIn: Seq[(Long, Long)], tol: Long, bufD: Long,
      levels: Int): (Long, Long, Long, Long, Long, Long) = {
    val pts = ptsIn.distinct
    def lexLt(a: (Long, Long), b: (Long, Long)) =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    def cross(a: (Long, Long), b: (Long, Long), p: (Long, Long)) =
      (b._1 - a._1) * (p._2 - a._2) - (b._2 - a._2) * (p._1 - a._1)
    def chain(upper: Boolean): IndexedSeq[(Long, Long)] =
      pts.filter { p =>
        !pts.exists(a => lexLt(a, p) && pts.exists(b => lexLt(p, b) &&
          (if (upper) cross(a, b, p) <= 0 else cross(a, b, p) >= 0)))
      }.sortBy(identity).toIndexedSeq
    val (lo, up) = (chain(upper = false), chain(upper = true))
    def dp(ch: IndexedSeq[(Long, Long)]): Set[Int] = {
      def rec(a: Int, b: Int, lvl: Int): Set[Int] =
        if (lvl > levels || b - a < 2) Set.empty
        else {
          val (cr, pos) = (a + 1 until b)
            .map(p => (math.abs(cross(ch(a), ch(b), ch(p))), p))
            .maxBy(t => (t._1, -t._2))
          val dx = ch(b)._1 - ch(a)._1
          val dy = ch(b)._2 - ch(a)._2
          if (cr * cr > tol * tol * (dx * dx + dy * dy))
            Set(pos) ++ rec(a, pos, lvl + 1) ++ rec(pos, b, lvl + 1)
          else Set.empty
        }
      Set(0, ch.size - 1) ++ (if (ch.size >= 3) rec(0, ch.size - 1, 1) else Set.empty)
    }
    def stats(ring: Seq[(Long, Long)]): (Long, Long, Long) = {
      val cl = ring :+ ring.head
      (ring.size.toLong,
        math.abs(cl.sliding(2).map(w => w(0)._1 * w(1)._2 - w(1)._1 * w(0)._2).sum),
        cl.sliding(2).map(w => math.abs(w(1)._1 - w(0)._1) + math.abs(w(1)._2 - w(0)._2)).sum)
    }
    def ring(kl: Set[Int], ku: Set[Int]) =
      lo.indices.filter(kl).map(lo) ++ (up.size - 2 to 1 by -1).filter(ku).map(up)
    val (nh, ha, _) = stats(ring(lo.indices.toSet, up.indices.toSet))
    val (nk, sa, l1) = stats(ring(dp(lo), dp(up)))
    (nh, ha, nk, sa, l1, sa + 2 * bufD * l1 + 8 * bufD * bufD)
  }

  test("kernel == independent recompute on random clouds (dups, collinear, degenerate)") {
    check(Prop.forAll(cloudGen, Gen.chooseNum(0L, 8L)) { (pts, tol) =>
      fold(pts, tol, 24L, 14) == reference(pts, tol, 24L, 14)
    })
  }

  test("input order and duplication never change the fold") {
    check(Prop.forAll(cloudGen) { pts =>
      val base = fold(pts, 6L, 24L, 14)
      fold(pts.reverse, 6L, 24L, 14) == base &&
        fold(pts ++ pts, 6L, 24L, 14) == base
    })
  }

  test("tol = 0 keeps the whole hull; huge tol keeps only the diameter segment") {
    check(Prop.forAll(cloudGen) { pts =>
      val (nh, ha, nk0, sa0, _, _) = fold(pts, 0L, 24L, 14)
      val all = nk0 == nh && sa0 == ha
      // MaxTol is the largest legal tolerance (the overflow cap) and
      // dwarfs any deviation on the 0..12 coordinate domain
      val (_, _, nkInf, saInf, _, _) =
        fold(pts, SimplifyPolygonStats.MaxTol, 24L, 14)
      val seg = nh < 3 || (nkInf == 2 && saInf == 0)
      all && seg
    })
  }

  test("kept ring nests inside the hull: n_kept <= n_hull, areas ordered, buffer grows") {
    check(Prop.forAll(cloudGen, Gen.chooseNum(0L, 20L)) { (pts, tol) =>
      val (nh, ha, nk, sa, l1, buf) = fold(pts, tol, 24L, 14)
      nk <= nh && sa <= ha && buf >= sa && l1 >= 0
    })
  }
}
