package graft.geom

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import Geometry._

class GeometryPropSpec extends AnyFunSuite {

  /** scalatestplus isn't on the classpath; run scalacheck directly. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val ptGen: Gen[Pt] = for {
    x <- Gen.chooseNum(-100.0, 100.0)
    y <- Gen.chooseNum(-100.0, 100.0)
  } yield Pt(x, y)

  private val cloudGen: Gen[Seq[Pt]] = Gen.chooseNum(3, 60).flatMap(n => Gen.listOfN(n, ptGen))

  test("hull is idempotent: hull(hull(p)) == hull(p)") {
    check(Prop.forAll(cloudGen) { pts =>
      val h = convexHull(pts)
      h.size < 3 || convexHull(h).toSet == h.toSet
    })
  }

  test("hull is CCW with non-negative area and contains every input point") {
    check(Prop.forAll(cloudGen) { pts =>
      val h = convexHull(pts)
      h.size < 3 || {
        val grown = bufferConvex(h, 1e-6) // boundary-tolerant containment
        signedArea(h) >= 0 && pts.forall(p => pointInPolygon(p, grown))
      }
    })
  }

  test("simplify never loses the endpoints and never adds points") {
    check(Prop.forAll(cloudGen, Gen.chooseNum(0.0, 10.0)) { (pts, eps) =>
      val s = simplify(pts, eps)
      s.head == pts.head && s.last == pts.last && s.size <= pts.size
    })
  }

  test("buffering a hull by r grows the area") {
    check(Prop.forAll(cloudGen, Gen.chooseNum(0.1, 5.0)) { (pts, r) =>
      val h = convexHull(pts)
      h.size < 3 || signedArea(bufferConvex(h, r)) > signedArea(h)
    })
  }

  test("points strictly outside the bbox are outside the polygon") {
    check(Prop.forAll(cloudGen) { pts =>
      val h = convexHull(pts)
      h.size < 3 || {
        val maxx = h.map(_.x).max
        !pointInPolygon(Pt(maxx + 1.0, h.head.y), h)
      }
    })
  }
}
