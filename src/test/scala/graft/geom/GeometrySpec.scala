package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import Geometry._

class GeometrySpec extends AnyFunSuite {

  private val square = Seq(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4))

  test("convexHull drops interior points and returns CCW ring") {
    val pts = square ++ Seq(Pt(2, 2), Pt(1, 3), Pt(3, 1))
    val hull = convexHull(pts)
    assert(hull.toSet == square.toSet)
    assert(signedArea(hull) > 0) // CCW
  }

  test("convexHull handles collinear input") {
    val hull = convexHull(Seq(Pt(0, 0), Pt(1, 1), Pt(2, 2), Pt(3, 3)))
    assert(hull.size == 2)
  }

  test("douglas-peucker keeps far vertices, drops near-collinear ones") {
    val line = Seq(Pt(0, 0), Pt(1, 0.01), Pt(2, -0.01), Pt(3, 5), Pt(4, 0))
    val simp = simplify(line, eps = 0.1)
    assert(simp.contains(Pt(3, 5)))
    assert(!simp.contains(Pt(1, 0.01)))
    assert(simp.head == line.head && simp.last == line.last)
  }

  test("bufferConvex grows a CCW square outward") {
    val buf = bufferConvex(square, 1.0)
    assert(buf.size == 4)
    assert(math.abs(signedArea(buf) - 36.0) < 1e-9) // 6x6 square
    assert(buf.forall(p => !pointInPolygon(p, square)))
  }

  test("pointInPolygon: inside, outside, and after buffering") {
    assert(pointInPolygon(Pt(2, 2), square))
    assert(!pointInPolygon(Pt(5, 5), square))
    val buffered = bufferConvex(square, 1.0)
    assert(pointInPolygon(Pt(-0.5, 2), buffered))
  }

  test("intersectConvex clips two overlapping squares to their overlap") {
    val shifted = square.map(p => Pt(p.x + 2, p.y + 2)) // overlap = 2x2
    val inter = intersectConvex(square, shifted)
    assert(math.abs(signedArea(inter) - 4.0) < 1e-9)
    assert(inter.forall(p => pointInPolygon(p, bufferConvex(square, 1e-9))))
    // disjoint squares clip to nothing
    val far = square.map(p => Pt(p.x + 10, p.y))
    assert(intersectConvex(square, far).size < 3)
  }

  test("unionArea by inclusion-exclusion and unionHull of overlapping rings") {
    val shifted = square.map(p => Pt(p.x + 2, p.y + 2))
    // |A| + |B| - |A∩B| = 16 + 16 - 4
    assert(math.abs(unionArea(square, shifted) - 28.0) < 1e-9)
    // hull-of-union covers both rings (the reference takes convex_hull
    // right after combine_all_polygons, so this IS its union consumer)
    val hull = unionHull(Seq(square, shifted))
    assert(signedArea(hull) >= 28.0 - 1e-9)
    val grown = bufferConvex(hull, 1e-9)
    assert((square ++ shifted).forall(p => pointInPolygon(p, grown) ||
      hull.contains(p)))
  }

  test("prepareSearchPolygon chain: hull -> simplify -> buffer") {
    val cloud = (for (x <- 0 to 10; y <- 0 to 10) yield Pt(x, y)) ++ Seq(Pt(5.0, 5.0))
    val poly = prepareSearchPolygon(cloud, eps = 0.01, r = 2.0)
    assert(signedArea(poly) > 100.0) // grew beyond the 10x10 hull
    assert(pointInPolygon(Pt(-1, 5), poly)) // buffered outward
  }
}
