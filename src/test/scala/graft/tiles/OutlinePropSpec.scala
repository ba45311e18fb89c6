package graft.tiles

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the boundary-edge chainer over random 4-connected
  * tile blobs (random walks revisit cells freely, so they produce holes
  * and the degree-4 "diagonal pinch" vertices — exactly the shapes a
  * hand-written fixture misses). No SparkSession needed: chainEdges is
  * pure.
  */
class OutlinePropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** A 4-connected tile blob: the visited set of a random walk. */
  private val blobGen: Gen[Set[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 80)
    steps <- Gen.listOfN(n, Gen.oneOf((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L)))
  } yield steps.scanLeft((0L, 0L)) { (p, d) => (p._1 + d._1, p._2 + d._2) }.toSet

  /** Boundary = tile edges appearing exactly once (the a15 derivation). */
  private def boundaryEdges(tiles: Set[(Long, Long)]): Seq[((Long, Long), (Long, Long))] = {
    val count = scala.collection.mutable.Map.empty[((Long, Long), (Long, Long)), Int]
    tiles.foreach { case (x, y) =>
      Seq(((x, y), (x + 1, y)), ((x, y + 1), (x + 1, y + 1)),
        ((x, y), (x, y + 1)), ((x + 1, y), (x + 1, y + 1)))
        .foreach(e => count(e) = count.getOrElse(e, 0) + 1)
    }
    count.filter(_._2 == 1).keys.toSeq
  }

  private def shoelace2(ring: Seq[(Long, Long)]): Long = {
    var s = 0L; var j = ring.size - 1
    for (i <- ring.indices) { s -= (ring(i)._1 - ring(j)._1) * (ring(i)._2 + ring(j)._2); j = i }
    s
  }

  test("every boundary edge is covered exactly once by closed unit-step rings") {
    check(Prop.forAll(blobGen) { tiles =>
      val edges = boundaryEdges(tiles)
      val rings = Outline.chainEdges(edges)
      val walked = rings.flatMap { r =>
        (r :+ r.head).sliding(2).map { case Seq(a, b) =>
          if (Ordering.Tuple2[Long, Long].lteq(a, b)) (a, b) else (b, a)
        }
      }
      val unitSteps = rings.forall { r =>
        (r :+ r.head).sliding(2).forall { case Seq(a, b) =>
          math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1
        }
      }
      unitSteps && walked.sorted == edges.map { case (a, b) =>
        if (Ordering.Tuple2[Long, Long].lteq(a, b)) (a, b) else (b, a)
      }.sorted
    })
  }

  test("ring areas reconstruct the blob area: sum of signed areas == tile count") {
    check(Prop.forAll(blobGen) { tiles =>
      val rings = Outline.chainEdges(boundaryEdges(tiles))
      // outer rings count positive, holes negative — the signed sum over
      // all rings of one connected blob is exactly its tile count; this
      // also proves the winding post-pass (outer CCW, holes CW)
      rings.map(shoelace2).sum == 2L * tiles.size
    })
  }

  test("component stats from chained rings == direct edge aggregation (pinch-pairing invariant)") {
    // the a25_ring_stats contract: at vertex-connected-component
    // granularity, every stat derived from the WALKED rings must equal
    // what plain vertex-CC over the raw edge set computes (that is what
    // lets the DuckDB oracle verify the walk without reimplementing the
    // left-first turn rule) — including the signed-area identity
    // Σ shoelace2(ring) == Σ_vertical ±2x per component
    check(Prop.forAll(blobGen) { tiles =>
      val edges = boundaryEdges(tiles)
      val rings = Outline.chainEdges(edges)
      val got = Outline.componentStats(0L, rings)
        .map(s => (s.comp_x, s.comp_y, s.n_edges, s.area2,
          s.min_x, s.min_y, s.max_x, s.max_y, s.n_pinch)).sorted
      // reference: union-find over raw edge endpoints (no walk at all)
      val parent = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
      def find(v: (Long, Long)): (Long, Long) = {
        var r = v
        while (parent.getOrElseUpdate(r, r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val deg = scala.collection.mutable.Map.empty[(Long, Long), Int]
      edges.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0) + 1; deg(b) = deg.getOrElse(b, 0) + 1
      }
      val byComp = edges.groupBy { case (a, _) => find(a) }
      val want = byComp.values.map { es =>
        val verts = es.flatMap { case (a, b) => Seq(a, b) }.distinct
        val mn = verts.min
        val area2 = es.collect { case (a, b) if a._1 == b._1 => // vertical
          val insideLeft = !tiles.contains((a._1, math.min(a._2, b._2)))
          2L * a._1 * (if (insideLeft) 1L else -1L)
        }.sum
        (mn._1, mn._2, es.size.toLong, area2,
          verts.map(_._1).min, verts.map(_._2).min,
          verts.map(_._1).max, verts.map(_._2).max,
          verts.count(deg(_) == 4).toLong)
      }.toSeq.sorted
      got == want
    })
  }

  test("a32 collinear-drop corner count == turning vertices of the walked rings") {
    check(Prop.forAll(blobGen) { tiles =>
      val edges = boundaryEdges(tiles)
      // relational corner definition (the a32 twin, no walk): keep a
      // vertex unless exactly 2 incident edges share an orientation
      val inc = scala.collection.mutable.Map.empty[(Long, Long), (Int, Int)]
      edges.foreach { case (a, b) =>
        val h = if (a._2 == b._2) 1 else 0
        Seq(a, b).foreach { v =>
          val (n, nh) = inc.getOrElse(v, (0, 0)); inc(v) = (n + 1, nh + h)
        }
      }
      val relCorners = inc.count { case (_, (n, nh)) => !(n == 2 && (nh == 2 || nh == 0)) }
      // geometric corner definition: vertices where some ring visit
      // changes direction (the interior-left walker always turns at
      // pinches, so the two definitions agree vertex-for-vertex)
      val turns = Outline.chainEdges(edges).flatMap { r =>
        val n = r.size
        r.indices.flatMap { i =>
          val p = r((i + n - 1) % n); val v = r(i); val q = r((i + 1) % n)
          if ((v._1 - p._1, v._2 - p._2) != (q._1 - v._1, q._2 - v._2)) Some(v) else None
        }
      }.toSet
      relCorners == turns.size
    })
  }
}
