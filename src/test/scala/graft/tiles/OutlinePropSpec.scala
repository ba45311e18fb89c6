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
}
