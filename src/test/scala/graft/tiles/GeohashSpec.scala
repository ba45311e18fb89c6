package graft.tiles

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** A35 geohash: external known-answer + decode roundtrip.
  *
  * The known answer is Wikipedia's worked example — (lat 42.6,
  * lon −5.6) lies in cell `ezs42` — which pins the bit order (lon takes
  * the first/MSB bit), the base-32 alphabet (no a/i/l/o) and the
  * MSB-first digit cut all at once; any interleave/alphabet slip moves
  * the string. The roundtrip test decodes every emitted geohash back
  * through the inverse digit map and de-interleave and requires the
  * original (xi, yi) — bijectivity over the whole sf corpus.
  */
class GeohashSpec extends SparkTestBase {
  import GeoQueries.GeohashAlphabet

  test("a35 geohash known answer: lon -5.6 lat 42.6 is in ezs42") {
    // §4 integer encoding of the point: lon = -180 + k/100, lat = -85 + m/100
    val df = spark.range(1).select(
      lit(17440L).as("k"),  // -5.60
      lit(12760L).as("m"))  // 42.60
    val gh = GeoQueries.geohashCols(df).select("geohash").head.getString(0)
    assert(gh.startsWith("ezs42"), s"got $gh")
  }

  test("a35 geohash decodes back to (xi, yi) for every sf row") {
    val rows = GeoQueries.a35Geohash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xi, yi, g, gh) = (r.getAs[Long]("xi"), r.getAs[Long]("yi"),
        r.getAs[Long]("g"), r.getAs[String]("geohash"))
      assert(gh.length == 8)
      val gDec = gh.foldLeft(0L) { (acc, c) =>
        val d = GeohashAlphabet.indexOf(c)
        assert(d >= 0, s"bad geohash char $c")
        acc * 32 + d
      }
      assert(gDec == g)
      var (xd, yd) = (0L, 0L)
      (0 until 20).foreach { i =>
        xd |= ((g >> (2 * i + 1)) & 1L) << i
        yd |= ((g >> (2 * i)) & 1L) << i
      }
      assert(xd == xi && yd == yi, s"roundtrip ($xd,$yd) != ($xi,$yi)")
    }
  }

  test("a36 mixed cover expands back to exactly the a3 grid, and compresses") {
    val cover = GeoQueries.a36MixedCover(spark, sf).collect()
      .map(r => (r.getAs[Long]("poly"), r.getAs[Long]("zoom"),
        r.getAs[Long]("cx"), r.getAs[Long]("cy"), r.getAs[Long]("n_tiles")))
    assert(cover.nonEmpty)
    // some compression must actually happen on real polygons
    assert(cover.exists(_._2 < 21L), "no parent cell ever completed")
    val expanded = cover.flatMap { case (poly, zoom, cx, cy, n) =>
      val f = 1L << (21 - zoom.toInt)
      assert(n == f * f)
      for (dx <- 0L until f; dy <- 0L until f)
        yield (poly, cx * f + dx, cy * f + dy)
    }
    // disjoint (no tile covered twice) and complete (equals the grid)
    assert(expanded.length == expanded.distinct.length, "overlapping cover cells")
    val grid = GeoQueries.a3GridFill(spark, sf).collect()
      .map(r => (r.getAs[Long]("poly"), r.getAs[Long]("x"), r.getAs[Long]("y")))
    assert(expanded.toSet == grid.toSet)
  }
}
