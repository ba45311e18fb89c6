package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `simplify_polygon_stats(verts, tol, d, levels)`: the ENTIRE A44
  * hull → Douglas-Peucker → buffer computation (the reference's
  * `simplify_polygon`, process_city_shapes.py:93-104) as ONE scalar
  * fold over a shape's collected vertex array (SURVEY.md §2 A44).
  *
  * Why a fold and not joins: each shape's vertex set is value-domain
  * bounded (≤ 7 distinct lineitem-derived vertices), so the per-shape
  * work is O(1) — but expressed relationally it took 3 within-shape
  * joins for the hull plus [[graft.tiles.GeoQueries.DpLevels]] unrolled
  * join levels (each with a row_number window and a localCheckpoint)
  * for the DP stack: 16+ joins, 6 materialized jobs, and lineage
  * truncation that turns an executor loss into a job failure. As a
  * fold the whole query is `groupBy(shape_id)` + this expression — ONE
  * shuffle of narrow rows, no checkpoints, and the per-shape kernel
  * runs inside whole-stage codegen via a static call. At 100 TB the
  * shuffle carries only (shape_id, vx, vy) triples and partial
  * collect_list buffers are bounded by the per-shape vertex count.
  *
  * Semantics are pinned to the relational form the DuckDB oracle still
  * runs (a genuinely independent derivation — the two engines share no
  * code path):
  *
  *  1. STRICT HULL CHAINS by the pairwise characterization: vertex p
  *     is on the lower (upper) chain iff NO lex-straddling pair (a, b)
  *     has cross(a, b, p) ≥ 0 (≤ 0); lex endpoints qualify vacuously.
  *  2. DOUGLAS-PEUCKER per chain, exact integers (keep the
  *     argmax-|cross| interior point iff cross² > tol²·|b−a|², ties to
  *     the smaller position), capped at `levels` recursion levels — the
  *     same unroll bound as the oracle's CTE chain. A span surviving
  *     past the cap throws (the advisor's loud-failure rule: a corpus
  *     with more interior points per chain than `levels` would
  *     otherwise silently under-simplify while the oracle truncates
  *     identically, co-hiding the drift).
  *  3. RING STATS over lower-asc + upper-interior-desc sequencing with
  *     wrap-around closure: count, |shoelace| doubled area, L1
  *     perimeter; buffered doubled area = area2 + 2·d·Σ(|dx|+|dy|) +
  *     8·d² (Minkowski dilation by the square of half-width d,
  *     rectilinear like A9).
  *
  * Input vertices need not be distinct or ordered (the kernel dedups
  * and lex-sorts), so the caller can collect_list raw projected rows —
  * no upstream DISTINCT shuffle.
  */
case class SimplifyPolygonStats(child: Expression, tol: Long, bufD: Long, levels: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simplify_polygon_stats expects array<struct<bigint,bigint>>, got ${dt.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_hull", LongType, nullable = false),
    StructField("hull_area2", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("simp_area2", LongType, nullable = false),
    StructField("l1_perim", LongType, nullable = false),
    StructField("buf_area2", LongType, nullable = false)))

  override protected def nullSafeEval(v: Any): Any =
    SimplifyPolygonStats.fold(v.asInstanceOf[ArrayData], tol, bufD, levels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimplifyPolygonStats.fold($a, ${tol}L, ${bufD}L, $levels);")

  override protected def withNewChildInternal(c: Expression): SimplifyPolygonStats =
    copy(child = c)
}

object SimplifyPolygonStats {

  /** Loud input bounds, mirroring [[MomentMatrix]]'s d <= 1024 contract.
    * The hull-membership scan is O(m^3) in DEDUPED vertices — fine for
    * A44's <=7-vertex shapes, cubic-silent for an arbitrary caller —
    * so the vertex count is capped where the cost lives. The coordinate
    * cap keeps every intermediate exact in Int64: with |x|,|y| <=
    * 2^14, chord/point deltas are <= 2^15, a cross product <= 2·2^30 =
    * 2^31, and the DP test's cross^2 <= 2^62 and tol^2·len2 <=
    * tol^2·2^31 both stay inside a signed 64-bit long for tol <= 2^15.
    */
  val MaxVerts = 1024
  val MaxCoord = 16384L // 2^14
  val MaxTol = 32768L   // 2^15

  /** The per-shape kernel, shared by eval and generated code. All
    * arithmetic is exact Long (inputs are bounded by [[MaxCoord]], so
    * every intermediate holds comfortably in 64 bits — enforced, not
    * assumed).
    */
  def fold(arr: ArrayData, tol: Long, bufD: Long, levels: Int): InternalRow = {
    require(tol >= 0L && tol <= MaxTol,
      s"simplify_polygon_stats: tol=$tol outside [0, $MaxTol] — tol^2·len2 would overflow Long")
    require(bufD >= 0L && bufD <= MaxTol,
      s"simplify_polygon_stats: bufD=$bufD outside [0, $MaxTol] — buffered-area arithmetic" +
        " would overflow Long")
    val n0 = arr.numElements()
    val raw = new Array[(Long, Long)](n0)
    var i = 0
    while (i < n0) {
      val r = arr.getStruct(i, 2)
      val x = r.getLong(0)
      val y = r.getLong(1)
      require(math.abs(x) <= MaxCoord && math.abs(y) <= MaxCoord,
        s"simplify_polygon_stats: vertex ($x,$y) outside ±$MaxCoord — cross^2 arithmetic" +
          " would overflow Long; rescale coordinates before simplifying")
      raw(i) = (x, y)
      i += 1
    }
    // distinct + lex sort: array index order IS lex order from here on
    val pts: Array[(Long, Long)] = raw.distinct.sorted
    val m = pts.length
    require(m <= MaxVerts,
      s"simplify_polygon_stats: $m distinct vertices exceeds MaxVerts=$MaxVerts —" +
        " the strict-hull membership scan is O(m^3); pre-simplify or raise the cap deliberately")

    // strict chain membership via the straddling-pair characterization
    val onL = new Array[Boolean](m)
    val onU = new Array[Boolean](m)
    var p = 0
    while (p < m) {
      var nl = false
      var nu = false
      var a = 0
      while (a < p) {
        var b = p + 1
        while (b < m) {
          val cr = (pts(b)._1 - pts(a)._1) * (pts(p)._2 - pts(a)._2) -
            (pts(b)._2 - pts(a)._2) * (pts(p)._1 - pts(a)._1)
          if (cr >= 0L) nl = true
          if (cr <= 0L) nu = true
          b += 1
        }
        a += 1
      }
      onL(p) = !nl
      onU(p) = !nu
      p += 1
    }
    val chL: Array[(Long, Long)] = pts.indices.collect { case k if onL(k) => pts(k) }.toArray
    val chU: Array[(Long, Long)] = pts.indices.collect { case k if onU(k) => pts(k) }.toArray

    // Douglas-Peucker over one chain: kept-position flags, level-capped
    def dpKept(ch: Array[(Long, Long)]): Array[Boolean] = {
      val cm = ch.length
      val kept = new Array[Boolean](cm)
      if (cm > 0) { kept(0) = true; kept(cm - 1) = true }
      var spans: List[(Int, Int)] = if (cm >= 3) List((0, cm - 1)) else Nil
      var level = 1
      while (level <= levels && spans.nonEmpty) {
        var next: List[(Int, Int)] = Nil
        for ((lo, hi) <- spans) {
          val (ax, ay) = ch(lo)
          val (bx, by) = ch(hi)
          var bestPos = -1
          var bestCr = -1L
          var q = lo + 1
          while (q < hi) {
            val cr = math.abs((bx - ax) * (ch(q)._2 - ay) - (by - ay) * (ch(q)._1 - ax))
            if (cr > bestCr) { bestCr = cr; bestPos = q } // tie keeps the smaller pos
            q += 1
          }
          val len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
          if (bestPos >= 0 && bestCr * bestCr > tol * tol * len2) {
            kept(bestPos) = true
            if (bestPos - lo >= 2) next ::= (lo, bestPos)
            if (hi - bestPos >= 2) next ::= (bestPos, hi)
          }
        }
        spans = next
        level += 1
      }
      if (spans.nonEmpty) throw new IllegalStateException(
        s"simplify_polygon_stats: open DP spans past level $levels on a ${cm}-position chain" +
          " — the unroll bound assumes <= levels interior points per chain; raise the levels" +
          " argument in lockstep with the oracle's CTE unroll")
      kept
    }

    // ring = kept lower chain ascending, then kept upper-chain interior
    // descending; closed by wrap-around (the a44RingStats sequencing)
    def ringStats(keptL: Array[Boolean], keptU: Array[Boolean]): (Long, Long, Long) = {
      val seq = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var k = 0
      while (k < chL.length) { if (keptL(k)) seq += chL(k); k += 1 }
      k = chU.length - 2
      while (k >= 1) { if (keptU(k)) seq += chU(k); k -= 1 }
      val rn = seq.length
      var area2 = 0L
      var l1 = 0L
      var t = 0
      while (t < rn) {
        val (vx, vy) = seq(t)
        val (nx, ny) = seq((t + 1) % rn)
        area2 += vx * ny - nx * vy
        l1 += math.abs(nx - vx) + math.abs(ny - vy)
        t += 1
      }
      (rn.toLong, math.abs(area2), l1)
    }

    val (nHull, hullArea2, _) =
      ringStats(Array.fill(chL.length)(true), Array.fill(chU.length)(true))
    val (nKept, simpArea2, l1) = ringStats(dpKept(chL), dpKept(chU))
    val bufArea2 = simpArea2 + 2L * bufD * l1 + 8L * bufD * bufD
    new GenericInternalRow(
      Array[Any](nHull, hullArea2, nKept, simpArea2, l1, bufArea2))
  }
}

/** Column-API entry point. */
object geo {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def simplify_polygon_stats(verts: Column, tol: Long, bufD: Long, levels: Int): Column =
    column(SimplifyPolygonStats(expression(verts), tol, bufD, levels))
}
