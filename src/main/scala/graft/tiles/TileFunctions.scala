package graft.tiles

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Slippy-tile ↔ lon/lat Web-Mercator math as codegen-friendly Column
  * expressions (no UDFs, so the formulas inline into whole-stage codegen
  * and survive filter pushdown around them).
  *
  * Mirrors `deg2num`/`num2deg` in the reference
  * (process_city_shapes.py:18-59), zoom 21 default (DeepSolar's level).
  *
  * FP-parity rules (SURVEY.md §5): no `radians`/`degrees` builtins (their
  * constant factoring differs across engines) — the formulas below spell
  * out `* PI / 180.0` etc. so the oracle can use the identical expression
  * text; sinh is expanded to `(exp(t)-exp(-t))/2`.
  */
object TileFunctions {
  val Zoom = 21
  val Pi = 3.141592653589793

  def n(zoom: Int): Double = math.pow(2.0, zoom)

  /** lon → tile column: floor((lon+180)/360 * 2^z). */
  def lonToCol(lon: Column, zoom: Int = Zoom): Column =
    floor((lon + lit(180.0)) / lit(360.0) * lit(n(zoom))).cast("long")

  /** lat → tile row: floor((1 - ln(tan φ + 1/cos φ)/π)/2 * 2^z). */
  def latToRow(lat: Column, zoom: Int = Zoom): Column = {
    val latRad = lat * lit(Pi) / lit(180.0)
    floor((lit(1.0) - log(tan(latRad) + lit(1.0) / cos(latRad)) / lit(Pi)) / lit(2.0) * lit(n(zoom)))
      .cast("long")
  }

  /** tile column → lon (center=true → middle of tile), rounded to 6dp. */
  def colToLon(c: Column, zoom: Int = Zoom, center: Boolean = true): Column = {
    val off = if (center) 0.5 else 0.0
    round((c + lit(off)) / lit(n(zoom)) * lit(360.0) - lit(180.0), 6)
  }

  /** tile row → lat via atan(sinh(π(1-2y/2^z))), rounded to 6dp. */
  def rowToLat(r: Column, zoom: Int = Zoom, center: Boolean = true): Column = {
    val off = if (center) 0.5 else 0.0
    val t = lit(Pi) * (lit(1.0) - lit(2.0) * (r + lit(off)) / lit(n(zoom)))
    round(atan((exp(t) - exp(-t)) / lit(2.0)) * lit(180.0) / lit(Pi), 6)
  }

  /** DuckDB SQL fragments computing the identical expressions. */
  def lonToColSql(lon: String, zoom: Int = Zoom): String =
    s"CAST(floor(($lon + 180.0) / 360.0 * ${n(zoom)}) AS BIGINT)"

  def latToRowSql(lat: String, zoom: Int = Zoom): String =
    s"CAST(floor((1.0 - ln(tan($lat * pi() / 180.0) + 1.0 / cos($lat * pi() / 180.0)) / pi()) / 2.0 * ${n(zoom)}) AS BIGINT)"

  def colToLonSql(c: String, zoom: Int = Zoom, center: Boolean = true): String = {
    val off = if (center) "0.5" else "0.0"
    s"round(($c + $off) / ${n(zoom)} * 360.0 - 180.0, 6)"
  }

  def rowToLatSql(r: String, zoom: Int = Zoom, center: Boolean = true): String = {
    val off = if (center) "0.5" else "0.0"
    val t = s"(pi() * (1.0 - 2.0 * ($r + $off) / ${n(zoom)}))"
    s"round(atan((exp($t) - exp(-$t)) / 2.0) * 180.0 / pi(), 6)"
  }
}
