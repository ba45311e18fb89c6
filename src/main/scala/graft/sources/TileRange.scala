package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 slippy-tile grid source — the reference's meshgrid tile
  * enumeration (`process_city_shapes.py:146-171` builds a numpy meshgrid
  * over the polygon bbox) as a first-class Spark connector:
  *
  * {{{
  * spark.read.format("tilerange")
  *   .option("minX", 0).option("maxX", 1023)
  *   .option("minY", 0).option("maxY", 1023)
  *   .option("zoom", 12)
  *   .load()           // x, y, zoom, lon, lat (tile-center Web Mercator)
  * }}}
  *
  * Scale behavior (SURVEY.md §6): rows are GENERATED inside each input
  * partition — the driver plans only (x-range split) boundary tuples, so
  * a z21 world-scale grid (4.4e12 tiles) costs the driver a few hundred
  * bytes of planning state. Two pushdowns keep the generated volume
  * proportional to the query, verifiable in `.explain`:
  *
  *  - [[SupportsPushDownFilters]]: x/y comparisons tighten the generated
  *    ranges BEFORE planning — a bbox query generates exactly the bbox,
  *    not the world. Consumed filters are removed from the plan (no
  *    re-evaluation).
  *  - [[SupportsPushDownRequiredColumns]]: lon/lat are only computed when
  *    the query reads them — an (x, y) join key scan does integer
  *    iteration only.
  */
class TileRange extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tilerange"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = TileRange.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TileRangeTable(properties)
}

object TileRange {
  val Schema: StructType = StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("zoom", IntegerType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))

  val Pi = 3.141592653589793

  /** Tile-center num2deg, identical composition to
    * [[graft.tiles.TileFunctions.colToLon]]/`rowToLat` pre-rounding.
    */
  def centerLon(x: Long, zoom: Int): Double =
    (x + 0.5) / math.pow(2.0, zoom) * 360.0 - 180.0

  def centerLat(y: Long, zoom: Int): Double = {
    val t = Pi * (1.0 - 2.0 * (y + 0.5) / math.pow(2.0, zoom))
    math.atan((math.exp(t) - math.exp(-t)) / 2.0) * 180.0 / Pi
  }

  final case class Bounds(minX: Long, maxX: Long, minY: Long, maxY: Long,
      zoom: Int, partitions: Int) {
    def rows: Long = math.max(0L, maxX - minX + 1) * math.max(0L, maxY - minY + 1)
  }

  def boundsFrom(get: String => Option[String]): Bounds = {
    def req(k: String): Long = get(k).getOrElse(
      sys.error(s"tilerange: missing required option '$k'")).toLong
    val zoom = get("zoom").getOrElse("12").toInt
    require(zoom >= 0 && zoom <= 30, s"tilerange: zoom $zoom out of [0,30]")
    val n = 1L << zoom
    val b = Bounds(req("minX"), req("maxX"), req("minY"), req("maxY"),
      zoom, get("partitions").getOrElse("16").toInt)
    require(b.minX >= 0 && b.maxX < n && b.minY >= 0 && b.maxY < n,
      s"tilerange: bounds $b outside the zoom-$zoom tile space [0,$n)")
    b
  }
}

private[sources] class TileRangeTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "tilerange"
  override def schema(): StructType = TileRange.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](properties)
    merged.putAll(options)
    // honor the CaseInsensitiveStringMap contract for every lookup path
    // (SQL OPTIONS arrive lowercased)
    val ci = new CaseInsensitiveStringMap(merged)
    new TileRangeScanBuilder(TileRange.boundsFrom(k => Option(ci.get(k))))
  }
}

private[sources] class TileRangeScanBuilder(initial: TileRange.Bounds)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var bounds = initial
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TileRange.Schema
  private var aggOps: Option[Seq[String]] = None

  /** Accept x/y range predicates by tightening the generated bounds;
    * everything else stays a residual filter for Spark to evaluate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = mutable.ArrayBuffer.empty[Filter]
    val accepted = mutable.ArrayBuffer.empty[Filter]
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    filters.foreach { f =>
      val handled = f match {
        // saturating +1/−1: at Long extremes the comparison can match
        // nothing, which an empty [1, 0] range encodes without wrapping
        case EqualTo(c @ ("x" | "y"), v) => asLong(v).map(l => clamp(c, l, l))
        case GreaterThan(c @ ("x" | "y"), v) => asLong(v).map(l =>
          if (l == Long.MaxValue) clamp(c, 1L, 0L) else clamp(c, l + 1, Long.MaxValue))
        case GreaterThanOrEqual(c @ ("x" | "y"), v) => asLong(v).map(l => clamp(c, l, Long.MaxValue))
        case LessThan(c @ ("x" | "y"), v) => asLong(v).map(l =>
          if (l == Long.MinValue) clamp(c, 1L, 0L) else clamp(c, Long.MinValue, l - 1))
        case LessThanOrEqual(c @ ("x" | "y"), v) => asLong(v).map(l => clamp(c, Long.MinValue, l))
        case _ => None
      }
      handled match {
        case Some(()) => accepted += f
        case None => residual += f
      }
    }
    pushed = accepted.toArray
    residual.toArray
  }

  private def clamp(col: String, lo: Long, hi: Long): Unit =
    bounds =
      if (col == "x") bounds.copy(minX = math.max(bounds.minX, lo), maxX = math.min(bounds.maxX, hi))
      else bounds.copy(minY = math.max(bounds.minY, lo), maxY = math.min(bounds.maxY, hi))

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) / MIN / MAX over x or y are closed-form on a generated
    * grid — answer them from the (already filter-tightened) bounds
    * without generating a single row. Complete pushdown: the one
    * emitted row IS the final answer (no group-by supported).
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    decodeAgg(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    decodeAgg(aggregation) match {
      case some @ Some(_) => aggOps = some; true
      case None => false
    }

  private def decodeAgg(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    def name(f: AggregateFunc): Option[String] = f match {
      case _: CountStar => Some("count")
      case m: Min => xy(m.column).map("min:" + _)
      case m: Max => xy(m.column).map("max:" + _)
      case _ => None
    }
    def xy(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames.length == 1 &&
            (r.fieldNames()(0) == "x" || r.fieldNames()(0) == "y") =>
          Some(r.fieldNames()(0))
        case _ => None
      }
    val ops = agg.aggregateExpressions.toSeq.map(name)
    if (ops.nonEmpty && ops.forall(_.isDefined)) Some(ops.flatten) else None
  }

  override def build(): Scan = aggOps match {
    case Some(ops) => new TileRangeAggScan(bounds, ops)
    case None => new TileRangeScan(bounds, required)
  }
}

/** Closed-form answer scan for pushed-down aggregates: one partition,
  * one row, zero tiles generated.
  */
private[sources] class TileRangeAggScan(bounds: TileRange.Bounds, ops: Seq[String])
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(ops.zipWithIndex.map {
    case (op, i) => StructField(s"agg_$i${op.replace(':', '_')}", LongType,
      nullable = op != "count")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"tilerange CLOSED-FORM aggregates [${ops.mkString(",")}] over " +
      s"${bounds.minX}<=x<=${bounds.maxX} ${bounds.minY}<=y<=${bounds.maxY}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(TileRangeAggPartition(bounds, ops))

  override def createReaderFactory(): PartitionReaderFactory = TileRangeAggReaderFactory
}

private[sources] final case class TileRangeAggPartition(bounds: TileRange.Bounds,
    ops: Seq[String]) extends InputPartition

private[sources] object TileRangeAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TileRangeAggPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = {
        val empty = p.bounds.rows == 0
        val row = new GenericInternalRow(p.ops.length)
        p.ops.zipWithIndex.foreach {
          case ("count", i) => row.setLong(i, p.bounds.rows)
          case (op, i) if empty => row.setNullAt(i)
          case ("min:x", i) => row.setLong(i, p.bounds.minX)
          case ("max:x", i) => row.setLong(i, p.bounds.maxX)
          case ("min:y", i) => row.setLong(i, p.bounds.minY)
          case ("max:y", i) => row.setLong(i, p.bounds.maxY)
          case (op, _) => sys.error(s"tilerange: unexpected pushed aggregate '$op'")
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}

private[sources] class TileRangeScan(bounds: TileRange.Bounds, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"tilerange ${bounds.minX}<=x<=${bounds.maxX} ${bounds.minY}<=y<=${bounds.maxY} " +
      s"zoom=${bounds.zoom} cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    if (bounds.rows <= 0) return Array.empty
    val width = bounds.maxX - bounds.minX + 1
    val slices = math.max(1L, math.min(bounds.partitions.toLong, width))
    (0L until slices).map { i =>
      val x0 = bounds.minX + i * width / slices
      val x1 = bounds.minX + (i + 1) * width / slices - 1
      TileRangePartition(x0, x1, bounds.minY, bounds.maxY, bounds.zoom,
        required.fieldNames): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = TileRangeReaderFactory
}

private[sources] final case class TileRangePartition(x0: Long, x1: Long,
    y0: Long, y1: Long, zoom: Int, cols: Array[String]) extends InputPartition

private[sources] object TileRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TileRangePartition]
    new PartitionReader[InternalRow] {
      private var x = p.x0
      private var y = p.y0 - 1
      private val row = new GenericInternalRow(p.cols.length)
      // resolve column positions once, not per row
      private val writers: Array[(Int, Long, Long) => Unit] = p.cols.zipWithIndex.map {
        case ("x", i) => (_: Int, xx: Long, _: Long) => row.setLong(i, xx)
        case ("y", i) => (_: Int, _: Long, yy: Long) => row.setLong(i, yy)
        case ("zoom", i) => (z: Int, _: Long, _: Long) => row.setInt(i, z)
        case ("lon", i) => (z: Int, xx: Long, _: Long) =>
          row.setDouble(i, TileRange.centerLon(xx, z))
        case ("lat", i) => (z: Int, _: Long, yy: Long) =>
          row.setDouble(i, TileRange.centerLat(yy, z))
        case (other, _) => sys.error(s"tilerange: unknown column '$other'")
      }

      override def next(): Boolean = {
        if (x > p.x1) return false
        y += 1
        if (y > p.y1) { y = p.y0; x += 1; if (x > p.x1) return false }
        var i = 0
        while (i < writers.length) { writers(i)(p.zoom, x, y); i += 1 }
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
