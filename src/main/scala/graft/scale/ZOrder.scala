package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered layout — the write-side complement to
  * [[Bucketing]] for RANGE predicates instead of equi-joins.
  *
  * Hash bucketing co-locates equal keys but scatters nearby ones; a
  * slippy-tile workload's dominant predicate is a 2-D bbox
  * (`query_tile_batch`, solardb.py:190-213, always scans a polygon's
  * coordinate rectangle), which hash layout turns into a full scan. A
  * clustered file layout by this spatial key turns bbox queries into a
  * tiny file subset — but a concatenation sort key (x then y) clusters
  * one dimension only, leaving the other unbounded per file. Z-ordering
  * interleaves the coordinate bits so consecutive z-values are spatially
  * adjacent squares: each range-partitioned output file covers a compact
  * z-range ⇒ a tight (x, y) rectangle ⇒ tight parquet column min/max
  * stats on BOTH raw coordinate columns, and the reader's row-group
  * stats filtering skips every file whose rectangle misses the bbox —
  * no index structure, just parquet footers (measured in ZOrderSpec:
  * >10× bytes-read reduction on a 1% bbox at 16 files).
  *
  * At 100 TB this is the difference between "bbox query = cluster-wide
  * scan" and "bbox query = a handful of input splits"; the quadkey
  * (a26) is the same curve as a string prefix key, this is the numeric
  * form the writer sorts by.
  */
object ZOrder {

  /** Morton z-value: interleave the low `bits` bits of x (even
    * positions) and y (odd positions). Pure codegen'd column math —
    * shift/mask/add, no UDF; supports coordinates up to 2^bits−1, so
    * bits=21 covers the full z21 slippy grid within one 42-bit long.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .plus(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .plus(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Hilbert-curve distance: the locality key you graduate to when
    * Morton isn't local enough. The Z-curve takes long diagonal jumps
    * at power-of-two boundaries (z=3 → z=4 teleports across the
    * quadrant), so a compact z-range still spans two disjoint
    * rectangles now and then; the Hilbert curve advances in UNIT grid
    * steps only, so every contiguous key range is one connected,
    * near-square region — tighter per-file bounding boxes at the same
    * file count, i.e. strictly better parquet footer pruning for bbox
    * predicates.
    *
    * Realization: the classic xy2d bit walk as a HOF `aggregate` fold
    * over a (hx, hy, hd) struct state, one step per bit level from the
    * MSB. All arithmetic is nonnegative integer div/mod — each level
    * masks the consumed bit off (`v % s`) BEFORE the `s−1−v`
    * reflection, so no intermediate can go negative and trunc-vs-floor
    * division can never diverge between engines. The quadrant digit
    * `(3·rx) XOR ry` is emitted xor-free as `rx=0 ? ry : 3−ry` (equal
    * on all four corners). Entirely map-side column math: zero
    * shuffles, codegen-friendly, same cost profile as [[zValue]].
    */
  def hilbertD(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val fold = aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      struct(x.cast("long").as("hx"), y.cast("long").as("hy"), lit(0L).as("hd")),
      (st, i) => {
        val s = pow(lit(2.0), i.cast("double")).cast("long")
        val hx = st.getField("hx")
        val hy = st.getField("hy")
        val rx = floor(hx / s).cast("long")
        val ry = floor(hy / s).cast("long")
        val seg = when(rx === 0, ry).otherwise(lit(3L) - ry)
        val mx = hx % s
        val my = hy % s
        val fx = when(ry === 0, when(rx === 1, s - 1 - my).otherwise(my)).otherwise(mx)
        val fy = when(ry === 0, when(rx === 1, s - 1 - mx).otherwise(mx)).otherwise(my)
        struct(fx.as("hx"), fy.as("hy"),
          (st.getField("hd") + s * s * seg).cast("long").as("hd"))
      })
    fold.getField("hd")
  }

  /** Write `df` to `path` as `files` parquet files clustered by the
    * z-order of (`xCol`, `yCol`): range-partition on the z-value (equal
    * ROW counts per file however skewed the point distribution — a
    * fixed z-range split would put a city's whole corpus in one file),
    * sort within each partition so row groups inside a file are tight
    * too, and drop the helper column before writing. The payoff needs
    * no reader cooperation: it is entirely in the parquet min/max
    * stats the layout induces.
    *
    * Coordinates outside [0, 2^bits) would alias silently in
    * [[zValue]]'s bit masking (x=0 and x=2^bits interleave identically)
    * and quietly destroy the clustering the layout exists for, so the
    * writer validates the data range first — one cheap min/max agg
    * before the write, a rounding error next to the layout job itself.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, files: Int): Unit =
    writeCurveClustered(df, path, xCol, yCol, bits, files, zValue)

  /** [[writeZOrdered]] with the Hilbert key instead of Morton — same
    * writer, strictly tighter per-file rectangles for bbox pruning (see
    * [[hilbertD]]; ZOrderSpec measures the range-tightness gap
    * deterministically).
    */
  def writeHilbert(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, files: Int): Unit =
    writeCurveClustered(df, path, xCol, yCol, bits, files, hilbertD)

  private def writeCurveClustered(df: DataFrame, path: String, xCol: String,
      yCol: String, bits: Int, files: Int,
      key: (Column, Column, Int) => Column): Unit = {
    val aggRow = df.agg(min(xCol), max(xCol), min(yCol), max(yCol)).head()
    // min/max of an empty frame (or an all-null column) is null; fail
    // with the real diagnosis instead of an opaque NPE from the cast
    require((0 until 4).forall(!aggRow.isNullAt(_)),
      s"cannot curve-cluster '$path': input is empty or $xCol/$yCol contain " +
        "only nulls (min/max aggregate returned null)")
    val Array(minX, maxX, minY, maxY) =
      aggRow.toSeq.map(v => v.asInstanceOf[Number].longValue).toArray
    val lim = 1L << bits
    require(minX >= 0 && maxX < lim && minY >= 0 && maxY < lim,
      s"coordinates out of [0, $lim) for bits=$bits: " +
        s"$xCol in [$minX, $maxX], $yCol in [$minY, $maxY] — " +
        "out-of-range values would alias in the curve key and silently " +
        "destroy the clustering; raise bits or rescale the coordinates")
    df.withColumn("__z", key(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
