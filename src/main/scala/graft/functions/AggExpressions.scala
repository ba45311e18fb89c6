package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `bottom_k(v, k)`: the k smallest DISTINCT bigint values per group, as
  * an ascending array — the collection step of a KMV / bottom-k distinct
  * sketch (SURVEY.md §2 B15) as a real Catalyst aggregate.
  *
  * Why an aggregate and not a window: `row_number() OVER (ORDER BY h)`
  * must SHUFFLE AND SORT every row of the group before it can cut at k.
  * A TypedImperativeAggregate gets Spark's two-phase agg machinery for
  * free — each map task folds its partition into a ≤k-element buffer,
  * and only those k-element buffers cross the wire and merge. That
  * partial-merge shape (sketch union = merge + trim) is exactly how a
  * distinct sketch is meant to distribute at 100 TB: shuffle bytes are
  * O(k · partitions), independent of row count.
  *
  * The buffer is a capped TreeSet: insert, dedup, drop-max when above k
  * — O(log k) per row, O(k) serialized.
  */
case class BottomK(child: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bottom_k expects a bigint value, got ${child.dataType}")
    else if (!kExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType) ||
        kExpr.eval(InternalRow.empty) == null)
      TypeCheckResult.TypeCheckFailure("bottom_k expects a non-null literal integer k")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"bottom_k expects k > 0, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(v.asInstanceOf[Long])
      if (buffer.size > k) buffer.pollLast(): Unit
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buffer.add(it.next())
      if (buffer.size > k) buffer.pollLast(): Unit
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    // the buffer is legitimately variable-size (≤ k longs), but a
    // ragged length means corrupt state — fail loudly, don't truncate
    // (the moment_matrix loud-failure contract)
    require(bytes.length % 8 == 0 && bytes.length <= 8 * k,
      s"bottom_k: serialized buffer is ${bytes.length} B — expected a multiple of 8" +
        s" no larger than ${8 * k} B for k=$k")
    val set = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) set.add(bb.getLong): Unit
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomK =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "bottom_k"
}

/** `hll_registers(h, p)`: the 2^p HyperLogLog registers (Flajolet et
  * al. 2007) over pre-hashed 61-bit values, as an integer array — the
  * OTHER canonical distinct sketch next to B15's KMV, as a real
  * Catalyst aggregate (SURVEY.md §2 C107).
  *
  * Input values must lie in [0, 2⁶¹) — [[StrPolyHash]]'s range; bucket
  * = h mod 2^p, and the register keeps the max over the group of
  * ρ(w) = (trailing zeros of w = h div 2^p) + 1, with the all-zero
  * suffix capped at 61−p+1. Trailing (not leading) zeros: identical
  * estimator statistics, and the oracle twin reduces to the exact
  * integer `log2(w & −w)` — no leading-zero SQL gymnastics.
  *
  * Same distribution argument as [[BottomK]]: each map task folds its
  * partition into a fixed m-byte buffer, only m-byte buffers cross the
  * wire, and merge = elementwise max — shuffle bytes O(m·partitions)
  * regardless of row count, the textbook mergeable-summary shape. The
  * ESTIMATE is deliberately left to the caller (registers are exact
  * integers, so they hash-compare cross-engine; the float estimate is
  * derived identically in both engines from this one array).
  */
case class HllRegisters(child: Expression, pExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  lazy val p: Int = pExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()
  private lazy val m: Int = 1 << p
  private lazy val rhoMax: Byte = (61 - p + 1).toByte

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hll_registers expects a bigint hash, got ${child.dataType}")
    else if (!pExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(pExpr.dataType) ||
        pExpr.eval(InternalRow.empty) == null)
      TypeCheckResult.TypeCheckFailure("hll_registers expects a non-null literal integer p")
    else if (p < 4 || p > 16)
      TypeCheckResult.TypeCheckFailure(s"hll_registers expects 4 <= p <= 16, got $p")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // Contract: h in [0, 2^61) (str_poly_hash output). A negative hash
      // would index out of bounds via (h % m) — fail with a diagnosable
      // message instead of an AIOOBE deep inside the aggregate.
      if (h < 0L) throw new IllegalArgumentException(
        s"hll_registers: hash out of range (got $h, expected [0, 2^61) — feed str_poly_hash output)")
      val j = (h % m).toInt
      val w = h / m
      val rho: Byte =
        if (w == 0L) rhoMax
        else (java.lang.Long.numberOfTrailingZeros(w) + 1).toByte
      if (rho > buffer(j)) buffer(j) = rho
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = buffer(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = {
    // state restored under a different m must fail loudly: a longer
    // buffer would silently ignore registers (skewed estimate), a
    // shorter one would crash later in eval with a bare index error
    require(bytes.length == m,
      s"hll_registers: serialized buffer is ${bytes.length} B but m=$m" +
        " — state written under a different register count cannot be restored")
    bytes
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren(0), pExpr = newChildren(1))
  override def prettyName: String = "hll_registers"
}

/** `moment_matrix(q, d)`: the raw moment summary of a d-dim integer
  * vector stream — N, Σxᵢ, and the full Σxᵢxⱼ Gram matrix — as ONE
  * flat bigint array [n, sx(d), sxy(d·d) row-major], as a real Catalyst
  * aggregate (SURVEY.md §2 D32).
  *
  * Why an aggregate and not an explode: covariance needs d²+d+1 sums,
  * and building them relationally means exploding d²+d+1 cells PER
  * INPUT VECTOR into the shuffle — state stays bounded but shuffle
  * volume is 4,161× the row count at d=64, the scale-killer for an
  * unbounded embedding stream. As a TypedImperativeAggregate each map
  * task folds its partition into one fixed (d²+d+1)·8-byte buffer and
  * only those buffers cross the wire (merge = elementwise add — raw
  * moments are the canonical mergeable summary), so shuffle bytes are
  * O(d² · partitions), independent of row count. Same argument as
  * [[BottomK]]/[[HllRegisters]]; in Structured Streaming the buffer is
  * also exactly the store state: one row forever.
  *
  * Inputs must be length-d bigint arrays (quantize upstream); a
  * mismatched vector throws with a diagnosable message rather than
  * silently skewing the moments. Overflow headroom is the caller's
  * contract (milli-quantized embeddings hold to ~10⁷ vectors).
  */
case class MomentMatrix(child: Expression, dExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  lazy val d: Int = dExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()
  private lazy val len: Int = 1 + d + d * d

  override def children: Seq[Expression] = Seq(child, dExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (!dExpr.foldable ||
          !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(dExpr.dataType) ||
          dExpr.eval(InternalRow.empty) == null)
        TypeCheckResult.TypeCheckFailure("moment_matrix expects a non-null literal integer d")
      else if (d <= 0 || d > 1024)
        TypeCheckResult.TypeCheckFailure(s"moment_matrix expects 0 < d <= 1024, got $d")
      else TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"moment_matrix expects array<bigint> vectors, got ${dt.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() != d) throw new IllegalArgumentException(
        s"moment_matrix: expected $d-dim vectors, got ${arr.numElements()}")
      val x = arr.toLongArray()
      buffer(0) += 1L
      var i = 0
      while (i < d) {
        buffer(1 + i) += x(i)
        val base = 1 + d + i * d
        var j = 0
        while (j < d) { buffer(base + j) += x(i) * x(j); j += 1 }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * len)
    var i = 0
    while (i < len) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    // Loud-failure contract: a buffer serialized under a different d
    // (e.g. streaming state restored after a Dims change) must fail
    // here, not silently zero-pad into skewed moments.
    require(bytes.length == 8 * len,
      s"moment_matrix: serialized buffer is ${bytes.length} B but d=$d expects ${8 * len} B" +
        " — state written under a different dimension cannot be restored")
    val out = new Array[Long](len)
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < len) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MomentMatrix =
    copy(child = newChildren(0), dExpr = newChildren(1))
  override def prettyName: String = "moment_matrix"
}

/** Column-API entry point. */
object aggs {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def bottom_k(v: Column, k: Int): Column =
    column(BottomK(expression(v), Literal(k)).toAggregateExpression())

  def hll_registers(h: Column, p: Int): Column =
    column(HllRegisters(expression(h), Literal(p)).toAggregateExpression())

  def moment_matrix(q: Column, d: Int): Column =
    column(MomentMatrix(expression(q), Literal(d)).toAggregateExpression())
}
