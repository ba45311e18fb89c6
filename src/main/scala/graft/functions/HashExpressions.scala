package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native rolling polynomial-hash prefix array (SURVEY.md §2 C33).
  *
  * `rolling_hashes(t, b, m)[k] = (t₁·bᵏ⁻¹ + … + tₖ) mod m` — every
  * prefix hash of a token-hash sequence in ONE left-to-right pass.
  * The declarative alternative (`aggregate` + `array_append`) copies
  * the accumulator array on every step: O(L²) work and O(L²) garbage
  * per document, which detonates on long documents (a 10k-token doc
  * pays 10⁸ copies). This expression allocates the result array once
  * and folds in place, inside whole-stage codegen via `doGenCode`.
  *
  * CONTRACT: `b` and `m` must be positive foldable literals with
  * `(m-1)·b + max(t) < 2⁶³` (the fold multiplies an already-reduced
  * value by `b` before the next mod) and elements of `t` non-negative;
  * graft uses b = 1000003, m = 1e9+7, token hashes < 2²⁰, all safely
  * inside the bound. The last element equals the C5 full-document
  * fingerprint of the same token-hash sequence.
  */
case class RollingHashes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_hashes expects (array<bigint>, bigint, bigint), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(arr: Any, bAny: Any, mAny: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[Long]
    val m = mAny.asInstanceOf[Long]
    val n = a.numElements()
    val out = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * b + a.getLong(i)) % m
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * $b + $a.getLong($i)) % $m;
         |  $out[$i] = $h;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RollingHashes =
    copy(first = f, second = s, third = t)
}

/** Native full-string polynomial hash mod the Mersenne prime 2⁶¹−1
  * (SURVEY.md §2 C107).
  *
  * `str_poly_hash(s) = (c₁·131^{L−1} + … + c_L) mod (2⁶¹−1)` over the
  * string's UNICODE CODE POINTS — a 61-bit, well-dispersed,
  * ENGINE-NEUTRAL hash for sketching (HLL needs dispersion in every
  * bit; the cheap length/first/last token hash the near-dup family
  * uses is fine for shingle identity but useless as a sketch hash).
  * The DuckDB twin is the same fold in 128-bit integers (`HUGEINT`
  * accumulate, `% 2⁶¹−1`) over `ascii(substr(s, i, 1))` — which walks
  * CHARACTERS, so the Scala side must fold code points too, never raw
  * UTF-8 bytes (a byte fold coincides on ASCII but silently diverges
  * on any accented/astral token — caught by fuzz seed 1 via the HLL
  * register fingerprint).
  *
  * The mod-multiply never overflows: acc < 2⁶¹, so acc·131 < 2⁶⁸ is
  * computed as a 128-bit product (`Math.multiplyHigh`) and reduced with
  * the Mersenne identity 2⁶¹ ≡ 1 (so 2⁶⁴ ≡ 8): one shift-add chain,
  * no BigInteger, inside whole-stage codegen.
  */
case class StrPolyHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"str_poly_hash expects a string, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    StrPolyHash.hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StrPolyHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): StrPolyHash =
    copy(child = newChild)
  override def prettyName: String = "str_poly_hash"
}

object StrPolyHash {
  final val M: Long = (1L << 61) - 1

  /** a·b mod 2⁶¹−1 for a, b ∈ [0, 2⁶¹): 128-bit product via
    * `multiplyHigh`, Mersenne reduction (2⁶⁴ ≡ 8, so the high word
    * folds back as hi·8 + top 3 bits of lo).
    */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = ((hi << 3) | (lo >>> 61)) + (lo & M)
    if (r >= M) r -= M
    if (r >= M) r -= M
    r
  }

  /** The fold both the interpreted and codegen paths share: polynomial
    * base-131 accumulate, then TWO quadratic scramble rounds
    * x → x² + c (mod M). The scramble is load-bearing: the fold alone
    * is AFFINE in the input bytes, so structured token families
    * (`token0 … tokenN`) land on an arithmetic lattice whose
    * trailing-zero statistics are nothing like uniform — the HLL spec
    * caught a 42% estimate bias on exactly that input. The quadratic
    * map destroys the lattice (the same property Pollard's rho relies
    * on to treat x²+c mod p as a pseudorandom walk); the DuckDB twin
    * applies the identical two rounds in HUGEINT arithmetic.
    */
  def hash(b: Array[Byte]): Long = {
    // Fold UNICODE CODE POINTS, not UTF-8 bytes: the DuckDB twin is
    // `ascii(substr(token, i, 1))` over range(1, length+1), which walks
    // characters — byte-folding silently diverges on any non-ASCII
    // token (fuzz seed 1's accented/astral texts shifted one HLL
    // register and only the register fingerprint caught it). The two
    // coincide on ASCII, so ASCII corpora are unaffected.
    var acc = 0L
    var i = 0
    while (i < b.length) {
      val b0 = b(i) & 0xff
      var cp = 0L
      var n = 1
      if (b0 < 0x80) cp = b0.toLong
      else if ((b0 & 0xe0) == 0xc0) { cp = (b0 & 0x1f).toLong; n = 2 }
      else if ((b0 & 0xf0) == 0xe0) { cp = (b0 & 0x0f).toLong; n = 3 }
      else { cp = (b0 & 0x07).toLong; n = 4 }
      var k = 1
      while (k < n && i + k < b.length) {
        cp = (cp << 6) | (b(i + k) & 0x3fL)
        k += 1
      }
      i += n
      var r = mulmod(acc, 131L)
      r += cp
      if (r >= M) r -= M
      acc = r
    }
    var z = mulmod(acc, acc) + 12345L
    if (z >= M) z -= M
    z = mulmod(z, z) + 67890L
    if (z >= M) z -= M
    z
  }
}

/** Column-API entry point (same bridge as [[vector]] / [[sets]]). */
object hashes {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def rolling_hashes(arr: Column, b: Column, m: Column): Column =
    column(RollingHashes(expression(arr), expression(b), expression(m)))

  def str_poly_hash(s: Column): Column =
    column(StrPolyHash(expression(s)))
}
