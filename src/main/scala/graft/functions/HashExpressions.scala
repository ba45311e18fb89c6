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

/** Column-API entry point (same bridge as [[vector]] / [[sets]]). */
object hashes {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def rolling_hashes(arr: Column, b: Column, m: Column): Column =
    column(RollingHashes(expression(arr), expression(b), expression(m)))
}
