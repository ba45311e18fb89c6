package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path (SURVEY.md §2
  * C9–C11).
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are
  * CodegenFallback — every element goes through an interpreted lambda
  * with boxing. A 64-dim dot product is two orders of magnitude cheaper
  * as a fused loop inside whole-stage codegen, which is exactly what
  * `doGenCode` below emits. Semantics are pinned to the same sequential
  * left-to-right double accumulation as the interpreted fold and the
  * DuckDB oracle's `list_reduce`, so results stay bit-identical.
  *
  * Element types Float and Double are both supported (embeddings are
  * float32; hyperplane weights are double literals).
  */
object VecOps {
  private[functions] def accessor(et: DataType, arr: String, i: String): String = et match {
    case FloatType => s"(double)$arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  private[functions] def get(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  private[functions] def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
}

/** dot(a, b) = Σ aᵢ·bᵢ with sequential double accumulation. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  import VecOps._

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elementType(left), elementType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += get(lt, x, i) * get(rt, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${accessor(elementType(left), a, i)} * ${accessor(elementType(right), b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** norm2(a) = Σ aᵢ² with sequential double accumulation. */
case class VecNorm2(child: Expression) extends UnaryExpression {
  import VecOps._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm2 expects array<float|double>, got $other")
  }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elementType(child)
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { val v = get(et, x, i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = ${accessor(elementType(child), a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNorm2 = copy(child = c)
}

/** Column-API entry points (via the classic Column↔Expression bridge —
  * Spark 4 Columns wrap ColumnNodes, not Expressions).
  */
object vector {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def vec_norm2(a: Column): Column = column(VecNorm2(expression(a)))
}
