package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native set-intersection cardinality for the near-dup scoring hot path
  * (SURVEY.md §2 C7/C19).
  *
  * `array_intersect` + `array_union` each build a hash set per CALL —
  * at ~10M candidate pairs that is 20M transient hash sets and two full
  * result-array materializations per pair, only to take their sizes.
  * When both inputs are ascending-sorted distinct arrays the same
  * numbers fall out of one fused merge scan with zero allocation:
  * |A∩B| directly, |A∪B| = |A| + |B| − |A∩B|. The merge loop lives
  * inside whole-stage codegen via `doGenCode`, so pair scoring stays in
  * one tight generated loop.
  *
  * CONTRACT: both arrays must be ascending-sorted with distinct
  * elements (produce them with `array_sort(array_distinct(...))`) —
  * the count is undefined otherwise. Null elements are not expected
  * (shingle hashes are non-null longs).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects array<bigint> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n1, n2) = (x.numElements(), y.numElements())
    var cnt = 0L
    var i = 0
    var j = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { cnt += 1; i += 1; j += 1 }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |long $cnt = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $cnt++; $i++; $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Column-API entry point (same bridge as [[vector]]). */
object sets {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
}
