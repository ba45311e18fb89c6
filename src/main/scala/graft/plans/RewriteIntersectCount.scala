package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  ArrayDistinct, ArrayIntersect, Cast, Expression, If, IsNull, Literal, Or,
  Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

import graft.functions.SortedIntersectCount

/** Optimizer rule: `size(array_intersect(x, y))` over non-null bigint
  * arrays → the codegen'd [[SortedIntersectCount]] merge scan.
  *
  * The pattern is the near-dup / decontamination hot path (|A∩B| of two
  * key-hash arrays per candidate row), and the naive form is a known
  * scale trap this engine hit once in the wild: `array_intersect`
  * builds a boxed hash set and materializes the full intersection
  * array PER ROW, only for `size` to throw everything but the count
  * away (d14's streaming decontamination ran 7× slower exactly this
  * way before being hand-rewritten — this rule makes that fix
  * automatic for any query, SQL or Column API, that states the intent
  * naively). The rewrite is
  *
  *   size(array_intersect(x, y))
  *     ≡ cast(sorted_intersect_count(sort_array(distinct x),
  *                                   sort_array(distinct y)) as int)
  *
  * — `array_intersect` dedups its output, so the cardinality equals the
  * distinct-set intersection count; the sorts feed the contract the
  * merge scan needs, stay in whole-stage codegen on primitive longs,
  * and allocate nothing per row beyond the two sorted copies.
  *
  * Guard: element type exactly bigint with `containsNull = false` —
  * null elements make `array_intersect` count a null∩null match the
  * merge scan doesn't model. NULLABLE input arrays are fine: the
  * rewrite wraps the count in the same null semantics `Size` carries
  * (NULL normally, −1 under `spark.sql.legacy.sizeOfNull`), so the
  * rule still fires on parquet-sourced columns, which are nullable by
  * default.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule` in
  * [[graft.functions.GraftExtensions]], so every Graft session plans
  * through it; RewriteIntersectCountSpec pins the fired plan, the
  * value equivalence (dups included), and the guard cases.
  */
object RewriteIntersectCount extends Rule[LogicalPlan] {

  private def elemOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(x, y), legacy) if elemOk(x) && elemOk(y) =>
        val cnt = Cast(
          SortedIntersectCount(
            SortArray(ArrayDistinct(x), Literal(true)),
            SortArray(ArrayDistinct(y), Literal(true))),
          IntegerType)
        if (!x.nullable && !y.nullable) cnt
        else If(Or(IsNull(x), IsNull(y)),
          if (legacy) Literal(-1) else Literal(null, IntegerType),
          cnt)
    }
}
