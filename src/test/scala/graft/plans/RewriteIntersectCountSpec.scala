package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The size(array_intersect) → sorted_intersect_count optimizer rule:
  * fires on the hot pattern, leaves guarded cases alone, and never
  * changes a value (duplicates included — array_intersect dedups, so
  * the distinct-merge count must equal it element for element).
  */
class RewriteIntersectCountSpec extends SparkTestBase {

  private def arrays = {
    // deterministic arrays WITH duplicates and varying overlap; the
    // lambda bodies avoid `%` (nullable in non-ANSI mode) so the
    // element type is array<bigint> containsNull=false
    spark.range(200).select(col("id"),
      expr("flatten(array(sequence(id, id + id - (id div 7) * 7), sequence(id, id + 2)))").as("a"),
      expr("sequence(id + 1, id + 5)").as("b"))
  }

  test("rule fires: the optimized plan carries sorted_intersect_count, values agree") {
    val df = arrays.select(col("id"),
      expr("size(array_intersect(a, b))").as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("sortedintersectcount") ||
      optimized.toLowerCase.contains("sortedintersectcount"),
      s"rule did not fire:\n$optimized")
    // ground truth from a Scala recompute of the distinct intersection
    val rows = arrays.collect().map { r =>
      val a = r.getSeq[Long](1).toSet
      val b = r.getSeq[Long](2).toSet
      r.getLong(0) -> (a & b).size
    }.toMap
    df.collect().foreach { r =>
      assert(r.getInt(1) == rows(r.getLong(0)), s"id ${r.getLong(0)}")
    }
  }

  test("guards hold: string arrays untouched; nullable inputs keep size's null") {
    val sdf = spark.range(10).select(
      expr("array('x', 'y')").as("a"), expr("array('y', 'z')").as("b"))
      .select(expr("size(array_intersect(a, b))").as("n"))
    assert(!sdf.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("sortedintersectcount"))
    assert(sdf.head.getInt(0) == 1)
    // nullable input (CASE WHEN makes the array column nullable): the
    // rule fires but must preserve size(NULL) = NULL via the If wrapper
    val ndf = spark.range(4).select(
      expr("CASE WHEN id % 2 = 0 THEN array(1L, 2L) END").as("a"),
      expr("array(2L, 3L)").as("b"))
      .select(col("a"), expr("size(array_intersect(a, b))").as("n"))
    assert(ndf.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("sortedintersectcount"))
    ndf.collect().foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getInt(1) == 1)
    }
  }
}
