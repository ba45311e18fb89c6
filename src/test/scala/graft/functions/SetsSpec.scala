package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.sets.sorted_intersect_count

class SetsSpec extends SparkTestBase {

  /** Sorted distinct shingle-hash sets for a small corpus slice —
    * the exact shape C19 feeds the expression.
    */
  private def setPairs = {
    val s = Tables(spark, sf, "documents").limit(60)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(split(col("text"), " "),
          t => abs(hash(t)).cast("long")))).as("s"))
    s.select(col("doc_id").as("ia"), col("s").as("a"))
      .crossJoin(s.select(col("doc_id").as("ib"), col("s").as("b")))
  }

  test("sorted_intersect_count matches size(array_intersect) on sorted distinct arrays") {
    assert(setPairs
      .select(sorted_intersect_count(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("|A∪B| = |A| + |B| − |A∩B| reproduces array_union cardinality") {
    assert(setPairs
      .select((size(col("a")) + size(col("b"))
          - sorted_intersect_count(col("a"), col("b"))).as("derived"),
        size(array_union(col("a"), col("b"))).cast("long").as("direct"))
      .filter(col("derived") =!= col("direct")).count() == 0)
  }

  test("edge cases: empty, disjoint, identical, subset") {
    val r = spark.sql(
      """SELECT
        |  sorted_intersect_count(array(1L,2L,3L), array(1L,2L,3L)) AS ident,
        |  sorted_intersect_count(array(1L,2L,3L), array(4L,5L)) AS disj,
        |  sorted_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L)) AS emp,
        |  sorted_intersect_count(array(2L,3L), array(1L,2L,3L,9L)) AS sub
        |""".stripMargin).head
    assert(r.getLong(0) == 3 && r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 2)
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    val df = setPairs.select(sorted_intersect_count(col("a"), col("b")).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}
