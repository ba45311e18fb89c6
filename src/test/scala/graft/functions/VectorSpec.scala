package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.vector.{vec_dot, vec_norm2}

class VectorSpec extends SparkTestBase {

  private def pairs = {
    val e = Tables(spark, sf, "embeddings").limit(40)
    e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("b")))
  }

  private val hofDot =
    aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("vec_dot is bit-identical to the interpreted HOF left-fold") {
    assert(pairs.select(vec_dot(col("a"), col("b")).as("fast"), hofDot.as("slow"))
      .filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("vec_norm2 equals vec_dot(a, a)") {
    assert(pairs.select(vec_norm2(col("a")).as("n"), vec_dot(col("a"), col("a")).as("d"))
      .filter(col("n") =!= col("d")).count() == 0)
  }

  test("vec_dot handles double arrays (hyperplane weights) and SQL registration") {
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(2.0D, 3.0D)) AS d," +
        " vec_norm2(array(3.0D, 4.0D)) AS n").head
    assert(r.getDouble(0) == 9.0)
    assert(r.getDouble(1) == 25.0)
  }

  test("vec_dot participates in whole-stage codegen (no CodegenFallback)") {
    val df = pairs.select(vec_dot(col("a"), col("b")).as("d"))
    df.collect() // materialize the adaptive final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}
