package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}
import graft.functions.hashes.rolling_hashes

class HashesSpec extends SparkTestBase {

  private val B = 1000003L
  private val M = 1000000007L

  private def tokenArrays =
    Tables(spark, sf, "documents").limit(100)
      .select(col("doc_id"),
        transform(split(col("text"), " "),
          t => (length(t) * 1009L + ascii(substring(t, 1, 1)) * 31L +
            ascii(substring(t, -1, 1))).cast("long")).as("th"))

  test("rolling_hashes equals the declarative aggregate fold") {
    val slow = expr(
      s"""aggregate(th,
         |  struct(CAST(0 AS BIGINT) AS h, CAST(array() AS ARRAY<BIGINT>) AS arr),
         |  (acc, t) -> struct((acc.h * $B + t) % $M AS h,
         |    array_append(acc.arr, (acc.h * $B + t) % $M) AS arr),
         |  acc -> acc.arr)""".stripMargin)
    assert(tokenArrays
      .select(rolling_hashes(col("th"), lit(B), lit(M)).as("fast"), slow.as("slow"))
      .filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("last prefix hash equals the C5 fingerprint fold") {
    val fp = aggregate(col("th"), lit(0L), (acc, t) => (acc * lit(B) + t) % lit(M))
    assert(tokenArrays
      .select(element_at(rolling_hashes(col("th"), lit(B), lit(M)), -1).as("lastp"),
        fp.as("fp"))
      .filter(col("lastp") =!= col("fp")).count() == 0)
  }

  test("empty array yields empty result; single element is t % m") {
    val r = spark.sql(
      s"""SELECT size(rolling_hashes(CAST(array() AS ARRAY<BIGINT>), ${B}L, ${M}L)) AS emp,
         |  rolling_hashes(array(42L), ${B}L, ${M}L)[0] AS single
         |""".stripMargin).head
    assert(r.getInt(0) == 0 && r.getLong(1) == 42L)
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    val df = tokenArrays.select(rolling_hashes(col("th"), lit(B), lit(M)).as("p"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}

/** Property check against an independent per-prefix fold — direct
  * interpreted `eval` on Literal inputs (same harness as SetsPropSpec).
  */
class RollingHashesPropSpec extends AnyFunSuite {
  private val B = 1000003L
  private val M = 1000000007L

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val tsGen: Gen[List[Long]] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 0xfffffL)))

  test("prefix k of rolling_hashes equals an independent fold of the first k elements") {
    check(Prop.forAll(tsGen) { ts =>
      val arr = Literal(ArrayData.toArrayData(ts.toArray),
        ArrayType(LongType, containsNull = false))
      val got = RollingHashes(arr, Literal(B), Literal(M)).eval(null)
        .asInstanceOf[ArrayData].toLongArray.toList
      val want = ts.indices.map { k =>
        ts.take(k + 1).foldLeft(0L)((acc, t) => (acc * B + t) % M)
      }.toList
      got == want
    })
  }
}
