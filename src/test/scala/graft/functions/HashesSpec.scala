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

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val Mers = (1L << 61) - 1

  test("str_poly_hash equals a BigInteger fold, codegen == interpreted, range bound") {
    val strGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126)).map(_.map(_.toChar).mkString))
    val bigM = java.math.BigInteger.valueOf(Mers)
    checkProp(Prop.forAll(strGen) { s =>
      val got = StrPolyHash.hash(s.getBytes("UTF-8"))
      val fold = s.getBytes("UTF-8").foldLeft(java.math.BigInteger.ZERO) { (acc, b) =>
        acc.multiply(java.math.BigInteger.valueOf(131L))
          .add(java.math.BigInteger.valueOf(b & 0xffL))
          .mod(bigM)
      }
      // the two quadratic scramble rounds (x -> x² + c mod M)
      val r1 = fold.multiply(fold).add(java.math.BigInteger.valueOf(12345L)).mod(bigM)
      val want = r1.multiply(r1).add(java.math.BigInteger.valueOf(67890L)).mod(bigM)
        .longValueExact()
      got == want && got >= 0L && got < Mers
    })
    // the Column path (codegen) agrees with the direct Scala fold
    import spark.implicits._
    val rows = Seq("alpha", "", "z", "the quick brown fox").toDF("s")
      .select(col("s"), graft.functions.hashes.str_poly_hash(col("s")).as("h"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(1) == StrPolyHash.hash(r.getString(0).getBytes("UTF-8"))))
  }

  test("hll_registers: exact recompute, elementwise-max merge across slicings") {
    import spark.implicits._
    val n = 5000
    val hs = (0 until n).map(i => StrPolyHash.hash(s"token$i".getBytes("UTF-8")))
    def regsOf(xs: Seq[Long]): Seq[Long] = {
      val r = new Array[Long](256)
      xs.foreach { h =>
        val j = (h % 256).toInt
        val w = h / 256
        val rho = if (w == 0L) 54L else java.lang.Long.numberOfTrailingZeros(w) + 1L
        if (rho > r(j)) r(j) = rho
      }
      r.toSeq
    }
    def sketch(xs: Seq[Long]): Seq[Long] =
      xs.toDF("h").agg(graft.functions.aggs.hll_registers(col("h"), 8))
        .head.getSeq[Long](0)
    val all = sketch(hs)
    assert(all == regsOf(hs))
    // mergeability: registers(A ∪ B) == max(registers(A), registers(B))
    val (a, b) = hs.partition(_ % 2 == 0)
    assert(all == sketch(a).zip(sketch(b)).map { case (x, y) => math.max(x, y) })
    // estimate sanity at m=256 (expected rel. error ~6.5%): within 25%
    val sSum = all.map(m => math.pow(2.0, -m.toDouble)).sum
    val est = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 / sSum
    assert(math.abs(est - n) / n < 0.25, s"est=$est")
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
