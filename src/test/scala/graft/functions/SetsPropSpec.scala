package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the merge-scan intersect count against Scala's Set
  * intersection — direct interpreted `eval`, no Spark jobs, so hundreds
  * of random cases run in milliseconds.
  */
class SetsPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // small value domain so intersections are actually non-trivial
  private val setGen: Gen[Set[Long]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-50L, 50L))).map(_.toSet)

  private def lit(s: Set[Long]) =
    Literal(ArrayData.toArrayData(s.toArray.sorted), ArrayType(LongType, containsNull = false))

  test("sorted_intersect_count == |A ∩ B| for random long sets") {
    check(Prop.forAll(setGen, setGen) { (a, b) =>
      SortedIntersectCount(lit(a), lit(b)).eval(null) == (a & b).size.toLong
    })
  }
}
