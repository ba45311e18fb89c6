package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the BottomK buffer algebra — update/merge/serde
  * directly on aggregation buffers (no Spark jobs), so hundreds of
  * random partitionings run in milliseconds.
  */
class BottomKPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val agg = BottomK(BoundReference(0, LongType, nullable = false), Literal(5))

  private def evalOf(vals: Seq[Seq[Long]], viaSerde: Boolean): Seq[Long] = {
    val partials = vals.map { part =>
      val b = agg.createAggregationBuffer()
      part.foreach(v => agg.update(b, InternalRow(v)))
      if (viaSerde) agg.deserialize(agg.serialize(b)) else b
    }
    val merged = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
    agg.eval(merged).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  private val partsGen: Gen[List[List[Long]]] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(0, 20).flatMap(m => Gen.listOfN(m, Gen.chooseNum(-40L, 40L)))))

  test("merge of per-partition buffers == sorted distinct take k, any partitioning") {
    check(Prop.forAll(partsGen) { parts =>
      val want = parts.flatten.distinct.sorted.take(5)
      evalOf(parts, viaSerde = false) == want &&
        evalOf(parts, viaSerde = true) == want
    })
  }
}
