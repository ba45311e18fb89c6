package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the MomentMatrix buffer algebra — update/merge/
  * serde directly on aggregation buffers, the exact operations the
  * streaming state store and the map-side partial agg perform. The
  * mergeable-summary law under test is the one D32's scale argument
  * rests on: ANY partitioning of the vector stream folds to the same
  * moments as the sequential pass.
  */
class MomentMatrixPropSpec extends AnyFunSuite {

  private val D = 6

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val agg = MomentMatrix(
    BoundReference(0, ArrayType(LongType, containsNull = false), nullable = false),
    Literal(D))

  private def row(v: Seq[Long]): InternalRow =
    InternalRow(new GenericArrayData(v.toArray))

  private def evalOf(parts: Seq[Seq[Seq[Long]]], viaSerde: Boolean): Seq[Long] = {
    val partials = parts.map { part =>
      val b = agg.createAggregationBuffer()
      part.foreach(v => agg.update(b, row(v)))
      if (viaSerde) agg.deserialize(agg.serialize(b)) else b
    }
    val merged = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
    agg.eval(merged).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  private val vecGen: Gen[Seq[Long]] =
    Gen.listOfN(D, Gen.chooseNum(-50L, 50L)).map(_.toSeq)

  private val partsGen: Gen[Seq[Seq[Seq[Long]]]] =
    Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(0, 8).flatMap(m => Gen.listOfN(m, vecGen).map(_.toSeq))
    ).map(_.toSeq))

  private def sequential(vecs: Seq[Seq[Long]]): Seq[Long] = {
    val out = new Array[Long](1 + D + D * D)
    vecs.foreach { v =>
      out(0) += 1
      for (i <- 0 until D) {
        out(1 + i) += v(i)
        for (j <- 0 until D) out(1 + D + i * D + j) += v(i) * v(j)
      }
    }
    out.toSeq
  }

  test("any partitioning folds to the sequential moments, with and without serde") {
    check(Prop.forAll(partsGen) { parts =>
      val want = sequential(parts.flatten)
      evalOf(parts, viaSerde = false) == want && evalOf(parts, viaSerde = true) == want
    })
  }

  test("the Gram block is symmetric and the count/sum blocks are exact") {
    check(Prop.forAll(partsGen) { parts =>
      val m = evalOf(parts, viaSerde = true)
      val flat = parts.flatten
      m.head == flat.size.toLong &&
        (0 until D).forall(i => m(1 + i) == flat.map(_(i)).sum) &&
        (0 until D).forall(i => (0 until i).forall(j =>
          m(1 + D + i * D + j) == m(1 + D + j * D + i)))
    })
  }

  test("a wrong-dimension vector fails loudly, never skews the moments") {
    val b = agg.createAggregationBuffer()
    val e = intercept[IllegalArgumentException](
      agg.update(b, row(Seq.fill(D + 1)(1L))))
    assert(e.getMessage.contains("expected"))
    assert(b.forall(_ == 0L), "buffer mutated by a rejected vector")
  }
}
