package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions as
  * SQL functions (`vec_dot`, `vec_norm2`), so `spark.sql("... vec_dot(a,
  * b) ...")` works next to the Column API. Install with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info(classOf[VecDot], "vec_dot",
        "vec_dot(a, b) - dot product of two float/double array vectors"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm2"),
      info(classOf[VecNorm2], "vec_norm2",
        "vec_norm2(a) - sum of squares of a float/double array vector"),
      (args: Seq[Expression]) => VecNorm2(args.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info(classOf[SortedIntersectCount], "sorted_intersect_count",
        "sorted_intersect_count(a, b) - |a ∩ b| of two ascending-sorted distinct bigint arrays"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("bottom_k"),
      info(classOf[BottomK], "bottom_k",
        "bottom_k(v, k) - aggregate: k smallest distinct bigint values, ascending array"),
      (args: Seq[Expression]) => BottomK(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hashes"),
      info(classOf[RollingHashes], "rolling_hashes",
        "rolling_hashes(t, b, m) - array of all prefix hashes (t1*b^(k-1)+...+tk) mod m"),
      (args: Seq[Expression]) => RollingHashes(args(0), args(1), args(2))))
    // config-carrying expressions: the keyword/merge list must be a
    // FOLDABLE array literal — it is compiled into the operator
    // (automaton / merge table), not evaluated per row
    def foldableStrings(e: Expression, fn: String): Seq[String] = {
      import org.apache.spark.sql.types.{ArrayType, StringType}
      val elemOk = e.dataType match {
        case ArrayType(StringType, _) => true
        case _                        => false
      }
      require(e.foldable && elemOk,
        s"$fn expects a foldable array<string> literal, got ${e.dataType.sql}: $e")
      val arr = e.eval()
      require(arr != null, s"$fn config array must not be NULL")
      val objs = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(StringType)
      require(!objs.contains(null),
        s"$fn config array must not contain NULL elements")
      objs.map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
    }
    ext.injectFunction((
      FunctionIdentifier("multi_contains"),
      info(classOf[MultiContains], "multi_contains",
        "multi_contains(text, array('kw', ...)) - bitmask of keywords present as substrings (one Aho-Corasick pass)"),
      (args: Seq[Expression]) =>
        MultiContains(args(0), foldableStrings(args(1), "multi_contains"))))
    ext.injectFunction((
      FunctionIdentifier("bpe_segment"),
      info(classOf[BpeSegment], "bpe_segment",
        "bpe_segment(text, array('a','b', 'c','d', ...)) - one-pass BPE apply; flat pairs (a,b),(c,d),... in priority order"),
      (args: Seq[Expression]) => {
        val flat = foldableStrings(args(1), "bpe_segment")
        require(flat.size % 2 == 0, "bpe_segment merge list must have even length (flat pairs)")
        BpeSegment(args(0), flat.grouped(2).map(p => (p(0), p(1))).toSeq)
      }))
    ext.injectFunction((
      FunctionIdentifier("wordpiece_segment"),
      info(classOf[WordPieceSegment], "wordpiece_segment",
        "wordpiece_segment(text, array('init', ...), array('cont', ...)) - greedy longest-match WordPiece apply; ##-tagged continuation pieces"),
      (args: Seq[Expression]) => WordPieceSegment(args(0),
        foldableStrings(args(1), "wordpiece_segment"),
        foldableStrings(args(2), "wordpiece_segment"))))
    // size(array_intersect) on bigint arrays → the codegen'd merge scan
    // (the d14 hand-fix as an automatic plan rewrite)
    ext.injectOptimizerRule(_ => graft.plans.RewriteIntersectCount)
    // whole-operator extension: the native ASOF JOIN planner strategy
    // (AsOfJoinPlan → AsOfJoinExec; see graft.plans.AsOfJoin)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
