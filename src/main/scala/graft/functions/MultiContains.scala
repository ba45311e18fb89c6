package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-keyword substring search in ONE pass (SURVEY.md §2 C97) — the
  * blocklist/taglist primitive every crawl-curation pipeline runs (C4's
  * badwords filter, RefinedWeb's URL/keyword blocklists): given K
  * keywords, return the bitmask of keywords present as substrings of
  * the document. The naive form is K independent `contains` scans —
  * O(K·|doc|) and K codegen'd loops; this expression compiles the
  * keyword set into an Aho-Corasick automaton ONCE (driver-side,
  * rides into codegen as a reference object) and scans each document
  * once — O(|doc| + matches) per row whatever K grows to. At a 100 TB
  * corpus with a production blocklist (thousands of terms) the
  * single-pass automaton is the only viable shape; the per-keyword
  * scan degrades linearly in K.
  *
  * K is capped at 64 so the result is a single LongType bitmask
  * (bit i = keyword i present); `bit_count` gives the hit count and
  * the mask itself pins WHICH keywords matched for hash-checking.
  * Matching is case-sensitive raw-substring, exactly DuckDB
  * `strpos(text, kw) > 0` — the oracle twin.
  */
case class MultiContains(child: Expression, keywords: Seq[String])
    extends UnaryExpression {

  require(keywords.nonEmpty && keywords.size <= 64,
    s"multi_contains supports 1..64 keywords, got ${keywords.size}")
  require(keywords.forall(_.nonEmpty), "empty keyword")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"multi_contains expects a string column, got $dt")
  }

  override def dataType: DataType = LongType

  @transient private lazy val automaton = new AhoCorasick(keywords.toArray)

  override protected def nullSafeEval(t: Any): Any =
    automaton.searchMask(t.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("automaton", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $ref.searchMask($t.toString());")
  }

  override protected def withNewChildInternal(c: Expression): MultiContains =
    copy(child = c)
}

/** Classic Aho-Corasick: trie + BFS failure links + merged output
  * masks. Built once per expression instance; thread-safe after
  * construction (all state is final arrays).
  */
final class AhoCorasick(keywords: Array[String]) extends Serializable {

  // trie as growable parallel structures, frozen into arrays at the end
  private val (next, fail, out) = {
    val nxt = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val outMask = scala.collection.mutable.ArrayBuffer(0L)
    keywords.zipWithIndex.foreach { case (kw, ki) =>
      var s = 0
      kw.foreach { ch =>
        s = nxt(s).getOrElseUpdate(ch, {
          nxt += scala.collection.mutable.HashMap.empty[Char, Int]
          outMask += 0L
          nxt.size - 1
        })
      }
      outMask(s) |= 1L << ki
    }
    val failArr = new Array[Int](nxt.size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    nxt(0).valuesIterator.foreach { s => failArr(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      nxt(u).foreach { case (ch, v) =>
        var f = failArr(u)
        while (f != 0 && !nxt(f).contains(ch)) f = failArr(f)
        failArr(v) = if (nxt(f).contains(ch) && nxt(f)(ch) != v) nxt(f)(ch) else 0
        outMask(v) |= outMask(failArr(v))
        queue += v
      }
    }
    (nxt.map(m => m.toMap).toArray, failArr, outMask.toArray)
  }

  /** Bitmask of keywords occurring as substrings of `text`. */
  def searchMask(text: String): Long = {
    var mask = 0L
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      while (s != 0 && !next(s).contains(ch)) s = fail(s)
      s = next(s).getOrElse(ch, 0)
      mask |= out(s)
      i += 1
    }
    mask
  }
}

/** Column-API entry point (same bridge as [[sets]]). */
object multisearch {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def multi_contains(text: Column, keywords: Seq[String]): Column =
    column(MultiContains(expression(text), keywords))
}
