package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass BPE tokenizer application (SURVEY.md §2 C96) — the
  * production counterpart of the C59/C95 learned-iteration machinery:
  * the full learned merge table rides into the expression as a bounded
  * reference object (the d26 frozen-index contract) and each document
  * is segmented partition-locally in a single scan-stage pass, no
  * shuffle, no per-merge corpus rescans. At 100 TB this is the only
  * viable apply shape: a 32k-merge table is a few hundred KB broadcast
  * once per executor, and the corpus moves zero times.
  *
  * Semantics are EXACTLY the corpus-level iteration's (applying merge i
  * to the whole corpus is a per-document-local operation, so the
  * per-document sequential application over the merge list in priority
  * order is equal to C59's global loop): for each merge (a, b) in
  * order, a greedy left-to-right non-overlapping scan replaces adjacent
  * (a, b) with "a_b". The equality is spec-pinned against [[graft.text
  * .TextQueries.bpeApplyOn]] and oracle-checked end-to-end by c96.
  *
  * The merge list is constructor config, not a child expression — it is
  * learned once per query (driver-side K-row collect) and constant
  * across rows, so it belongs in codegen as a referenced object, not in
  * the row loop.
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment expects a string column, got $dt")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val mergeArr: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray

  override protected def nullSafeEval(t: Any): Any =
    BpeSegment.segment(t.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", mergeArr, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeSegment.segment($t, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): BpeSegment =
    copy(child = c)
}

object BpeSegment {

  /** The segmentation kernel, shared by eval and generated code. */
  def segment(text: UTF8String, merges: Array[Array[String]]): ArrayData = {
    // split semantics must match Spark's split(text, ' ') with the
    // default -1 limit (and DuckDB string_split): trailing empties kept
    var toks: Array[String] = text.toString.split(" ", -1)
    var mi = 0
    while (mi < merges.length) {
      val a = merges(mi)(0)
      val b = merges(mi)(1)
      val out = new Array[String](toks.length)
      var n = 0
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out(n) = a + "_" + b
          n += 1
          i += 2
        } else {
          out(n) = toks(i)
          n += 1
          i += 1
        }
      }
      toks = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      mi += 1
    }
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      arr(i) = UTF8String.fromString(toks(i))
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** One-pass WordPiece tokenizer application (SURVEY.md §2 C119) — the
  * greedy LONGEST-MATCH-FIRST segmentation family (Wu et al. 2016)
  * next to [[BpeSegment]]'s merge-order family: per word, repeatedly
  * take the longest vocab piece matching at the cursor (word-initial
  * pieces and `##`-tagged continuation pieces are separate vocab
  * positions), never backtracking. Same scale contract as BpeSegment:
  * the vocab rides in as a bounded reference object broadcast once per
  * executor, every document segments partition-locally in one
  * scan-stage pass, the corpus moves zero times.
  *
  * The vocab is REQUIRED to contain every character of the corpus in
  * both positions (the builder guarantees it), so a no-match cursor is
  * a construction bug, not data — it throws loudly (the c96 dry-learn
  * rule) rather than emitting a silent UNK that the DuckDB oracle
  * (which assumes full char cover to terminate its recursion) would
  * never see.
  */
case class WordPieceSegment(child: Expression,
    initPieces: Seq[String], contPieces: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment expects a string column, got $dt")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val initSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    initPieces.foreach(s.add)
    s
  }
  private lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    contPieces.foreach(s.add)
    s
  }
  private lazy val maxLen: Int =
    ((initPieces.iterator ++ contPieces.iterator).map(_.length) ++ Iterator(1)).max

  override protected def nullSafeEval(t: Any): Any =
    WordPieceSegment.segment(t.asInstanceOf[UTF8String], initSet, contSet, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val initRef = ctx.addReferenceObj("wpInit", initSet, "java.util.HashSet")
    val contRef = ctx.addReferenceObj("wpCont", contSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordPieceSegment.segment(" +
        s"$t, $initRef, $contRef, $maxLen);")
  }

  override protected def withNewChildInternal(c: Expression): WordPieceSegment =
    copy(child = c)
}

object WordPieceSegment {

  /** The greedy longest-match kernel, shared by eval and generated
    * code. Splits like Spark's split(text, ' ') with -1 limit; empty
    * words contribute no pieces.
    */
  def segment(text: UTF8String, init: java.util.HashSet[String],
      cont: java.util.HashSet[String], maxLen: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var pos = 0
      while (pos < w.length) {
        var l = math.min(maxLen, w.length - pos)
        var matched = 0
        while (l >= 1 && matched == 0) {
          val sub = w.substring(pos, pos + l)
          val hit = if (pos == 0) init.contains(sub) else cont.contains(sub)
          if (hit) {
            out += UTF8String.fromString(if (pos == 0) sub else "##" + sub)
            matched = l
          }
          l -= 1
        }
        if (matched == 0)
          throw new IllegalStateException(
            s"wordpiece: no vocab piece matches '$w' at offset $pos — " +
              "the builder's single-char cover guarantee is violated")
        pos += matched
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** One-pass unigram-LM (SentencePiece-style) tokenizer application
  * (SURVEY.md §2 C132) — the THIRD tokenizer family next to
  * [[BpeSegment]]'s merge-order and [[WordPieceSegment]]'s greedy
  * longest-match: per word, the VITERBI maximum-likelihood
  * segmentation under a piece cost table (cost = micro-quantized
  * ln piece-probability, so the Viterbi sum is an exact BIGINT and the
  * argmax is engine-independent — the a1/c60 per-row-quantize rule).
  * Ties break on the lexicographically smallest piece path (pieces
  * joined by ' '; at one DP state tied paths cover identical text, so
  * prefix flips are impossible and the order is locally decomposable —
  * the DP can carry it). Same scale contract as its siblings: the
  * vocab+cost table rides in as a bounded reference object broadcast
  * once per executor; each document segments partition-locally in one
  * scan-stage pass, O(len·maxPieceLen) per word; the corpus moves zero
  * times. The vocab is REQUIRED to contain every corpus character
  * (the builder's char layer), so an unreachable word end throws
  * loudly — the [[WordPieceSegment]] cover contract.
  */
case class UnigramSegment(child: Expression,
    pieces: Seq[String], costs: Seq[Long])
    extends UnaryExpression {

  require(pieces.length == costs.length,
    s"unigram_segment: ${pieces.length} pieces but ${costs.length} costs")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects a string column, got $dt")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val costMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.iterator.zip(costs.iterator).foreach { case (p, c) => m.put(p, c) }
    m
  }
  // piece lengths in CODE POINTS — the unit the DP transitions in
  private lazy val maxLen: Int =
    (pieces.iterator.map(p => p.codePointCount(0, p.length)) ++ Iterator(1)).max

  override protected def nullSafeEval(t: Any): Any =
    UnigramSegment.segment(t.asInstanceOf[UTF8String], costMap, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniCosts", costMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.UnigramSegment.segment($t, $ref, $maxLen);")
  }

  override protected def withNewChildInternal(c: Expression): UnigramSegment =
    copy(child = c)
}

object UnigramSegment {

  /** The Viterbi kernel, shared by eval and generated code. Splits like
    * Spark's split(text, ' ') with -1 limit; empty words contribute no
    * pieces. Forward DP over word positions: best(score DESC, path ASC)
    * per position, transitions = vocab pieces matching at the cursor.
    */
  def segment(text: UTF8String, costs: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.length > 0) {
        // DP positions are CODE POINTS, not UTF-16 chars: the vocab seed
        // (Spark `substring`) and the DuckDB oracle both slice by code
        // points, and a char-indexed DP would use surrogate HALVES as
        // transition keys on non-BMP text — those are never vocab keys,
        // so the single-char cover guarantee would break. off(i) = char
        // offset of code point i.
        val n = w.codePointCount(0, w.length)
        val off = new Array[Int](n + 1)
        var ci = 0
        var co = 0
        while (ci < n) { off(ci) = co; co = w.offsetByCodePoints(co, 1); ci += 1 }
        off(n) = w.length
        val score = new Array[Long](n + 1)
        val path = new Array[String](n + 1)
        path(0) = ""
        var pos = 0
        while (pos < n) {
          if (path(pos) != null) {
            var l = 1
            val lim = math.min(maxLen, n - pos)
            while (l <= lim) {
              val sub = w.substring(off(pos), off(pos + l))
              val c = costs.get(sub)
              if (c != null) {
                val s = score(pos) + c.longValue()
                val p = if (pos == 0) sub else path(pos) + " " + sub
                val tgt = pos + l
                if (path(tgt) == null || s > score(tgt) ||
                    (s == score(tgt) && p.compareTo(path(tgt)) < 0)) {
                  score(tgt) = s
                  path(tgt) = p
                }
              }
              l += 1
            }
          }
          pos += 1
        }
        if (path(n) == null)
          throw new IllegalStateException(
            s"unigram: no segmentation covers '$w' — the builder's " +
              "single-char cover guarantee is violated")
        path(n).split(" ", -1).foreach(p => out += UTF8String.fromString(p))
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Column-API entry point (same bridge as [[sets]]). */
object textseg {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def bpe_segment(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeSegment(expression(text), merges))

  def wordpiece_segment(text: Column, initPieces: Seq[String],
      contPieces: Seq[String]): Column =
    column(WordPieceSegment(expression(text), initPieces, contPieces))

  def unigram_segment(text: Column, pieces: Seq[String],
      costs: Seq[Long]): Column =
    column(UnigramSegment(expression(text), pieces, costs))
}
