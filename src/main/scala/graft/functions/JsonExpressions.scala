package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Strict whole-document JSON scanner — the engine-neutral semantics the
  * dirty-props domain needs (SURVEY §7p, the r17-verdict props probe).
  *
  * WHY NOT `get_json_object`: Spark's built-in extraction is a lenient
  * Jackson parse — it accepts a valid JSON PREFIX and ignores trailing
  * garbage (`{"k":12} trailing` → 12), while DuckDB's `json_valid`
  * (yyjson) rejects the whole document → the engines hash-diverge on a
  * planted probe row. No Spark builtin closes the gap: `try_parse_json`
  * (variant) is ALSO prefix-lenient AND rejects duplicate keys that
  * both extraction paths accept first-wins. And Jackson cannot be
  * configured to match yyjson's literal set (yyjson reads `nan` / `INF`
  * case-insensitively; Jackson's ALLOW_NON_NUMERIC_NUMBERS set is
  * case-sensitive and accepts `+Infinity`, which yyjson rejects). So
  * the semantics are DEFINED here, once, as a ~200-line scanner whose
  * acceptance rules were pinned class-by-class against DuckDB 1.0
  * (JsonStrictSpec mirrors that table):
  *
  *  - the ENTIRE string must be one RFC-8259 document (leading/trailing
  *    whitespace ok; any other trailing content → invalid);
  *  - ONE trailing comma before `}` / `]` is accepted (yyjson does);
  *  - numbers: strict RFC (no leading zeros / `+` / bare `.`), PLUS
  *    case-insensitive `nan` | `inf` | `infinity` with optional leading
  *    `-` (yyjson's non-standard-literal set; `+inf` invalid);
  *  - strings: control chars must be escaped; `\\uXXXX` escapes must
  *    pair surrogates (a lone surrogate escape invalidates the doc);
  *  - depth / number length / string length unbounded (iterative scan;
  *    yyjson has no limits — Jackson's 1000-deep default would diverge).
  *
  * Field extraction ([[JsonStrictField]]) returns the FIRST top-level
  * occurrence (duplicate keys are first-wins on both engines) of a
  * SCALAR field: strings decode their escapes, numbers return the raw
  * lexeme, booleans the literal text; JSON null, absent fields,
  * composite values, non-object roots, and invalid documents are all
  * SQL NULL. Consumers that need a typed value re-guard the text
  * (b7: integral regex + try_cast — both engines normalize differently
  * on the DOUBLE path, `1e3` → Spark raw `"1e3"` vs DuckDB `"1000.0"`,
  * so only the cross-engine-stable integral-lexeme class is cast; every
  * double-path form fails the regex on both sides and collapses to the
  * same NULL).
  *
  * Scale shape: one pass, zero shuffle, codegen'd via a static call
  * (stays inside WholeStageCodegen); per-row allocation is one long
  * mask (container kinds, spills to BitSet only past depth 64).
  */
object StrictJson {

  /** Reference-equality sentinel: document invalid (vs valid-but-no-
    * scalar-field, which is a plain null — both surface as SQL NULL
    * from field extraction, but [[isValid]] needs the distinction).
    */
  private val Invalid = new String("invalid")

  /** Expression entry points (also called from generated code). */
  def fieldUTF8(json: UTF8String, name: String): UTF8String = {
    val r = scan(json.toString, name)
    if ((r eq Invalid) || r == null) null else UTF8String.fromString(r)
  }

  def isValid(json: UTF8String): Boolean = !(scan(json.toString, null) eq Invalid)

  private def skipWs(s: String, i0: Int, n: Int): Int = {
    var i = i0
    while (i < n && {
      val c = s.charAt(i)
      c == ' ' || c == '\t' || c == '\n' || c == '\r'
    }) i += 1
    i
  }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** One number (or nan/inf literal) starting at i0; end index or -1. */
  private def parseNumber(s: String, i0: Int, n: Int): Int = {
    var i = i0
    if (i < n && s.charAt(i) == '-') i += 1
    if (i >= n) return -1
    val c0 = lower(s.charAt(i))
    if (c0 == 'n' || c0 == 'i') {
      def ci(lit: String): Boolean =
        i + lit.length <= n && {
          var k = 0
          while (k < lit.length && lower(s.charAt(i + k)) == lit.charAt(k)) k += 1
          k == lit.length
        }
      if (ci("nan")) return i + 3
      if (ci("infinity")) return i + 8 // before "inf": longest match
      if (ci("inf")) return i + 3
      return -1
    }
    if (!isDigit(s.charAt(i))) return -1
    if (s.charAt(i) == '0') {
      i += 1
      if (i < n && isDigit(s.charAt(i))) return -1 // leading zero
    } else {
      while (i < n && isDigit(s.charAt(i))) i += 1
    }
    if (i < n && s.charAt(i) == '.') {
      i += 1
      if (i >= n || !isDigit(s.charAt(i))) return -1
      while (i < n && isDigit(s.charAt(i))) i += 1
    }
    if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      i += 1
      if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      if (i >= n || !isDigit(s.charAt(i))) return -1
      while (i < n && isDigit(s.charAt(i))) i += 1
    }
    i
  }

  private def hex4(s: String, i: Int, n: Int): Int = {
    if (i + 4 > n) return -1
    var v = 0
    var k = 0
    while (k < 4) {
      val c = s.charAt(i + k)
      val d =
        if (isDigit(c)) c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = (v << 4) | d
      k += 1
    }
    v
  }

  /** One string starting at the opening quote; returns the index past
    * the closing quote or -1. When sb != null the decoded value is
    * appended (only capture sites pay the decode).
    */
  private def parseString(s: String, i0: Int, n: Int,
      sb: java.lang.StringBuilder): Int = {
    var i = i0 + 1
    var res = -2
    while (res == -2) {
      if (i >= n) res = -1
      else {
        val c = s.charAt(i)
        if (c == '"') res = i + 1
        else if (c == '\\') {
          if (i + 1 >= n) res = -1
          else s.charAt(i + 1) match {
            case q @ ('"' | '\\' | '/') => if (sb != null) sb.append(q); i += 2
            case 'b' => if (sb != null) sb.append('\b'); i += 2
            case 'f' => if (sb != null) sb.append('\f'); i += 2
            case 'n' => if (sb != null) sb.append('\n'); i += 2
            case 'r' => if (sb != null) sb.append('\r'); i += 2
            case 't' => if (sb != null) sb.append('\t'); i += 2
            case 'u' =>
              val h = hex4(s, i + 2, n)
              if (h < 0 || (h >= 0xDC00 && h <= 0xDFFF)) res = -1 // bad hex / lone low
              else if (h >= 0xD800 && h <= 0xDBFF) {
                // high surrogate: MUST pair with an escaped low one
                if (i + 12 > n || s.charAt(i + 6) != '\\' || s.charAt(i + 7) != 'u') res = -1
                else {
                  val l = hex4(s, i + 8, n)
                  if (l < 0xDC00 || l > 0xDFFF) res = -1
                  else {
                    if (sb != null) { sb.append(h.toChar); sb.append(l.toChar) }
                    i += 12
                  }
                }
              } else {
                if (sb != null) sb.append(h.toChar)
                i += 6
              }
            case _ => res = -1
          }
        } else if (c < 0x20) res = -1 // unescaped control char
        else {
          if (sb != null) sb.append(c)
          i += 1
        }
      }
    }
    res
  }

  // scanner states
  private final val SVal = 0   // a value is required (root, after ':')
  private final val SElem = 1  // array slot: value or ']'
  private final val SKey = 2   // object slot: key or '}'
  private final val SColon = 3
  private final val SAfter = 4 // a value just completed

  /** Core scan. Returns [[Invalid]] (reference compare), null (valid,
    * no scalar `field` at top level), or the field's text.
    */
  private[functions] def scan(s: String, field: String): String = {
    val n = s.length
    var i = skipWs(s, 0, n)
    if (i >= n) return Invalid

    // container-kind stack: depths 1..64 in a long, BitSet beyond
    var objMask = 0L
    var deepObj: java.util.BitSet = null
    def setObj(d: Int, isObj: Boolean): Unit =
      if (d <= 64) {
        val bit = 1L << (d - 1)
        objMask = if (isObj) objMask | bit else objMask & ~bit
      } else {
        if (deepObj == null) deepObj = new java.util.BitSet()
        deepObj.set(d, isObj)
      }
    def isObj(d: Int): Boolean =
      if (d <= 64) (objMask & (1L << (d - 1))) != 0L
      else deepObj != null && deepObj.get(d)

    var depth = 0
    var captured: String = null
    var seen = false    // first top-level match consumed
    var pending = false // next value belongs to the matched field
    var state = SVal
    var done = false

    while (!done) {
      i = skipWs(s, i, n)
      state match {
        case SVal | SElem =>
          if (i >= n) return Invalid
          val c = s.charAt(i)
          if (c == ']' && state == SElem) { // '[]' or '[…,]'
            depth -= 1; i += 1; state = SAfter
          } else if (c == '{') {
            if (pending) { seen = true; pending = false } // composite → NULL
            depth += 1; setObj(depth, isObj = true); i += 1; state = SKey
          } else if (c == '[') {
            if (pending) { seen = true; pending = false }
            depth += 1; setObj(depth, isObj = false); i += 1; state = SElem
          } else if (c == '"') {
            val sb = if (pending) new java.lang.StringBuilder else null
            val e = parseString(s, i, n, sb)
            if (e < 0) return Invalid
            if (pending) { captured = sb.toString; seen = true; pending = false }
            i = e; state = SAfter
          } else if (s.startsWith("true", i)) {
            if (pending) { captured = "true"; seen = true; pending = false }
            i += 4; state = SAfter
          } else if (s.startsWith("false", i)) {
            if (pending) { captured = "false"; seen = true; pending = false }
            i += 5; state = SAfter
          } else if (s.startsWith("null", i)) {
            if (pending) { seen = true; pending = false } // JSON null → SQL NULL
            i += 4; state = SAfter
          } else {
            val e = parseNumber(s, i, n)
            if (e < 0) return Invalid
            if (pending) { captured = s.substring(i, e); seen = true; pending = false }
            i = e; state = SAfter
          }
        case SKey =>
          if (i >= n) return Invalid
          val c = s.charAt(i)
          if (c == '}') { depth -= 1; i += 1; state = SAfter }
          else if (c == '"') {
            // compare (decoded) key only where a match is still possible
            val candidate = depth == 1 && !seen && field != null
            val sb = if (candidate) new java.lang.StringBuilder else null
            val e = parseString(s, i, n, sb)
            if (e < 0) return Invalid
            if (candidate && sb.toString == field) pending = true
            i = e; state = SColon
          } else return Invalid
        case SColon =>
          if (i >= n || s.charAt(i) != ':') return Invalid
          i += 1; state = SVal
        case SAfter =>
          if (depth == 0) {
            if (i < n) return Invalid // trailing content after the document
            done = true
          } else if (i >= n) return Invalid
          else {
            val c = s.charAt(i)
            if (isObj(depth)) {
              if (c == ',') { i += 1; state = SKey } // trailing comma ok at SKey
              else if (c == '}') { depth -= 1; i += 1 }
              else return Invalid
            } else {
              if (c == ',') { i += 1; state = SElem }
              else if (c == ']') { depth -= 1; i += 1 }
              else return Invalid
            }
          }
      }
    }
    if (seen) captured else null
  }
}

/** Scalar-field extraction under [[StrictJson]] semantics: text of the
  * first top-level `name` field when the document is strict JSON with
  * an object root and the value is a scalar; SQL NULL otherwise.
  */
case class JsonStrictField(child: Expression, name: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"json_strict_field expects a string column, got $dt")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    StrictJson.fieldUTF8(t.asInstanceOf[UTF8String], name)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fieldName", name, "java.lang.String")
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = graft.functions.StrictJson.fieldUTF8($t, $ref);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(c: Expression): JsonStrictField =
    copy(child = c)
}

/** Whole-document validity under [[StrictJson]] semantics — the ingest
  * gate twin of DuckDB's `json_valid` (acceptance rules pinned
  * class-by-class in JsonStrictSpec).
  */
case class JsonStrictValid(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"json_strict_valid expects a string column, got $dt")
  }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(t: Any): Any =
    StrictJson.isValid(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.StrictJson.isValid($t);")

  override protected def withNewChildInternal(c: Expression): JsonStrictValid =
    copy(child = c)
}

/** Column-API entry points (same bridge as [[multisearch]]). */
object json {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def json_strict_field(c: Column, name: String): Column =
    column(JsonStrictField(expression(c), name))

  def json_strict_valid(c: Column): Column =
    column(JsonStrictValid(expression(c)))
}
