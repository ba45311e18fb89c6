package graft

import org.apache.spark.sql.Row
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.StrictJson

/** Pins [[graft.functions.StrictJson]]'s acceptance rules to the
  * DuckDB-1.0 `json_valid` behavior table measured in the r18 props
  * probe (SURVEY §7p) — every row here was run against DuckDB first.
  * If this spec and the fuzz lane ever disagree with the oracle, the
  * SCANNER moved, not the contract.
  *
  * NOTE on literals: scalac processes `\uXXXX` even inside triple
  * quotes, so every escape the JSON parser must SEE as text is written
  * with a doubled backslash.
  */
class JsonStrictSpec extends SparkTestBase {

  private def valid(s: String): Boolean =
    StrictJson.isValid(UTF8String.fromString(s))

  private def field(s: String, k: String = "k"): String = {
    val r = StrictJson.fieldUTF8(UTF8String.fromString(s), k)
    if (r == null) null else r.toString
  }

  test("structure: strict whole-document parse, trailing content invalid") {
    assert(valid("""{"k": 12}"""))
    assert(valid("  {\"k\": 12}   "))
    assert(!valid("""{"k": 12} trailing"""))
    assert(!valid("""{"k": 12} true""")) // second root value
    assert(!valid("""{"a":1}]"""))
    assert(!valid(""))
    assert(!valid("   "))
    assert(!valid("{"))
    assert(!valid("not json"))
    assert(!valid("\uFEFF" + """{"k":1}""")) // BOM
    assert(valid("{}") && valid("[]") && valid("[[]]"))
    assert(valid("\"s\"") && valid("true") && valid("12") && valid("null"))
    assert(!valid("""{"k":}""") && !valid("""{"a" 1}"""))
    assert(!valid("{,}") && !valid("[,]") && !valid("[,1]"))
  }

  test("structure: one trailing comma accepted (yyjson), doubles rejected") {
    assert(valid("""{"k":1,}"""))
    assert(valid("""{"k":1 , }"""))
    assert(valid("[1 ,  ]"))
    assert(!valid("""{"k":1,,}"""))
    assert(!valid("""{"a":1,,"k":2}"""))
    assert(field("""{"k":1,}""") == "1")
  }

  test("numbers: strict RFC plus yyjson's case-insensitive nan/inf set") {
    for (bad <- Seq("5.", ".5", "01", "-01", "00", "5.e3", "5e", "5e+",
        "-", "+18", "017", "- 5", "5 5", "infin", "nani", "Infinit",
        "+Infinity", "+inf"))
      assert(!valid(s"""{"k": $bad}"""), s"number form: $bad")
    for (ok <- Seq("0", "-0", "12", "5.0", "5.5", "1e3", "5E+2", "5e-1",
        "99999999999999999999", "3.14159e308", "1e999", "-1e999",
        "NaN", "nan", "NAN", "nAn", "-nan", "Infinity", "-Infinity",
        "infinity", "INFINITY", "inf", "Inf", "INF", "-inf"))
      assert(valid(s"""{"k": $ok}"""), s"number form: $ok")
    // 1000+-digit numbers and 1000+-deep nesting stay valid (unbounded
    // iterative scan): yyjson has no limits and the engines must agree
    assert(valid("""{"k": """ + "9" * 2000 + "}"))
    assert(valid("""{"a": """ + "[" * 1001 + "1" + "]" * 1001 + """, "k": 5}"""))
    assert(field("""{"a": """ + "[" * 1001 + "1" + "]" * 1001 + """, "k": 5}""") == "5")
  }

  test("strings: escaped control chars, surrogate pairing required") {
    assert(!valid("{\"k\": \"a\tb\"}")) // raw control char (real tab)
    assert(valid("""{"k": "a\tb"}""")) // escaped tab (raw string keeps \t)
    assert(valid("""{"k": " "}"""))
    assert(!valid("{\"k\": \"\\ud800\"}")) // lone high escape
    assert(!valid("{\"k\": \"\\udc00\"}")) // lone low escape
    assert(!valid("{\"k\": \"\\ud800\\ud800\"}")) // high+high
    assert(!valid("{\"k\": \"\\ud800\\ue000\"}")) // high+non-surrogate
    assert(valid("{\"k\": \"\\ud83d\\ude00\"}")) // proper pair
    assert(valid("{\"k\": \"\\uD83D\\uDE00\"}")) // hex case-insensitive
    assert(valid("""{"k": "😀"}""")) // raw astral char
    assert(!valid("{\"k\": \"\\x41\"}")) // invalid escape
    assert(!valid("{\"k\": \"\\uZZZZ\"}") && !valid("{\"k\": \"\\u12\"}"))
    assert(valid("{\"k\": \"a\u007fb\"}")) // raw DEL allowed (>= 0x20)
  }

  test("field: first top-level scalar occurrence; composites/null → NULL") {
    assert(field("""{"k": 1, "k": 2}""") == "1") // duplicate keys first-wins
    assert(field("""{"k": 1, "a": 2, "k": 3}""") == "1")
    assert(field("""{"a": {"k": 9}}""") == null) // nested k is not top-level
    assert(field("""{"a": {"k": 9}, "k": 3}""") == "3")
    assert(field("""{"k": {"j": 1}}""") == null) // composite
    assert(field("""{"k": [1, 2]}""") == null)
    assert(field("""{"k": null}""") == null)
    assert(field("""{"k": true}""") == "true")
    assert(field("{\"\\u006b\": 14}") == "14") // escaped key name decodes
    assert(field("""{"K": 13}""") == null) // case-sensitive
    assert(field("{ \"k\"\t:  15 }") == "15")
    assert(field("""{"k": "16"}""") == "16") // strings decode
    assert(field("""{"k": " 7 "}""") == " 7 ")
    assert(field("{\"k\": \"\\u0031\\u00322\"}") == "122") // escape decode
    assert(field("""{"k": 1e3}""") == "1e3") // numbers keep the raw lexeme
    assert(field("""{"k": -0}""") == "-0")
    assert(field("12") == null) // non-object root: valid, no field
    assert(field("""[{"k": 1}]""") == null)
    assert(field("""{"pad": """" + "x" * 10000 + """", "k": 7}""") == "7")
  }

  test("expression: codegen path agrees with the scanner") {
    import graft.functions.json._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      """{"k": 12}""", """{"k": 12} trailing""", """{"k": 5.5}""",
      """{"k": 1, "k": 2}""", "not json", null, """{"k": "16"}""",
      """{"k": null}""", """{"k":1,}""", """{"k": nan}""")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.zipWithIndex.map {
        case (d, i) => Row(i.toLong, d)
      }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("props",
          org.apache.spark.sql.types.StringType))))
    val got = df.select(col("i"), json_strict_field(col("props"), "k").as("s"),
        json_strict_valid(col("props")).as("v"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else java.lang.Boolean.valueOf(r.getBoolean(2))))
      .sortBy(_._1)
    val T = java.lang.Boolean.TRUE
    val F = java.lang.Boolean.FALSE
    assert(got.toSeq == Seq(
      (0L, "12", T), (1L, null, F), (2L, "5.5", T), (3L, "1", T),
      (4L, null, F), (5L, null, null), (6L, "16", T), (7L, null, T),
      (8L, "1", T), (9L, "nan", T)))
  }
}
