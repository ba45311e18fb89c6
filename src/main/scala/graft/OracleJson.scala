package graft

import java.nio.file.{Files, Paths}

/** Single implementation of the oracle_sql.json writer shared by
  * [[Verify]] and [[Dump]] — the escaping is correctness-critical (a
  * bad escape makes the driver's json.load fail and silently zero the
  * round), so there must be exactly one copy of it.
  */
object OracleJson {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20). */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Write `<outDir>/oracle_sql.json` for the selected query names. */
  def write(outDir: String, keep: String => Boolean): Unit = {
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json): Unit
  }
}
