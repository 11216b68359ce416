package graft

/** Minimal JSON string escaping shared by the driver-facing artifact
  * writers (Verify's oracle_sql.json, Bench's bench_out/bench_warm.json).
  * Backslash, quote, and ALL control chars (&lt;0x20) — a tab or CR in a
  * builder-authored SQL string or query name would otherwise make the
  * driver's json.load fail and silently zero the round's artifact.
  */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
