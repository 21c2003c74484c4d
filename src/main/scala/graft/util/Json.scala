package graft.util

/** Minimal JSON string escaping shared by the harness mains (Verify,
  * Bench): backslash, quote, and ALL control chars — a tab or CR in
  * builder-authored SQL, or a quote in an env-supplied path, would
  * otherwise make the driver's json.load fail and silently zero a
  * round's correctness or bench.
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
