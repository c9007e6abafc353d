package graft.core

/** Minimal JSON emission helpers shared by every machine-readable output
  * line (Verify's oracle_sql.json, Bench's result line, Cli's run results).
  * One escape implementation — the three hand-rolled copies had already
  * diverged once (Bench emitted raw strings).
  */
object Json {

  /** A JSON string literal: quotes, backslashes, and ALL control chars
    * escaped — an unescaped tab in builder-authored SQL would make the
    * driver's json.load fail and silently zero a round's correctness.
    */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** JSON number: NaN/Infinity are not valid JSON — emit null. */
  def num(v: Double): String =
    if (v.isNaN || v.isInfinite) "null" else v.toString
}
