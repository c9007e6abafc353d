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

  /** Any → JSON value: strings escape through [[str]], numbers/booleans
    * verbatim, Maps→objects (keys sorted — deterministic output), Seqs→
    * arrays, Option unwraps, null/None → null. Used by the structured-log
    * event lines and anything else emitting nested machine-readable JSON.
    */
  def value(v: Any): String = v match {
    case null | None  => "null"
    case Some(x)      => value(x)
    case s: String    => str(s)
    case b: Boolean   => b.toString
    case d: Double    => num(d)
    case f: Float     => num(f.toDouble)
    case n: Int       => n.toString
    case n: Long      => n.toString
    case n: Short     => n.toString
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => s"${str(k.toString)}:${value(x)}" }
        .sorted.mkString("{", ",", "}")
    case xs: Iterable[_] => xs.map(value).mkString("[", ",", "]")
    // JVM arrays are not Iterable — without this case they'd fall through
    // to toString and emit identity garbage ("[J@1a2b3c") into event lines
    case a: Array[_]  => a.map(value).mkString("[", ",", "]")
    case other        => str(other.toString)
  }

  /** Minimal recursive-descent JSON parser: objects → Map[String, Any],
    * arrays → List[Any], numbers → Double (Long when integral), plus
    * string/true/false/null. Throws IllegalArgumentException on malformed
    * input — callers that tolerate junk lines (LogAnalyzer) catch it.
    */
  def parse(s: String): Any = {
    var i = 0
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON parse error at $i: $msg")
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s(i) != c) err(s"expected '$c'")
      i += 1
    }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case '/' => sb += '/'; i += 2
            case 'u' =>
              if (i + 6 > s.length) err("truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case c => sb += c; i += 2
          }
        } else { sb += s(i); i += 1 }
      }
      expect('"')
      sb.toString
    }
    def parseValue(): Any = {
      ws()
      if (i >= s.length) err("unexpected end")
      s(i) match {
        case '{' =>
          i += 1; ws()
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
          if (i < s.length && s(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws(); val k = parseString(); ws(); expect(':')
              m(k) = parseValue(); ws()
              if (i < s.length && s(i) == ',') { i += 1 } else { expect('}'); more = false }
            }
          }
          m.toMap
        case '[' =>
          i += 1; ws()
          val b = List.newBuilder[Any]
          if (i < s.length && s(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              b += parseValue(); ws()
              if (i < s.length && s(i) == ',') { i += 1 } else { expect(']'); more = false }
            }
          }
          b.result()
        case '"' => parseString()
        case 't' => if (s.startsWith("true", i)) { i += 4; true } else err("bad literal")
        case 'f' => if (s.startsWith("false", i)) { i += 5; false } else err("bad literal")
        case 'n' => if (s.startsWith("null", i)) { i += 4; null } else err("bad literal")
        case _ =>
          val start = i
          while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
          if (i == start) err(s"unexpected '${s(i)}'")
          val raw = s.substring(start, i)
          val d = try raw.toDouble catch { case _: NumberFormatException => err(s"bad number '$raw'") }
          if (d.isWhole && !raw.exists(c => c == '.' || c == 'e' || c == 'E') &&
            d >= Long.MinValue.toDouble && d <= Long.MaxValue.toDouble) d.toLong
          else d
      }
    }
    val v = parseValue()
    ws()
    if (i != s.length) err("trailing content")
    v
  }
}
