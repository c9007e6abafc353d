package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML entity decoding for the html_to_text curation path.
  *
  * One linear scan: named entities from a fixed documented table, numeric
  * `&#123;` / `&#x1F600;` for any valid Unicode codepoint (surrogate range
  * and out-of-range values are left as literal text, like browsers render
  * malformed references). Unknown or unterminated references pass through
  * unchanged — crawl text is full of bare ampersands and truncated
  * entities, and eating them would corrupt real content.
  *
  * A regexp_replace chain cannot do this: numeric references need
  * codepoint arithmetic, and 20 chained passes re-scan the string 20
  * times. The kernel is one shared static method so the interpreted and
  * codegen paths are the same bytes by construction.
  */
object HtmlEntities {

  /** Named entities decoded: HTML4 core, the punctuation web text uses,
    * and the Latin-1 accented letters (by far the most frequent entities
    * in non-English crawls — entity names are case-sensitive, so both
    * cases are listed). nbsp maps to a PLAIN SPACE, not U+00A0 —
    * downstream tokenizers split on ASCII whitespace.
    */
  val Named: Map[String, String] = {
    val base = Map(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
      "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
      "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
      "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
      "rdquo" -> "”", "middot" -> "·", "laquo" -> "«",
      "raquo" -> "»", "deg" -> "°", "plusmn" -> "±",
      "times" -> "×", "divide" -> "÷", "euro" -> "€",
      "pound" -> "£", "yen" -> "¥", "cent" -> "¢",
      "sect" -> "§", "para" -> "¶", "bull" -> "•", "szlig" -> "ß")
    val lowerAccents = Map(
      "aacute" -> "á", "agrave" -> "à", "acirc" -> "â", "atilde" -> "ã",
      "auml" -> "ä", "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
      "eacute" -> "é", "egrave" -> "è", "ecirc" -> "ê", "euml" -> "ë",
      "iacute" -> "í", "igrave" -> "ì", "icirc" -> "î", "iuml" -> "ï",
      "ntilde" -> "ñ", "oacute" -> "ó", "ograve" -> "ò", "ocirc" -> "ô",
      "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø", "uacute" -> "ú",
      "ugrave" -> "ù", "ucirc" -> "û", "uuml" -> "ü", "yacute" -> "ý",
      "yuml" -> "ÿ")
    val upperAccents = lowerAccents.collect { case (n, v) if n != "yuml" =>
      n.capitalize -> v.toUpperCase
    } + ("Yuml" -> "Ÿ")
    base ++ lowerAccents ++ upperAccents
  }

  /** HTML5 numeric-reference remapping for &#128;–&#159;: browsers read
    * these as windows-1252 (legacy CMS output writes apostrophes as
    * &#146;), not as C1 control characters. Unmapped slots (0x81, 0x8D,
    * 0x8F, 0x90, 0x9D) stay literal — no control bytes enter the corpus.
    */
  private val C1: Array[String] = {
    val cps = Array(
      0x20AC, 0, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0, 0x017D, 0,
      0, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0, 0x017E, 0x0178)
    cps.map(cp => if (cp == 0) null else new String(Character.toChars(cp)))
  }

  /** Static kernel shared by eval and generated code. */
  def decode(input: UTF8String): UTF8String = {
    val s = input.toString
    if (s.indexOf('&') < 0) return input
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        // entities are short; a distant/missing ';' means a bare ampersand
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded: String =
            if (body.startsWith("#x") || body.startsWith("#X")) parseCp(body.substring(2), 16)
            else if (body.startsWith("#")) parseCp(body.substring(1), 10)
            else Named.getOrElse(body, null)
          if (decoded == null) { sb.append(c); i += 1 } // unknown: literal
          else { sb.append(decoded); i = semi + 1 }
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** ASCII digits only — Character.digit also accepts Arabic-Indic and
    * fullwidth digits, which HTML treats as invalid references.
    */
  private def asciiDigit(c: Char, radix: Int): Int = {
    val d =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    if (d >= 0 && d < radix) d else -1
  }

  private def parseCp(digits: String, radix: Int): String = {
    if (digits.isEmpty || digits.length > 7) return null
    var cp = 0
    var i = 0
    while (i < digits.length) {
      val d = asciiDigit(digits.charAt(i), radix)
      if (d < 0) return null
      cp = cp * radix + d
      i += 1
    }
    if (cp >= 0x80 && cp <= 0x9F) C1(cp - 0x80)       // windows-1252 view
    else if (cp == 0xA0) " "                          // same policy as &nbsp;
    else if (cp <= 0 || cp > Character.MAX_CODE_POINT ||
        (cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE)) null
    else new String(Character.toChars(cp))
  }
}

/** graft_html_unescape(s): see [[HtmlEntities]]. */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    HtmlEntities.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expr.HtmlEntities.decode($v)")

  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
  override def prettyName: String = "graft_html_unescape"
}

object HtmlEntityDecode {
  def apply(c: Column): Column =
    GraftColumnBridge.column(HtmlEntityDecode(GraftColumnBridge.expression(c)))
}
