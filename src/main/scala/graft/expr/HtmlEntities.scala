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

  /** Named entities decoded (HTML4 core + the punctuation web text uses).
    * nbsp maps to a PLAIN SPACE, not U+00A0 — downstream tokenizers split
    * on ASCII whitespace.
    */
  val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "middot" -> "·", "laquo" -> "«",
    "raquo" -> "»", "deg" -> "°", "plusmn" -> "±",
    "times" -> "×", "divide" -> "÷", "euro" -> "€",
    "pound" -> "£", "yen" -> "¥", "cent" -> "¢",
    "sect" -> "§", "para" -> "¶", "bull" -> "•")

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

  private def parseCp(digits: String, radix: Int): String = {
    if (digits.isEmpty || digits.length > 7) return null
    var cp = 0
    var i = 0
    while (i < digits.length) {
      val d = Character.digit(digits.charAt(i), radix)
      if (d < 0) return null
      cp = cp * radix + d
      i += 1
    }
    if (cp <= 0 || cp > Character.MAX_CODE_POINT ||
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
