package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All character-class stats of a text in ONE pass:
  * struct<n_chars, n_punct, n_digit, n_upper, n_nonws, n_tokens>.
  *
  * Field semantics are bit-compatible with the expression forms they
  * replace (q_text_quality is oracle-hash-compared):
  *   n_chars  = length(t)                              (code points)
  *   n_punct  = count of [.,;:!?'"]
  *   n_digit  = count of [0-9]
  *   n_upper  = count of [A-Z]                         (ASCII, as the regex)
  *   n_nonws  = count of chars not matching Java \s    (= Σ word lengths)
  *   n_tokens = count of maximal non-\s runs           (= tokenCountWs)
  *
  * The replaced plan ran 4 separate regexp passes plus an interpreted HOF
  * fold per row; this is one loop over the code points.
  *
  * Whitespace dialect caveat: Java regex `\s` = [ \t\n\x0B\f\r] INCLUDES
  * vertical tab (U+000B); DuckDB's RE2 `\s` excludes it. The engine follows
  * Java (the spec'd tokenizer is "split on Java \s+"), so a document
  * containing \x0B would token-count differently under a DuckDB oracle.
  * The driver corpus contains none; DirtyDataSpec pins the Java-side
  * behavior so the choice is explicit, not accidental.
  */
case class TextCharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextCharStats.schema
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    TextCharStats.compute(input.asInstanceOf[UTF8String])

  /** Codegen = a call to the companion's `compute` on the child's generated
    * value (NOT CodegenFallback, which re-evaluates the whole subtree
    * interpreted from a materialized InternalRow — this keeps the child
    * codegen'd and the projection inside one whole-stage span).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.TextCharStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TextCharStats =
    copy(child = newChild)

  override def prettyName: String = "graft_text_char_stats"
}

/** Unicode-script composition of a text in ONE pass:
  * struct<n_chars, n_ws, n_digit, n_latin, n_han, n_cyrillic, n_arabic,
  * n_other> — the script-mix signal of multilingual corpus curation
  * (mixed-script spam, wrong-language contamination, transliteration
  * artifacts). Classification precedence (pinned for the oracle):
  * whitespace (the Java \s set) → ASCII digit → Unicode Script class →
  * other. Script assignment via Character.UnicodeScript — the same
  * Unicode property RE2's \p{Latin}/\p{Han}/... implement, so a DuckDB
  * oracle counts by regexp-class removal (table-version skew only affects
  * exotic recent codepoints).
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ScriptCounts.schema
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    ScriptCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.ScriptCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_script_counts"
}

object ScriptCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_ws", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_latin", IntegerType, nullable = false),
    StructField("n_han", IntegerType, nullable = false),
    StructField("n_cyrillic", IntegerType, nullable = false),
    StructField("n_arabic", IntegerType, nullable = false),
    StructField("n_other", IntegerType, nullable = false)))

  def compute(input: UTF8String): GenericInternalRow = {
    val s = input.toString
    var nChars = 0; var nWs = 0; var nDigit = 0; var nLatin = 0
    var nHan = 0; var nCyr = 0; var nAr = 0; var nOther = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (TextCharStats.isWs(cp)) nWs += 1 // ONE pinned \s dialect for both kernels
      else if (cp >= '0' && cp <= '9') nDigit += 1
      else {
        Character.UnicodeScript.of(cp) match {
          case Character.UnicodeScript.LATIN    => nLatin += 1
          case Character.UnicodeScript.HAN      => nHan += 1
          case Character.UnicodeScript.CYRILLIC => nCyr += 1
          case Character.UnicodeScript.ARABIC   => nAr += 1
          case _                                => nOther += 1
        }
      }
      i += Character.charCount(cp)
    }
    val row = new GenericInternalRow(8)
    row.setInt(0, nChars); row.setInt(1, nWs); row.setInt(2, nDigit); row.setInt(3, nLatin)
    row.setInt(4, nHan); row.setInt(5, nCyr); row.setInt(6, nAr); row.setInt(7, nOther)
    row
  }

  def apply(text: Column): Column =
    GraftColumnBridge.column(ScriptCounts(GraftColumnBridge.expression(text)))
}

object TextCharStats {
  // Java regex \s = [ \t\n\x0B\f\r] — NOT Character.isWhitespace.
  // Shared with ScriptCounts: the whitespace dialect is oracle-pinned once.
  @inline private[expr] def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  @inline private def isPunct(cp: Int): Boolean =
    cp == '.' || cp == ',' || cp == ';' || cp == ':' || cp == '!' || cp == '?' || cp == '\'' || cp == '"'

  /** One pass over the code points; called from both eval and generated
    * code (static call — annotated for Java interop).
    */
  def compute(input: UTF8String): GenericInternalRow = {
    val s = input.toString
    var nChars = 0; var nPunct = 0; var nDigit = 0; var nUpper = 0; var nNonWs = 0; var nTokens = 0
    var inToken = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (isWs(cp)) inToken = false
      else {
        nNonWs += 1
        if (!inToken) { nTokens += 1; inToken = true }
        if (isPunct(cp)) nPunct += 1
        else if (cp >= '0' && cp <= '9') nDigit += 1
        else if (cp >= 'A' && cp <= 'Z') nUpper += 1
      }
      i += Character.charCount(cp)
    }
    val row = new GenericInternalRow(6)
    row.setInt(0, nChars); row.setInt(1, nPunct); row.setInt(2, nDigit)
    row.setInt(3, nUpper); row.setInt(4, nNonWs); row.setInt(5, nTokens)
    row
  }

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  def apply(text: Column): Column =
    GraftColumnBridge.column(TextCharStats(GraftColumnBridge.expression(text)))
}
