package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positional character n-grams — the multiset gram stream of the
  * language-ID model ([[graft.text.TextLib.langIdFit]]/`langIdApply`).
  * Semantics match the HOF formulation it replaces bit-for-bit (pinned by
  * TextExprsSpec's parity sweep):
  *   - 0 code points → empty array;
  *   - 1..n code points → one whole-text gram (short texts still carry
  *     evidence);
  *   - else one gram per start position, `n` CODE POINTS each (Spark's
  *     `substring`/`length` count code points, as does the DuckDB oracle's
  *     `substr`/`len` — a Java-char window would diverge on astral chars).
  *
  * The HOF chain (`transform(sequence(1, len-n+1), i -> substring(t, i,
  * n))`) is interpreted and pays a closure dispatch + an O(position)
  * UTF8String scan per gram — quadratic in document length; this is one
  * code-point offset pass + O(1) slices per gram.
  */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"CharGrams: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    grams(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def grams(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val len = s.length
    val cpCount = s.codePointCount(0, len)
    if (cpCount == 0) return new GenericArrayData(Array.empty[Any])
    if (cpCount <= n)
      return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    // char offset of each code point (one linear pass), then O(1) slices
    val off = new Array[Int](cpCount + 1)
    var ci = 0
    var cp = 0
    while (ci < len) {
      off(cp) = ci
      ci += Character.charCount(s.codePointAt(ci))
      cp += 1
    }
    off(cp) = len
    val out = new Array[Any](cpCount - n + 1)
    var i = 0
    while (i + n <= cpCount) {
      out(i) = UTF8String.fromString(s.substring(off(i), off(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charGrams", this, classOf[CharGrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.grams($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)

  override def prettyName: String = "graft_char_grams"
}

object CharGrams {
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(CharGrams(GraftColumnBridge.expression(text), n))
}

/** Positional word n-grams as STRINGS (single-space joined) — the
  * repetition-signal gram stream ([[graft.text.TextLib.repetitionSignals]]
  * needs the string: the top-gram election tie-breaks lexicographically
  * and the char fractions measure gram length, so [[WordShingles]]
  * (distinct) and [[WordGramHashes]] (hashes) don't fit. Token stream =
  * lowercase → split `\s+` → drop empties, identical to
  * `filter(split(normalized(t), " "), _ != "")` — the WordGramHashes
  * equivalence note. Fewer than n tokens → empty array (no short-text
  * special: a sub-n document carries no n-gram evidence).
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"WordGrams: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    grams(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def grams(input: UTF8String): GenericArrayData = {
    val toks0 = input.toLowerCase.toString.split("\\s+")
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    val toks = if (nTok == toks0.length) toks0 else {
      val t = new Array[String](nTok); var j = 0; i = 0
      while (i < toks0.length) { if (toks0(i).nonEmpty) { t(j) = toks0(i); j += 1 }; i += 1 }
      t
    }
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i + n <= m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGrams", this, classOf[WordGrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.grams($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)

  override def prettyName: String = "graft_word_grams"
}

object WordGrams {
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordGrams(GraftColumnBridge.expression(text), n))
}

/** Adjacent-token (prev, cur) pairs of the normalized tokenization — the
  * bigram LM's shared pair stream ([[graft.text.TextLib.bigramScore]]):
  * one row per position, position 0 carries a null `prev`. Token stream =
  * lowercase → split `\s+` → drop empties (the [[WordGramHashes]]
  * equivalence). Zero tokens → empty array; the interpreted
  * transform/element_at chain it replaces paid a closure dispatch + a
  * struct allocation per token.
  */
case class TokenPairs(child: Expression) extends UnaryExpression {

  private val structType = StructType(Seq(
    StructField("prev", StringType, nullable = true),
    StructField("cur", StringType, nullable = false)))

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    pairs(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def pairs(input: UTF8String): GenericArrayData = {
    val toks0 = input.toLowerCase.toString.split("\\s+")
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    if (nTok == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok)
    var prev: UTF8String = null
    var j = 0
    i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) {
        val cur = UTF8String.fromString(toks0(i))
        out(j) = org.apache.spark.sql.catalyst.InternalRow(prev, cur)
        prev = cur
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenPairs", this, classOf[TokenPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pairs($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenPairs =
    copy(child = newChild)

  override def prettyName: String = "graft_token_pairs"
}

object TokenPairs {
  def apply(text: Column): Column =
    GraftColumnBridge.column(TokenPairs(GraftColumnBridge.expression(text)))
}
