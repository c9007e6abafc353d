package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native first-seen-line kernels (round 12, VERDICT r11 #1): the
  * within-document repeated-line pass of the MassiveText/Gopher cleaning
  * family ([[graft.text.TextLib.dedupLines]] and the line signals of
  * [[graft.text.TextLib.repetitionSignals]]) previously computed "is this
  * line's first occurrence" with the interpreted HOF
  * `filter(lines, (x, i) => array_position(lines, x) === i + 1)` —
  * `array_position` is an O(L) scan with O(lineLen) string compares per
  * element, so O(L² · lineLen) per DOCUMENT. Benign on well-behaved
  * corpora, but a single adversarial 100k-line log/boilerplate page
  * (routine in web crawls) turns into a straggler task at 100 TB. These
  * kernels make the pass one hash-set sweep per document —
  * O(L · lineLen) — in the CharGrams/WordGrams discipline: shared
  * eval/codegen body, reference-call doGenCode, registered in
  * ExprParitySweepSpec, and parity-pinned against the retained HOF
  * formulations (TextExprsSpec) so the semantics stay bit-for-bit.
  *
  * Both kernels split on literal newlines with trailing empties KEPT
  * (Spark `split(t, "\n")` has limit −1) and count string length in CODE
  * POINTS (Spark `length` / DuckDB `len` — a Java-char count would
  * diverge on astral-plane text).
  */

/** Within-document line dedup: every line keeps only its FIRST occurrence,
  * except lines shorter than `minChars` code points, which are always kept
  * (default 1: blank lines survive, so paragraph structure does). Returns
  * `struct(text, n_removed)` — kept lines re-joined with newlines plus the
  * removed-line count; null text → null struct (the caller's null-in /
  * null-out convention).
  *
  * "First occurrence" is identical to `array_position(lines, x) === i+1`:
  * position of the value's first occurrence in the FULL line array equals
  * the current index. Short lines are exempt by VALUE (equal strings have
  * equal length), so one seen-set insert per line reproduces the HOF
  * exactly.
  */
case class LineDedup(child: Expression, minChars: Int) extends UnaryExpression {

  require(minChars >= 0, s"LineDedup: minChars must be >= 0, got $minChars")

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    dedup(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def dedup(input: UTF8String): InternalRow = {
    val lines = input.toString.split("\n", -1)
    val seen = new java.util.HashSet[String](math.max(16, lines.length * 2))
    val kept = new java.lang.StringBuilder(input.numBytes())
    var nKept = 0
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      val isFirst = seen.add(l)
      if (isFirst || l.codePointCount(0, l.length) < minChars) {
        if (nKept > 0) kept.append('\n')
        kept.append(l)
        nKept += 1
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(kept.toString), lines.length - nKept)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lineDedup", this, classOf[LineDedup].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.dedup($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LineDedup =
    copy(child = newChild)

  override def prettyName: String = "graft_line_dedup"
}

object LineDedup {
  def apply(text: Column, minChars: Int): Column =
    GraftColumnBridge.column(LineDedup(GraftColumnBridge.expression(text), minChars))
}

/** Line repetition statistics over the NON-BLANK lines (blank = empty
  * after trimming ASCII spaces, Spark's `trim(l) =!= ""`): the Gopher
  * A1.1 `dup_line_frac` / `dup_line_char_frac` numerators and
  * denominators in one pass — `struct(n_lines, n_dup, chars, dup_chars)`
  * where `n_dup`/`dup_chars` count the NON-first occurrences and `chars`
  * sums code-point lengths of all non-blank lines. Null text → null
  * struct (consumers' `when(n_lines > 0, …)` guards then yield null, the
  * HOF's size(null) behavior).
  */
case class LineRepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_dup", IntegerType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def stats(input: UTF8String): InternalRow = {
    val lines = input.toString.split("\n", -1)
    val seen = new java.util.HashSet[String](math.max(16, lines.length * 2))
    var nLines = 0
    var nDup = 0
    var chars = 0L
    var dupChars = 0L
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      // Spark trim removes ASCII 0x20 only (SPARK-17299); a tab-only line
      // is NOT blank — match that exactly
      var j = 0
      val len = l.length
      var blank = true
      while (blank && j < len) { if (l.charAt(j) != ' ') blank = false; j += 1 }
      if (!blank) {
        val cp = l.codePointCount(0, len)
        nLines += 1
        chars += cp
        if (!seen.add(l)) { nDup += 1; dupChars += cp }
      }
      i += 1
    }
    InternalRow(nLines, nDup, chars, dupChars)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lineRepStats", this, classOf[LineRepStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LineRepStats =
    copy(child = newChild)

  override def prettyName: String = "graft_line_rep_stats"
}

object LineRepStats {
  def apply(text: Column): Column =
    GraftColumnBridge.column(LineRepStats(GraftColumnBridge.expression(text)))
}
