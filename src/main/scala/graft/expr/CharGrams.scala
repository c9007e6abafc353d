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
