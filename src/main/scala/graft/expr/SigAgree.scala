package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Count of positions where two long arrays agree — the MinHash signature
  * overlap counter (round 8). Replaces the interpreted
  * `size(filter(zip_with(a, b, _ === _), m => m))` plan shape, which paid
  * one closure dispatch and two array allocations PER PAIR on the
  * candidate-estimation path (the ×100 stress evaluates it 110M times —
  * the minhash est is the hot inner loop of the whole dedup family).
  *
  * Semantics replicate the HOF chain bit-for-bit:
  *  - either input null → null;
  *  - positions are compared up to min(len) — zip_with pads the shorter
  *    side with nulls, `x === y` against null is null, and the filter
  *    drops nulls, so padded positions never count;
  *  - a null ELEMENT on either side at position i likewise never counts.
  * Division by the hash count happens at the call site, exactly as before
  * (`agree / lit(numHashes.toDouble)` — same Int/Double double division).
  */
case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // null inputs → null, regardless of child nullability

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    agree(a, b)
  }

  /** Shared by eval and generated code. */
  def agree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigAgree", this, classOf[SigAgree].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.agree($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sig_agree"
}

object SigAgree {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SigAgree(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
