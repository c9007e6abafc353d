package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rebuild a token stream with the given 1-BASED positions removed, joined
  * by single spaces — the in-row rewrite half of the ExactSubstr /
  * contamination span cuts (round 14). The relational formulation this
  * replaces shuffled the ENTIRE corpus token stream through a (doc, pos)
  * join and re-assembled every document with a collect_list sort; the
  * removed-position lists are duplication-bound (tiny next to the corpus),
  * so the rewrite belongs in the row: positions ride a per-doc array and
  * one O(n + m log m) pass drops them (`m` = positions, sorted locally).
  *
  * Contract pinned against the old reassembly: output = surviving tokens
  * joined by " " (all-removed ⇒ ""), positions outside [1, n] are ignored
  * (never produced by the callers), duplicate positions count once (the
  * callers' position sets are distinct by construction). Null tokens array
  * OR null positions array ⇒ null (callers route no-token / non-
  * participating docs around the kernel).
  */
case class DropTokenPositions(left: Expression, right: Expression,
    sep: String = " ") extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string> tokens, array<bigint> positions), " +
            s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    rebuild(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  /** Shared by eval and generated code (reference-call codegen). */
  def rebuild(toks: ArrayData, positions: ArrayData): UTF8String = {
    val n = toks.numElements()
    val m = positions.numElements()
    val drop = new Array[Long](m)
    var i = 0
    while (i < m) { drop(i) = if (positions.isNullAt(i)) 0L else positions.getLong(i); i += 1 }
    java.util.Arrays.sort(drop)
    val sb = new java.lang.StringBuilder(64)
    var d = 0
    var first = true
    i = 0
    while (i < n) {
      val pos = (i + 1).toLong
      while (d < m && drop(d) < pos) d += 1
      val dropped = d < m && drop(d) == pos
      if (!dropped && !toks.isNullAt(i)) {
        if (!first) sb.append(sep)
        sb.append(toks.getUTF8String(i).toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dropTokenPositions", this, classOf[DropTokenPositions].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.rebuild($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DropTokenPositions =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_drop_token_positions"
}

object DropTokenPositions {
  def apply(tokens: Column, positions: Column): Column =
    GraftColumnBridge.column(DropTokenPositions(
      GraftColumnBridge.expression(tokens), GraftColumnBridge.expression(positions)))
  def apply(tokens: Column, positions: Column, sep: String): Column =
    GraftColumnBridge.column(DropTokenPositions(
      GraftColumnBridge.expression(tokens), GraftColumnBridge.expression(positions), sep))
}
