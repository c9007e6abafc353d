package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** All unordered index pairs (i < j) of a long array, as
  * array<struct<id_a, id_b>> — the bucket/group pair expansion kernel
  * (round 8). Replaces the interpreted nested-HOF shape
  * `flatten(transform(ids, (x, i) => transform(slice(ids, i+2, n), y =>
  * struct(...))))`, which allocated a slice array and a closure frame per
  * OUTER element and an interpreted struct build per pair — on the pair
  * paths this runs once per kept bucket and materializes the same
  * k(k-1)/2 output the flatten did, without the per-element plumbing.
  *
  * `normalize = true` emits (least, greatest) and SKIPS equal values —
  * exactly the bucketPairs postlude (`struct(least, greatest)` +
  * `filter(id_a < id_b)`), folded in. `normalize = false` emits pairs in
  * array order, matching the within-group expansion over a sorted
  * distinct member list. Inputs are null-free by construction
  * (collect_list and BoundedMinList both skip nulls); null positions are
  * skipped defensively rather than emitting a null-bearing struct.
  */
case class PairCombos(child: Expression, normalize: Boolean)
    extends UnaryExpression {

  // The kernel reads ids.getLong and emits a long struct — any other element
  // type must fail at analysis time, not with undefined values at runtime
  // (ADVICE r8; bucketPairs is a shared helper with callers in Similarity,
  // SemDedup, Multimodal, tools).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> ids, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    combos(input.asInstanceOf[ArrayData])

  /** Shared by eval and generated code. */
  def combos(ids: ArrayData): GenericArrayData = {
    val n = ids.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.max(0, n * (n - 1) / 2))
    var i = 0
    while (i < n) {
      if (!ids.isNullAt(i)) {
        val x = ids.getLong(i)
        var j = i + 1
        while (j < n) {
          if (!ids.isNullAt(j)) {
            val y = ids.getLong(j)
            if (!normalize) {
              val row = new GenericInternalRow(2)
              row.setLong(0, x); row.setLong(1, y)
              out += row
            } else if (x != y) {
              val row = new GenericInternalRow(2)
              row.setLong(0, math.min(x, y)); row.setLong(1, math.max(x, y))
              out += row
            }
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairCombos", this, classOf[PairCombos].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.combos($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)

  override def prettyName: String = "graft_pair_combos"
}

object PairCombos {
  def apply(ids: Column, normalize: Boolean): Column =
    GraftColumnBridge.column(
      PairCombos(GraftColumnBridge.expression(ids), normalize))
}
