package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** The eval-suite index a [[MaxCosAgainst]] kernel scans: vectors widened
  * to double (float→double widening is exact, so the arithmetic is
  * bit-identical to reading the float column), plan-side l2 norms, ids as
  * EXTERNAL Scala values in ascending Catalyst order (the caller sorts —
  * ties at equal rounded cosine resolve to the FIRST index, which is then
  * the smallest id, matching `min(struct(-cos, id))`).
  *
  * A plain class, not case-class fields on the expression: a 10k×64 array
  * in a case-class argument would be rendered into every plan string
  * (TreeNode argString), resurrecting the gigabyte-plan problem the
  * session's maxPlanStringLength guards against.
  */
final class EvalIndex(
    val vecs: Array[Array[Double]],
    val norms: Array[Double],
    val ids: Array[Any],
    val idType: DataType) extends Serializable {
  require(vecs.length == norms.length && norms.length == ids.length)
  override def toString: String =
    s"EvalIndex(n=${ids.length}, dim=${if (vecs.nonEmpty) vecs(0).length else 0})"
}

/** Per-row max-cosine against a small embedded eval index — the brute
  * semantic-contamination scorer without the pair space (VERDICT r7 #5
  * follow-through, round 8).
  *
  * The previous formulation was plan-level: crossJoin(broadcast(eval)) →
  * per-pair cosinePreNorm → groupBy(id).min(struct(-round(cos,6), id)).
  * Correct and map-local, but it MATERIALIZED a joined row per (train,
  * eval) pair — 4.9G UnsafeRow concatenations at the ×100 stress — and
  * re-walked the train vector's ArrayData through the expression tree per
  * pair. This kernel extracts the train vector ONCE per row into a
  * primitive array and runs a tight doubles loop over the pre-extracted
  * eval matrix: same arithmetic, none of the per-pair plumbing, and the
  * aggregation disappears entirely (the result is computed in place, so
  * the operator becomes a pure map — zero shuffles, zero joins).
  *
  * Bit-equality with the plan formulation it replaces, by construction:
  *  - dot and norm replicate DotProduct/L2NormExpr exactly (index-order
  *    double accumulation over float-widened elements);
  *  - cos = dot / (tn*en), pairs with denominator == 0.0 skipped and NaN
  *    denominators kept — the `(tn*en) =!= 0.0` pair filter verbatim;
  *  - rounding replicates Spark's Round on DoubleType (scala BigDecimal
  *    HALF_UP at scale 6; NaN/Infinity pass through), computed lazily
  *    behind a 6e-7 guard band so BigDecimal runs only for candidates
  *    that could displace the current best;
  *  - dimension-mismatched eval entries are skipped per row (the
  *    size(tv) === size(ev) pair filter);
  *  - NaN cosines rank below every real cosine and tie among themselves
  *    to the smallest id — `min(struct(-cos, id))` ordering verbatim
  *    (-NaN is NaN, the largest value in Spark's total order);
  *  - a train vector that is null, has a null element (null norm), or
  *    scores no eval entry returns a null struct — exactly the rows the
  *    old groupBy never saw and the left join nulled.
  * One intentional divergence, documented in semanticContamination's
  * scaladoc: scoring is genuinely PER ROW — duplicate or null train ids
  * no longer share/lose results through the groupBy+join on the id.
  *
  * Output: struct(cos: double, id: evalIdType), null when unscoreable.
  * The index serializes once per stage via the task-binary broadcast
  * (same wire cost class as the broadcast relation it replaces).
  */
case class MaxCosAgainst(child: Expression, index: EvalIndex)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("id", index.idType, nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)
  @transient private lazy val catIds: Array[Any] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(index.idType)
    index.ids.map(conv)
  }

  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val t = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null // null element poisons the norm (L2NormExpr parity)
      val x = VecExprs.get(a, i, isFloat)
      t(i) = x
      acc += x * x
      i += 1
    }
    val tn = math.sqrt(acc)
    var bestRounded = Double.NegativeInfinity
    var bestIdx = -1
    var nanIdx = -1
    val vecs = index.vecs
    val norms = index.norms
    var e = 0
    while (e < vecs.length) {
      val ev = vecs(e)
      if (ev.length == n) {                 // size(tv) === size(ev) pair filter
        val denom = tn * norms(e)
        if (denom != 0.0) {                 // (tn*en) =!= 0.0 pair filter (NaN stays)
          var s = 0.0
          var j = 0
          while (j < n) { s += t(j) * ev(j); j += 1 }
          val cos = s / denom
          if (cos != cos) {                 // NaN: ranks last, ties -> first (smallest id)
            if (nanIdx < 0) nanIdx = e
          } else if (bestIdx < 0 || cos > bestRounded - 6e-7) {
            // guard band: rounded(cos) <= cos + 5e-7, so anything deeper
            // below the best cannot displace it — BigDecimal only runs here
            val r = round6(cos)
            if (bestIdx < 0 || r > bestRounded) { bestRounded = r; bestIdx = e }
          }
        }
      }
      e += 1
    }
    if (bestIdx >= 0) {
      val row = new GenericInternalRow(2)
      row.setDouble(0, bestRounded)
      row.update(1, catIds(bestIdx))
      row
    } else if (nanIdx >= 0) {
      val row = new GenericInternalRow(2)
      row.setDouble(0, Double.NaN)
      row.update(1, catIds(nanIdx))
      row
    } else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxCosAgainst", this, classOf[MaxCosAgainst].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.scoreForCodegen($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  /** Codegen entry (nullSafeEval is protected). */
  def scoreForCodegen(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): MaxCosAgainst =
    copy(child = newChild)

  override def prettyName: String = "graft_max_cos_against"
}

object MaxCosAgainst {
  def apply(vec: Column, index: EvalIndex): Column =
    GraftColumnBridge.column(MaxCosAgainst(GraftColumnBridge.expression(vec), index))
}
