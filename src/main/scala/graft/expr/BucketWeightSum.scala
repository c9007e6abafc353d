package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** A fitted per-bucket weight table, embedded in the plan by REFERENCE —
  * never rendered into the expression tree (a 2^20-double array printed
  * through TreeNode argString is the gigabyte-plan failure mode the
  * session's maxPlanStringLength guards against; the EvalIndex lesson).
  */
final class DsirWeights(val buckets: Int, val weights: Array[Double]) extends Serializable {
  require(buckets > 0 && weights.length == buckets,
    s"DsirWeights: need one weight per bucket, got ${weights.length} for $buckets")
  override def toString: String = s"DsirWeights(B=$buckets)"
}

/** Σ over an array<long> of gram hashes of `weights[floorMod(h, B)]` —
  * the DSIR fitted-model scorer (round 9): with the weight table collected
  * once (B-bounded by construction), importance weighting becomes a PURE
  * MAP over the corpus — no joins, no shuffles, and therefore directly
  * applicable to a STREAMING frame at ingest (stateless projection), which
  * the fit-time count aggregations are not. Null elements are skipped
  * defensively (WordGramHashes' output is null-free by contract).
  */
case class BucketWeightSum(child: Expression, model: DsirWeights)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> gram hashes, got ${other.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    sumWeights(input.asInstanceOf[ArrayData])

  /** Shared by eval and generated code (reference-call codegen). */
  def sumWeights(hs: ArrayData): Double = {
    val b = model.buckets
    val w = model.weights
    var s = 0.0
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      if (!hs.isNullAt(i)) s += w(java.lang.Math.floorMod(hs.getLong(i), b.toLong).toInt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketWeightSum", this, classOf[BucketWeightSum].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sumWeights($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketWeightSum =
    copy(child = newChild)

  override def prettyName: String = "graft_bucket_weight_sum"
}

object BucketWeightSum {
  def apply(gramHashes: Column, model: DsirWeights): Column =
    GraftColumnBridge.column(
      BucketWeightSum(GraftColumnBridge.expression(gramHashes), model))
}
