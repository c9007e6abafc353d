package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A frozen unigram LM: token → ln(tf/T) for the fitted vocabulary, plus
  * the OOV floor −ln(T). Embedded in the plan by REFERENCE like
  * [[DsirWeights]] — a 50k-entry map rendered through TreeNode argString is
  * the gigabyte-plan failure mode. Keys are UTF8String so probing never
  * converts the corpus' tokens to java Strings per lookup.
  */
final class LmVocab(val lp: java.util.HashMap[UTF8String, java.lang.Double],
                    val floorLp: Double) extends Serializable {
  override def toString: String = s"LmVocab(V=${lp.size})"
}

object LmVocab {
  /** Build from (token, logprob) pairs — the pinned ln(tf/T) math stays at
    * the caller so this class can't drift from the oracle formulation. */
  def apply(pairs: Iterable[(String, Double)], floorLp: Double): LmVocab = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](pairs.size * 2)
    pairs.foreach { case (t, v) => m.put(UTF8String.fromString(t), java.lang.Double.valueOf(v)) }
    new LmVocab(m, floorLp)
  }
}

/** Mean token log-prob of an array<string> token column under a frozen
  * [[LmVocab]] — the pure-map scoring half of the CCNet fit/apply split
  * (round 10): with the LM collected once (vocabSize-bounded), document
  * scoring becomes a stateless projection — no explode, no per-doc
  * aggregation, no joins — and therefore applies to a STREAMING frame at
  * ingest, which [[graft.text.TextLib.unigramScore]]'s explode+groupBy
  * plan does not. Agreement with the batch path is pinned at the 6dp
  * rounding every LM gate uses (the kernel sums in array order, the
  * aggregate in partition order — q_dsir_hashed_law's 1e-9 class).
  *
  * Null elements are skipped defensively (the tokenizer's output is
  * null-free by contract); zero scored tokens ⇒ null (the batch path's
  * "never scored" contract — token-free docs must not land in a bucket).
  */
case class VocabLogProbMean(child: Expression, model: LmVocab)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> tokens, got ${other.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    meanBoxed(input.asInstanceOf[ArrayData])

  /** Shared by eval and generated code (reference-call codegen). */
  def meanBoxed(ts: ArrayData): java.lang.Double = {
    var s = 0.0
    var n = 0
    var i = 0
    val len = ts.numElements()
    while (i < len) {
      if (!ts.isNullAt(i)) {
        val w = model.lp.get(ts.getUTF8String(i))
        s += (if (w == null) model.floorLp else w.doubleValue())
        n += 1
      }
      i += 1
    }
    if (n == 0) null else java.lang.Double.valueOf(s / n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabLogProbMean", this, classOf[VocabLogProbMean].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Double ${ev.value}_r = $ref.meanBoxed($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): VocabLogProbMean =
    copy(child = newChild)

  override def prettyName: String = "graft_vocab_logprob_mean"
}

object VocabLogProbMean {
  def apply(tokens: Column, model: LmVocab): Column =
    GraftColumnBridge.column(
      VocabLogProbMean(GraftColumnBridge.expression(tokens), model))
}
