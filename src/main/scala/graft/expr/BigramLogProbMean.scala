package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A frozen Stupid-Backoff bigram LM ([[graft.text.TextLib.bigramScore]]'s
  * model, round 14): the capped unigram vocabulary (token → tf), the capped
  * bigram table ((prev, cur) → (btf, ptf)) as a nested map so compound keys
  * can never collide, and the total token count T. Embedded in the plan by
  * REFERENCE like [[LmVocab]] — same gigabyte-plan-string rationale. Built
  * once at score time from the SAME driver-collected rows the broadcast
  * joins used, so the table cannot drift from the training election.
  */
final class BigramLm(val vocab: java.util.HashMap[UTF8String, java.lang.Long],
                     val bigram: java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Array[Long]]],
                     val totalT: Double) extends Serializable {
  override def toString: String =
    s"BigramLm(V=${vocab.size}, B=${bigram.size} prevs)"
}

object BigramLm {
  def apply(vocabPairs: Seq[(String, Long)],
            bigramRows: Seq[(String, String, Long, Long)],
            totalT: Double): BigramLm = {
    val v = new java.util.HashMap[UTF8String, java.lang.Long](vocabPairs.size * 2)
    vocabPairs.foreach { case (t, tf) =>
      v.put(UTF8String.fromString(t), java.lang.Long.valueOf(tf)) }
    val b = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Array[Long]]]()
    bigramRows.foreach { case (prev, cur, btf, ptf) =>
      val p = UTF8String.fromString(prev)
      var inner = b.get(p)
      if (inner == null) { inner = new java.util.HashMap(); b.put(p, inner) }
      inner.put(UTF8String.fromString(cur), Array(btf, ptf))
    }
    new BigramLm(v, b, totalT)
  }
}

/** Single-pass Stupid-Backoff document score over a text column: tokenize
  * exactly as [[TokenPairs]] (lowercase → split `\s+` → drop empties) and
  * fold the per-position log-prob in ONE in-row loop —
  *   position 1:    ln(tf_cur/T) if cur ∈ vocab else −ln(T)
  *   bigram seen:   ln(btf/tf_prev)
  *   backoff:       ln(0.4·(tf_cur/T)) if cur ∈ vocab else ln(0.4/T)
  * — each the same Math.log/double-division Catalyst evaluated in the
  * replaced explode → two broadcast joins → per-doc avg shape, summed in
  * array order (the [[VocabLogProbMean]] 1e-9-rounding seam vs the old
  * partition-order avg). Returns struct(n, lp): n = token count, lp = mean
  * log-prob (null when n = 0); null text ⇒ null struct. Zero joins, zero
  * shuffles — scoring streams like every frozen gate, and the corpus pays
  * ONE tokenize instead of a pair-explode whose every row crossed two
  * joins and a doc-keyed exchange. BigramParitySpec pins kernel ≡ the
  * retained join-path reference bit-for-bit at the score rounding.
  */
case class BigramLogProbMean(child: Expression, model: BigramLm)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string text, got ${other.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("lp", DoubleType, nullable = true)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def score(input: UTF8String): InternalRow = {
    // TokenPairs' exact token stream
    val toks0 = input.toLowerCase.toString.split("\\s+")
    var s = 0.0
    var n = 0L
    var prev: UTF8String = null
    var prevInner: java.util.HashMap[UTF8String, Array[Long]] = null
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) {
        val cur = UTF8String.fromString(toks0(i))
        val hit = if (prevInner == null) null else prevInner.get(cur)
        val lp =
          if (hit != null) math.log(hit(0).toDouble / hit(1).toDouble)
          else {
            val utf = model.vocab.get(cur)
            if (prev == null) {
              if (utf != null) math.log(utf.doubleValue() / model.totalT)
              else -math.log(model.totalT)
            } else {
              if (utf != null) math.log(0.4 * (utf.doubleValue() / model.totalT))
              else math.log(0.4 / model.totalT)
            }
          }
        s += lp
        n += 1L
        prev = cur
        prevInner = model.bigram.get(cur)
      }
      i += 1
    }
    InternalRow(n, if (n == 0L) null else java.lang.Double.valueOf(s / n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramLogProbMean", this, classOf[BigramLogProbMean].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramLogProbMean =
    copy(child = newChild)

  override def prettyName: String = "graft_bigram_logprob_mean"
}

object BigramLogProbMean {
  def apply(text: Column, model: BigramLm): Column =
    GraftColumnBridge.column(
      BigramLogProbMean(GraftColumnBridge.expression(text), model))
}
