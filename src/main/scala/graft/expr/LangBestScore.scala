package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K frozen unigram LMs fused into ONE probe table: gram → the K-vector of
  * per-language log-probs (a language missing the gram holds its own OOV
  * floor in the vector), plus the K floors for grams no language knows.
  * Embedded in the plan by REFERENCE like [[LmVocab]] — same
  * gigabyte-plan-string rationale. Built once at apply time from the
  * fitted per-language [[LmVocab]]s, so the table can never drift from
  * the models it fuses.
  */
final class MultiLmVocab(val langs: Array[String],
                         val lp: java.util.HashMap[UTF8String, Array[Double]],
                         val floors: Array[Double]) extends Serializable {
  require(langs.length == floors.length,
    s"MultiLmVocab: ${langs.length} langs vs ${floors.length} floors")
  override def toString: String = s"MultiLmVocab(K=${langs.length}, V=${lp.size})"
}

object MultiLmVocab {
  /** Fuse fitted per-language models (parallel seqs, langs pre-sorted by
    * the caller — langIdApply's election order). */
  def apply(langs: Seq[String], lms: Seq[LmVocab]): MultiLmVocab = {
    require(langs.length == lms.length, "MultiLmVocab: langs/models length mismatch")
    val k = langs.length
    val floors = lms.map(_.floorLp).toArray
    val keys = new java.util.HashSet[UTF8String]()
    lms.foreach(lm => keys.addAll(lm.lp.keySet()))
    val m = new java.util.HashMap[UTF8String, Array[Double]](keys.size * 2)
    keys.forEach { g =>
      val v = new Array[Double](k)
      var i = 0
      while (i < k) {
        val w = lms(i).lp.get(g)
        v(i) = if (w == null) floors(i) else w.doubleValue()
        i += 1
      }
      m.put(g, v)
    }
    new MultiLmVocab(langs.toArray, m, floors)
  }
}

/** Single-pass language election over an array<string> gram column: for
  * each language the mean gram log-prob under its frozen [[LmVocab]]
  * (summed in array order — bit-identical to K independent
  * [[VocabLogProbMean]] passes), each mean biased by +1e-9 and rounded
  * HALF_UP to `scale` decimals exactly as Spark's `round` does, then the
  * argmax as struct(score, lang) with equal rounded scores electing the
  * lexicographically LAST language — the pinned
  * `greatest(struct(score, lang))` policy of langIdApply, which this
  * kernel replaces wholesale.
  *
  * Why one kernel instead of K: the fold-of-K-columns formulation scans
  * the gram array K times and probes K hash tables per gram; this is one
  * scan and ONE probe per gram (the fused [[MultiLmVocab]] vector carries
  * all K log-probs), so apply cost stops scaling with the language count.
  * LangIdParitySpec pins the fused path against the fold reference —
  * including the rounding and tie edges — on randomized corpora.
  *
  * Zero scored grams ⇒ null struct (the caller maps that to `und` + null
  * score, observably identical to the fold path's all-null-score case,
  * where greatest compares the null score fields and the election's
  * winning struct carries a null score either way).
  */
case class LangBestScore(child: Expression, model: MultiLmVocab, scale: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> tokens, got ${other.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = true),
    StructField("l", StringType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    bestRow(input.asInstanceOf[ArrayData])

  /** Spark's Round(double, scale) semantics, replicated exactly: NaN and
    * infinities pass through; otherwise decimal HALF_UP via the same
    * `BigDecimal.decimal(double)` (Double.toString-based) construction
    * Spark's RoundBase uses. Pinned against the real `round()` in
    * LangIdParitySpec's boundary sweep. */
  private def roundLikeSpark(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else scala.math.BigDecimal(v)
      .setScale(scale, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark's nan-safe double comparison (NaN == NaN, NaN greatest,
    * -0.0 == 0.0) — the ordering `greatest(struct(...))` applies to the
    * score field. */
  private def cmp(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x); val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1 else -1
  }

  /** Shared by eval and generated code (reference-call codegen). */
  def bestRow(ts: ArrayData): InternalRow = {
    val k = model.langs.length
    val sums = new Array[Double](k)
    var n = 0
    var i = 0
    val len = ts.numElements()
    while (i < len) {
      if (!ts.isNullAt(i)) {
        val v = model.lp.get(ts.getUTF8String(i))
        val row = if (v == null) model.floors else v
        var j = 0
        while (j < k) { sums(j) += row(j); j += 1 }
        n += 1
      }
      i += 1
    }
    if (n == 0) null
    else {
      // langs are ascending; >= keeps the LAST equal-scored language —
      // the greatest(struct(s, l)) tie policy
      var best = 0
      var bestS = roundLikeSpark(sums(0) / n + 1e-9)
      var j = 1
      while (j < k) {
        val s = roundLikeSpark(sums(j) / n + 1e-9)
        if (cmp(s, bestS) >= 0) { best = j; bestS = s }
        j += 1
      }
      new GenericInternalRow(Array[Any](bestS, UTF8String.fromString(model.langs(best))))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langBestScore", this, classOf[LangBestScore].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""InternalRow ${ev.value}_r = $ref.bestRow($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): LangBestScore =
    copy(child = newChild)

  override def prettyName: String = "graft_lang_best_score"
}

object LangBestScore {
  def apply(tokens: Column, model: MultiLmVocab, scale: Int): Column =
    GraftColumnBridge.column(
      LangBestScore(GraftColumnBridge.expression(tokens), model, scale))
}
