package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document unigram (Shannon) entropy over a token array —
  * Σ −(c/T)·ln(c/T) over the document's own token frequency table, the
  * RedPajama-V2 `rps_doc_unigram_entropy` signal (a low-entropy document
  * is keyword-stuffed / boilerplate even when its dupe-gram fractions
  * look clean; the repetition family's complement).
  *
  * One hash-map pass + one entropy loop per document (the
  * CharGrams/LineDedup kernel discipline: shared eval/codegen body,
  * reference-call doGenCode, registered in ExprParitySweepSpec) — the
  * explode → groupBy(doc, token) → agg formulation shuffles the whole
  * token stream to compute a ROW-LOCAL quantity, and a HOF formulation
  * would be O(tokens²) interpreted (the repo's standing gotcha).
  *
  * Null conventions: null array → null; null ELEMENTS and empty-string
  * tokens are skipped (the repo's `filter(split(normalized(t), " "),
  * _ =!= "")` token convention folded into the kernel — the caller passes
  * the bare split); zero surviving tokens → null (entropy of nothing is
  * undefined, and null fails threshold gates like every other degenerate
  * ratio here). Term order inside the sum follows the map's iteration
  * order — consumers round at the edge (roundf convention), which absorbs
  * cross-engine summation-order ulps.
  */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    entropy(input.asInstanceOf[ArrayData])

  /** Shared by eval and generated code (reference-call codegen). Returns
    * null (boxed) when no non-empty token exists.
    */
  def entropy(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](math.max(16, n * 2))
    var total = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          // copy: an unsafe-backed UTF8String may alias a reused buffer
          val key = t.clone()
          counts.merge(key, 1, (a, b) => a + b)
          total += 1
        }
      }
      i += 1
    }
    if (total == 0L) return null
    var e = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / total
      e -= p * math.log(p)
    }
    e
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenEntropy", this, classOf[TokenEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Double r = $ref.entropy($c);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)

  override def prettyName: String = "graft_token_entropy"
}

object TokenEntropy {
  def apply(tokens: Column): Column =
    GraftColumnBridge.column(TokenEntropy(GraftColumnBridge.expression(tokens)))
}
