package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document n-gram repetition statistics — the fused kernel
  * behind [[graft.text.TextLib.repetitionSignals]]' Gopher A1.1 n-gram
  * signals (round 14). The signals are row-local by definition (counts of
  * a document's OWN grams), yet the relational formulation paid four
  * corpus-keyed exchanges to compute them: explode both gram relations,
  * groupBy (doc, gram) twice, re-aggregate per doc, join back. This kernel
  * computes the identical quantities in-row — zero shuffles, zero joins —
  * the [[LineRepStats]] precedent for the line half of the same operator.
  *
  * Tokenization and gram construction are EXACTLY [[WordGrams]]' (lowercase
  * → split `\s+` → drop empties → space-joined n-grams), pinned by the
  * RepSignalsParitySpec sweep against the relational reference.
  *
  * Output struct (field semantics = the old perDoc aggregate, including
  * every null):
  *   - top_c:     max count over the document's `topN`-grams; null when the
  *                document has no such gram (fewer than topN tokens).
  *   - top_len:   char length (code points) of the elected top gram — max
  *                count, ties to the UTF8String-smallest gram (the
  *                relational `min(struct(-c, gram))` election); null with
  *                top_c.
  *   - has_dup:   1 when the document has at least one `dupN`-gram, else
  *                null (the old `max(when(tag='dup', 1))`).
  *   - dup_chars: Σ count·len over `dupN`-grams with count ≥ 2; null when
  *                no such gram exists (the old sum-over-empty), even when
  *                has_dup = 1.
  * Null text ⇒ null struct (the explode-drops-the-doc case).
  */
case class GramRepStats(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression {

  require(topN >= 1, s"GramRepStats: topN must be >= 1, got $topN")
  require(dupN >= 1, s"GramRepStats: dupN must be >= 1, got $dupN")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string text, got ${other.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("top_c", LongType, nullable = true),
    StructField("top_len", IntegerType, nullable = true),
    StructField("has_dup", IntegerType, nullable = true),
    StructField("dup_chars", LongType, nullable = true)))
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def stats(input: UTF8String): InternalRow = {
    // WordGrams' exact token stream: lowercase, \s+ split, drop empties
    val toks0 = input.toLowerCase.toString.split("\\s+")
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    val toks = if (nTok == toks0.length) toks0 else {
      val t = new Array[String](nTok); var j = 0; i = 0
      while (i < toks0.length) { if (toks0(i).nonEmpty) { t(j) = toks0(i); j += 1 }; i += 1 }
      t
    }
    def countGrams(n: Int): java.util.HashMap[String, Long] = {
      val m = toks.length
      if (m < n) return null
      val counts = new java.util.HashMap[String, Long](math.max(16, (m - n + 1) * 2))
      val sb = new java.lang.StringBuilder(64)
      var p = 0
      while (p + n <= m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(p + j))
          j += 1
        }
        val g = sb.toString
        counts.put(g, counts.getOrDefault(g, 0L) + 1L)
        p += 1
      }
      counts
    }
    // top election: max count, ties to the UTF8String-SMALLEST gram — the
    // binary (byte-wise) order Spark's struct-min over (−c, gram) used
    var topC: java.lang.Long = null
    var topLen: java.lang.Integer = null
    val topCounts = countGrams(topN)
    if (topCounts != null) {
      var bestC = -1L
      var best: String = null
      var bestU: UTF8String = null
      val it = topCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue()
        if (c > bestC) { bestC = c; best = e.getKey; bestU = null }
        else if (c == bestC) {
          if (bestU == null) bestU = UTF8String.fromString(best)
          val u = UTF8String.fromString(e.getKey)
          if (u.compareTo(bestU) < 0) { best = e.getKey; bestU = u }
        }
      }
      if (best != null) {
        topC = java.lang.Long.valueOf(bestC)
        topLen = java.lang.Integer.valueOf(best.codePointCount(0, best.length))
      }
    }
    var hasDup: java.lang.Integer = null
    var dupChars: java.lang.Long = null
    val dupCounts = if (dupN == topN) topCounts else countGrams(dupN)
    if (dupCounts != null && !dupCounts.isEmpty) {
      hasDup = java.lang.Integer.valueOf(1)
      var s = 0L
      var any = false
      val it = dupCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue()
        if (c >= 2L) {
          val g = e.getKey
          s += c * g.codePointCount(0, g.length)
          any = true
        }
      }
      if (any) dupChars = java.lang.Long.valueOf(s)
    }
    InternalRow(topC, topLen, hasDup, dupChars)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramRepStats", this, classOf[GramRepStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramRepStats =
    copy(child = newChild)

  override def prettyName: String = "graft_gram_rep_stats"
}

object GramRepStats {
  def apply(text: Column, topN: Int, dupN: Int): Column =
    GraftColumnBridge.column(
      GramRepStats(GraftColumnBridge.expression(text), topN, dupN))
}
