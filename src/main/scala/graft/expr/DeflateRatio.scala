package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a text: compressed_bytes / utf8_bytes.
  *
  * The classic "too compressible" quality signal for corpus curation
  * (boilerplate, keyword stuffing, generated spam sit far below prose;
  * random noise sits near/above 1): natural language lands ~0.3-0.6 at
  * document length, templated/repetitive text collapses toward 0. Used as
  * a cheap document-level filter alongside the Gopher-style heuristics
  * (`TextLib.qualityScore`) — filter e.g. `ratio < 0.15` as
  * machine-generated repetition, `ratio > 0.95` as binary/noise content.
  *
  * Implementation: `java.util.zip.Deflater` (level 6, raw stream — no
  * zlib header so tiny inputs aren't dominated by the constant), reused
  * via ThreadLocal (a Deflater holds native state; per-row allocation
  * would thrash). Empty string → 0.0 by definition (keeps the type a
  * non-nullable-on-non-null-input primitive double, which keeps the
  * expression inside whole-stage codegen without isNull plumbing).
  *
  * Determinism: for a fixed input and level the JDK's bundled zlib is
  * deterministic within a JVM version, and the value is row-local (no
  * partitioning dependence). DuckDB cannot replay DEFLATE, so the gate
  * query (q_deflate_ratio) is GOLDEN-gated at sf0.01 and law-gated in
  * TextExprsSpec (ratios ordered: repetitive < prose < random noise).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.DeflateRatio.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)

  override def prettyName: String = "graft_deflate_ratio"
}

object DeflateRatio {

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true) // raw deflate, no zlib wrapper
  }

  /** Static entry shared by eval and generated code. */
  def compute(t: UTF8String): Double = {
    val bytes = t.getBytes
    if (bytes.length == 0) return 0.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Column-API entry. */
  def apply(text: Column): Column =
    GraftColumnBridge.column(DeflateRatio(GraftColumnBridge.expression(text)))

  /** Alias for call sites that read better with a verb. */
  def deflateRatio(text: Column): Column = apply(text)
}
