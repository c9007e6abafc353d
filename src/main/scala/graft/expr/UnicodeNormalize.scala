package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression — the
  * standard first step of corpus cleaning (one logical character can arrive
  * as either a precomposed code point or a base+combining sequence, and
  * every downstream hash/dedup/tokenize op sees them as different bytes
  * until normalized). Spark has no built-in for this; `java.text.Normalizer`
  * implements the Unicode standard forms, matching DuckDB's
  * `nfc_normalize` for the NFC case (oracle-checked).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // validate at construction, not first evaluation: the SQL-function path
  // builds this case class directly (bypassing the companion apply), and a
  // bad form string must fail analysis with a clear message, not throw from
  // every executor task at runtime
  require(UnicodeNormalize.Forms.contains(form),
    s"Unicode form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $form")

  override def dataType: DataType = StringType

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def normalize(input: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(input.toString, f))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalize", this, classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_unicode_normalize"
}

object UnicodeNormalize {
  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")
  def apply(text: Column, form: String): Column = {
    // form validation lives in the case-class constructor (both entry paths)
    GraftColumnBridge.column(UnicodeNormalize(GraftColumnBridge.expression(text), form))
  }
}
