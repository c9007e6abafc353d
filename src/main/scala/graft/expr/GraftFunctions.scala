package graft.expr

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's native Catalyst expressions — makes them
  * callable from `custom_sql` / `expr()` / pipeline YAML alongside the
  * built-ins (guide: functionRegistry.createOrReplaceTempFunction).
  *
  *   graft_unicode_normalize(text[, form]) → string
  *   graft_word_shingles(text, n)         → array<string>
  *   graft_minhash_sig(shingles, k)       → array<bigint>
  *   graft_exact_percentile(col, p)       → double (aggregate)
  *   graft_dot(a, b)                      → double
  *   graft_l2norm(a)                      → double
  *   graft_text_char_stats(text)          → struct<n_chars, n_punct, n_digit, n_upper, n_nonws, n_tokens>
  *   graft_script_counts(text)            → struct<n_chars, n_ws, n_digit, n_latin, n_han, n_cyrillic, n_arabic, n_other>
  *   graft_word_gram_hashes(text, k)      → array<bigint> (positional k-gram xxhash64)
  *   graft_winnow_mins(hashes, w)         → array<bigint> (winnowing fingerprint set)
  *   graft_deflate_ratio(text)            → double (compressed/raw byte ratio)
  *
  * Two registration paths, same builder table:
  *   - `GraftFunctions.register(spark)` on a live session (temp functions);
  *   - `spark.sql.extensions=graft.expr.GraftExtensions` at session build,
  *     the deployment shape — every session on the cluster gets the
  *     functions without application code.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
  private def doubleLit(e: Expression, what: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.doubleValue()
    case org.apache.spark.sql.catalyst.expressions.Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toDouble
    case other => throw new IllegalArgumentException(s"$what must be a numeric literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  /** Name → builder, shared by both registration paths. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_unicode_normalize" ->
      (exprs => UnicodeNormalize(exprs.head,
        if (exprs.length > 1) strLit(exprs(1), "form") else "NFC")),
    "graft_word_shingles" -> (exprs => WordShingles(exprs.head, intLit(exprs(1), "n"))),
    "graft_minhash_sig" -> (exprs => MinHashSig(exprs.head, intLit(exprs(1), "numHashes"))),
    "graft_exact_percentile" ->
      (exprs => ExactPercentile(exprs.head, doubleLit(exprs(1), "percentage")).toAggregateExpression()),
    "graft_dot" -> (exprs => DotProduct(exprs.head, exprs(1))),
    "graft_l2norm" -> (exprs => L2NormExpr(exprs.head)),
    "graft_text_char_stats" -> (exprs => TextCharStats(exprs.head)),
    "graft_script_counts" -> (exprs => ScriptCounts(exprs.head)),
    "graft_word_gram_hashes" -> (exprs => WordGramHashes(exprs.head, intLit(exprs(1), "k"))),
    "graft_winnow_mins" -> (exprs => WinnowMins(exprs.head, intLit(exprs(1), "w"))),
    "graft_deflate_ratio" -> (exprs => DeflateRatio(exprs.head)),
    "graft_html_unescape" -> (exprs => HtmlEntityDecode(exprs.head)),
    "graft_token_entropy" -> (exprs => TokenEntropy(exprs.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) => reg.createOrReplaceTempFunction(name, b, "scala_udf") }
  }
}

/** `spark.sql.extensions` hook: injects every graft function at session
  * build time (SparkSessionExtensions.injectFunction), so SQL-only users —
  * thrift server, notebooks, `spark-sql` — get the native kernels without
  * touching the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
}
