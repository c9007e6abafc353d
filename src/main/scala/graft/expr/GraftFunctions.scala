package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for graft's native Catalyst expressions — makes them
  * callable from `custom_sql` / `expr()` / pipeline YAML alongside the
  * built-ins (guide: functionRegistry.createOrReplaceTempFunction).
  *
  *   graft_word_shingles(text, n)         → array<string>
  *   graft_minhash_sig(shingles, k)       → array<bigint>
  *   graft_exact_percentile(col, p)       → double (aggregate)
  *   graft_dot(a, b)                      → double
  *   graft_l2norm(a)                      → double
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

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_word_shingles",
      exprs => WordShingles(exprs.head, intLit(exprs(1), "n")), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinHashSig(exprs.head, intLit(exprs(1), "numHashes")), "scala_udf")
    reg.createOrReplaceTempFunction("graft_exact_percentile",
      exprs => ExactPercentile(exprs.head, doubleLit(exprs(1), "percentage")).toAggregateExpression(),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2norm",
      exprs => L2NormExpr(exprs.head), "scala_udf")
  }
}
