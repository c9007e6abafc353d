package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality metrics — graft's equivalent of utils/quality_monitor.py
  * (49-130): every metric is a ratio aggregate, all computable in one pass,
  * with driver-side threshold classification (quality_monitor.py:133-260).
  */
object QualityMetrics {

  /** completeness: non-null ratio (quality_monitor.py:49-54). Null (not a
    * DIVIDE_BY_ZERO crash — ANSI is on) for an empty input: the monitoring
    * job must be able to REPORT "no data arrived".
    */
  def completeness(c: String): Column =
    (count(col(c)) / nullif(count(lit(1)), lit(0L))).as(s"${c}_completeness")

  /** uniqueness: distinct/total (quality_monitor.py:56-59). */
  def uniqueness(c: String): Column =
    (countDistinct(col(c)) / nullif(count(lit(1)), lit(0L))).as(s"${c}_uniqueness")

  /** validity: fraction of rows satisfying a predicate expression
    * (quality_monitor.py:61-69 — reference uses a Python UDF; graft takes a
    * Catalyst expression, codegen'd).
    */
  def validity(c: String, predicate: String): Column =
    avg(when(expr(predicate), 1.0).otherwise(0.0)).as(s"${c}_validity")

  /** consistency `range_check` (quality_monitor.py:80-91). */
  def rangeCheck(c: String, lo: Double, hi: Double): Column =
    avg(when(col(c).between(lo, hi), 1.0).otherwise(0.0)).as(s"${c}_in_range")

  /** consistency `sum_equals`: |a+b−c| within tolerance (quality_monitor.py:71-79). */
  def sumEquals(a: String, b: String, c: String, tol: Double = 1e-6): Column =
    avg(when(abs(col(a) + col(b) - col(c)) <= tol, 1.0).otherwise(0.0)).as("sum_consistency")

  /** timeliness: fraction of rows within `maxAgeSeconds` of a reference
    * instant (quality_monitor.py:93-104). The reference uses
    * current_timestamp; tests pass a fixed instant for determinism.
    */
  def timeliness(ts: String, maxAgeSeconds: Long, asOf: Column = current_timestamp()): Column =
    avg(when(unix_timestamp(asOf) - unix_timestamp(col(ts)) <= maxAgeSeconds, 1.0).otherwise(0.0))
      .as(s"${ts}_timeliness")

  /** One-pass quality report over a set of metric columns. */
  def report(df: DataFrame, metrics: Seq[Column]): DataFrame =
    df.agg(metrics.head, metrics.tail: _*)

  /** Outlier rate via z-score (quality_monitor.py:117-130): needs two passes
    * folded into one plan — stats broadcast back, then the ratio aggregate.
    */
  def outlierRateZscore(df: DataFrame, c: String, threshold: Double = 3.0): DataFrame = {
    val stats = df.agg(avg(col(c)).as("__mu"), stddev(col(c)).as("__sd"))
    // nullif: a constant column has sd = 0; the z-score is then undefined →
    // no outliers (rate 0), not an ANSI DIVIDE_BY_ZERO crash
    df.crossJoin(broadcast(stats))
      .agg(avg(when(abs((col(c) - col("__mu")) / nullif(col("__sd"), lit(0.0))) > threshold, 1.0)
        .otherwise(0.0)).as(s"${c}_outlier_rate"))
  }

  /** Outlier rate via IQR fences (quality_monitor.py:106-116). */
  def outlierRateIqr(df: DataFrame, c: String, k: Double = 1.5): DataFrame = {
    val stats = df.agg(
      percentile(col(c), lit(0.25)).as("__q1"),
      percentile(col(c), lit(0.75)).as("__q3"))
    df.crossJoin(broadcast(stats))
      .withColumn("__iqr", col("__q3") - col("__q1"))
      .agg(avg(when(col(c) < col("__q1") - lit(k) * col("__iqr") ||
                    col(c) > col("__q3") + lit(k) * col("__iqr"), 1.0).otherwise(0.0))
        .as(s"${c}_outlier_rate"))
  }

  /** Threshold → PASS/WARN/FAIL classification (quality_monitor.py:133-176).
    * Driver-side over a bounded metrics row, like the reference.
    */
  def classify(value: Double, warnBelow: Double, failBelow: Double): String =
    if (value < failBelow) "FAIL" else if (value < warnBelow) "WARN" else "PASS"
}
