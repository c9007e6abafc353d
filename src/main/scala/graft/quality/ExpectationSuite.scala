package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Auto-generated expectation suites — parity with the reference's
  * Great-Expectations integration (utils/data_validator.py:85-126: build an
  * expectation suite FROM a profiled sample, then validate new batches
  * against it). Everything is Catalyst expressions; evaluation is one
  * aggregate pass.
  */
object ExpectationSuite {

  sealed trait Expectation {
    def name: String
    /** Pass-ratio aggregate (1.0 = every row satisfies it). */
    def ratio: Column
  }
  final case class NotNull(column: String) extends Expectation {
    val name = s"${column}_not_null"
    def ratio: Column = avg(when(col(column).isNotNull, 1.0).otherwise(0.0))
  }
  final case class InRange(column: String, lo: Double, hi: Double) extends Expectation {
    val name = s"${column}_in_range"
    def ratio: Column = avg(when(col(column).isNull || col(column).between(lo, hi), 1.0).otherwise(0.0))
  }
  final case class InSet(column: String, values: Seq[String]) extends Expectation {
    val name = s"${column}_in_set"
    def ratio: Column = avg(when(col(column).isNull || col(column).isin(values: _*), 1.0).otherwise(0.0))
  }
  final case class Unique(column: String) extends Expectation {
    val name = s"${column}_unique"
    // nullif guard: an empty batch (or all-null column) is 0/0, an ANSI
    // DIVIDE_BY_ZERO job-killer; null ratio falls back at the read site
    def ratio: Column = countDistinct(col(column)) / nullif(count(col(column)), lit(0L))
  }

  final case class Suite(expectations: Seq[Expectation])
  final case class Outcome(name: String, ratio: Double, passed: Boolean)

  /** Infer a suite from a (sample of a) reference batch
    * (data_validator.py:85-126 heuristics): observed-non-null → NotNull,
    * numeric → widened observed range, low-cardinality string → value set,
    * all-distinct key-ish column → Unique. One aggregate pass + one bounded
    * distinct scan per low-cardinality candidate.
    */
  def infer(df: DataFrame, maxSetSize: Int = 20, rangeSlackPct: Double = 0.1): Suite = {
    val n = df.count()
    val numericCols = df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }
    val stringCols = df.schema.fields.collect { case f if f.dataType == StringType => f.name }
    val aggs: Seq[Column] =
      df.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}__nulls")).toSeq ++
        df.columns.map(c => countDistinct(col(c)).as(s"${c}__nd")).toSeq ++
        numericCols.flatMap(c => Seq(min(col(c)).cast("double").as(s"${c}__mn"),
          max(col(c)).cast("double").as(s"${c}__mx")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    val exps = scala.collection.mutable.ArrayBuffer.empty[Expectation]
    df.columns.foreach { c =>
      if (row.getAs[Long](s"${c}__nulls") == 0L) exps += NotNull(c)
      if (row.getAs[Long](s"${c}__nd") == n && n > 0) exps += Unique(c)
    }
    numericCols.foreach { c =>
      // all-null (or empty-df) columns have null min/max — getAs[Double]
      // would unbox them to 0.0 and emit InRange(≈0, ≈0), failing every
      // later batch with real values; skip the range expectation instead
      val mnIdx = row.fieldIndex(s"${c}__mn"); val mxIdx = row.fieldIndex(s"${c}__mx")
      if (!row.isNullAt(mnIdx) && !row.isNullAt(mxIdx)) {
        val mn = row.getDouble(mnIdx); val mx = row.getDouble(mxIdx)
        val slack = math.max((mx - mn) * rangeSlackPct, 1e-9)
        exps += InRange(c, mn - slack, mx + slack)
      }
    }
    stringCols.foreach { c =>
      if (row.getAs[Long](s"${c}__nd") <= maxSetSize) {
        val values = df.select(col(c)).where(col(c).isNotNull).distinct()
          .collect().map(_.getString(0)).toSeq // bounded by maxSetSize
        exps += InSet(c, values)
      }
    }
    Suite(exps.toSeq)
  }

  /** Validate a batch against a suite: ONE aggregate pass, per-expectation
    * pass ratios and pass/fail at `minRatio`.
    */
  def validate(df: DataFrame, suite: Suite, minRatio: Double = 1.0): Seq[Outcome] = {
    if (suite.expectations.isEmpty) return Nil
    val aggs = suite.expectations.zipWithIndex.map { case (e, i) => e.ratio.as(s"r$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    suite.expectations.zipWithIndex.map { case (e, i) =>
      val r = if (row.isNullAt(i)) 1.0 else row.getDouble(i)
      Outcome(e.name, r, r >= minRatio)
    }
  }

  /** Distribution-shape heuristic (data_profiler.py:191-211): classify from
    * moments — driver logic over one stats row. The mean-vs-median gap is a
    * second skew signal (it catches skew that the third moment understates
    * on truncated/bounded data).
    */
  def distributionType(mean: Double, median: Double, stddev: Double, skewness: Double): String =
    if (stddev == 0) "constant"
    else {
      val medianShift = (mean - median) / stddev // >0 ⇒ right tail pulls the mean
      if (math.abs(skewness) < 0.5 && math.abs(medianShift) < 0.2) "approximately_normal"
      else if (skewness >= 0.5 || medianShift >= 0.2) "right_skewed"
      else "left_skewed"
    }

  /** Data-catalog entry for a table: schema + stats + quality score as one
    * JSON blob (SURVEY §7 step 6 "data catalog metadata").
    */
  def catalogEntry(df: DataFrame, tableName: String): String = {
    val n = df.count()
    val cols = df.schema.fields.map { f =>
      s"""{"name":"${f.name}","type":"${f.dataType.simpleString}","nullable":${f.nullable}}"""
    }.mkString("[", ",", "]")
    val quality = SchemaInference.qualityScore(df).collect()(0).getDouble(0)
    s"""{"table":"$tableName","rows":$n,"columns":$cols,"quality_score":$quality}"""
  }
}
