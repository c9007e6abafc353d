package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Threshold monitoring + alert synthesis over the QualityMetrics ratios —
  * graft's equivalent of the reference's DataQualityMonitor
  * (utils/quality_monitor.py:133-340): generate default checks from the
  * schema, evaluate every check, classify PASS/WARN/FAIL against the
  * reference's warn rule (warn = 0.8 × threshold,
  * quality_monitor.py:269-275), and synthesize alert rows for WARN/FAIL
  * (check_alerts, :318-339). Alert DELIVERY (email/Slack, :351-433) is
  * deliberately out of scope — transport is product surface, the engine's
  * job ends at the alert relation a router consumes.
  *
  * Scale shape: ALL checks evaluate in (at most) two passes over the data,
  * independent of check count — one aggregate for the IQR fences of every
  * outlier check (skipped when none), broadcast back, then one aggregate
  * computing every metric map-side-combined. The reference loops
  * pandas-side per check (:188-199); here check count only widens the
  * aggregate row, never adds a scan.
  */
object QualityMonitor {

  /** One quality check: metric ∈ completeness|uniqueness|outlier_iqr|
    * timeliness, its column, the PASS threshold, and the metric parameter
    * (IQR fence multiplier k, or timeliness max age in seconds).
    */
  case class Check(metric: String, column: String, threshold: Double, param: Double = 0.0)

  /** Schema-derived default checks (quality_monitor.py:202-241):
    * completeness ≥ 0.95 on every column; uniqueness = 1.0 on id/key/code-
    * named columns (SUBSTRING match, faithfully reproducing the reference's
    * heuristic at :215 — a column named 'width' or 'paid' will get a
    * uniqueness check too; pass an explicit check list to opt out);
    * non-outlier rate ≥ 0.95 (IQR, k=1.5) on numerics; timeliness ≥ 0.8
    * within 24h on timestamps.
    */
  def defaultChecks(df: DataFrame): Seq[Check] = {
    val idish = Seq("id", "key", "code")
    df.schema.fields.toSeq.flatMap { f =>
      val name = f.name
      val completeness = Seq(Check("completeness", name, 0.95))
      val uniqueness =
        if (idish.exists(name.toLowerCase.contains)) Seq(Check("uniqueness", name, 1.0)) else Nil
      val outlier = f.dataType match {
        case _: NumericType => Seq(Check("outlier_iqr", name, 0.95, 1.5))
        case _              => Nil
      }
      val timeliness = f.dataType match {
        case TimestampType | DateType => Seq(Check("timeliness", name, 0.8, 24 * 3600.0))
        case _                        => Nil
      }
      completeness ++ uniqueness ++ outlier ++ timeliness
    }
  }

  /** Evaluate `checks` against `df` → one row per check:
    * (table_name, metric_name, column_name, metric_value [round 4],
    * threshold_value, status). Status uses the RAW value (the reference
    * classifies before rounding): ≥ t PASS, ≥ 0.8t WARN, else FAIL.
    * `asOf` anchors timeliness (pass a literal for reproducible runs; the
    * reference hard-wires wall-clock now, :100-104).
    */
  def runChecks(df: DataFrame, tableName: String, checks: Seq[Check],
                asOf: Column = current_timestamp()): DataFrame = {
    require(checks.nonEmpty, "runChecks: no checks (defaultChecks(df) generates a schema-derived set)")
    val bad = checks.filterNot(c => df.columns.contains(c.column))
    require(bad.isEmpty, s"runChecks: unknown columns in checks: ${bad.map(_.column)}")
    // pass 1 (only if outlier checks exist): IQR fences for every outlier
    // column in ONE aggregate, broadcast back as scalars
    val outlierCols = checks.collect { case Check("outlier_iqr", c, _, _) => c }.distinct
    val base =
      if (outlierCols.isEmpty) df
      else {
        val fenceAggs = outlierCols.flatMap { c => Seq(
          percentile(col(c), lit(0.25)).as(s"__q1_$c"),
          percentile(col(c), lit(0.75)).as(s"__q3_$c")) }
        df.crossJoin(broadcast(df.agg(fenceAggs.head, fenceAggs.tail: _*)))
      }
    // pass 2: every metric as one aggregate expression
    def metricExpr(ck: Check): Column = ck match {
      case Check("completeness", c, _, _) =>
        count(col(c)).cast("double") / nullif(count(lit(1)), lit(0L))
      case Check("uniqueness", c, _, _) =>
        countDistinct(col(c)).cast("double") / nullif(count(lit(1)), lit(0L))
      case Check("outlier_iqr", c, _, k) =>
        // NON-outlier fraction over the NON-NULL readings (pandas-dropna
        // parity, quality_monitor.py:107-123: rate = outliers/len(values)
        // after dropna — dividing by total rows would let a mostly-null
        // column mask its outliers). All-null column → 1.0 like the
        // reference's empty-values early return.
        val iqr = col(s"__q3_$c") - col(s"__q1_$c")
        val lo = col(s"__q1_$c") - lit(k) * iqr
        val hi = col(s"__q3_$c") + lit(k) * iqr
        coalesce(
          lit(1.0) - sum(when(col(c) < lo || col(c) > hi, 1.0).otherwise(0.0))
            / nullif(count(col(c)).cast("double"), lit(0.0)),
          lit(1.0))
      case Check("timeliness", c, _, maxAgeSec) =>
        avg(when(unix_timestamp(asOf) - unix_timestamp(col(c)) <= maxAgeSec, 1.0).otherwise(0.0))
      case other =>
        throw new IllegalArgumentException(
          s"runChecks: unknown metric '${other.metric}' (completeness|uniqueness|outlier_iqr|timeliness)")
    }
    val aggs = checks.zipWithIndex.map { case (ck, i) => metricExpr(ck).as(s"__m_$i") }
    val row = base.agg(aggs.head, aggs.tail: _*)
    // melt the 1×N aggregate row into N check rows (driver-built projection —
    // check count is schema-bounded, never data-bounded)
    val entries = checks.zipWithIndex.map { case (ck, i) =>
      struct(
        lit(ck.metric).as("metric_name"),
        lit(ck.column).as("column_name"),
        col(s"__m_$i").as("value"),
        lit(ck.threshold).as("threshold_value"))
    }
    row.select(explode(array(entries: _*)).as("__e"))
      .select(
        lit(tableName).as("table_name"),
        col("__e.metric_name").as("metric_name"),
        col("__e.column_name").as("column_name"),
        round(col("__e.value"), 4).as("metric_value"),
        col("__e.threshold_value").as("threshold_value"),
        when(col("__e.value") >= col("__e.threshold_value"), "PASS")
          .when(col("__e.value") >= col("__e.threshold_value") * 0.8, "WARN")
          .otherwise("FAIL").as("status"))
  }

  /** WARN/FAIL metric rows → alert rows (quality_monitor.py:318-349):
    * FAIL → CRITICAL, WARN → WARNING; deterministic alert_id
    * `DQ_<table>_<metric>_<column>_<epoch>`; the reference's human-readable
    * message with percent formatting. `atEpoch` replaces the reference's
    * wall-clock id component — explicit, so reruns are reproducible.
    */
  def alerts(metrics: DataFrame, atEpoch: Long): DataFrame =
    metrics.filter(col("status").isin("WARN", "FAIL"))
      .select(
        concat_ws("_", lit("DQ"), col("table_name"), col("metric_name"),
          col("column_name"), lit(atEpoch)).as("alert_id"),
        col("table_name"), col("metric_name"), col("column_name"),
        col("metric_value"), col("threshold_value"), col("status"),
        when(col("status") === "FAIL", "CRITICAL").otherwise("WARNING").as("severity"),
        concat(
          lit("Data quality issue detected in table '"), col("table_name"),
          lit("' for column '"), col("column_name"), lit("'. "),
          initcap(col("metric_name")), lit(" is "),
          format_number(col("metric_value") * 100, 2), lit("% (threshold: "),
          format_number(col("threshold_value") * 100, 2), lit("%). Status: "),
          col("status")).as("message"))

  /** Status rollup over a metrics history (get_quality_summary,
    * quality_monitor.py:478+): per (table, metric) check counts by status
    * and the mean metric value. A grouped aggregate — history-sized input
    * welcome, combines map-side.
    */
  def summary(metricsHistory: DataFrame): DataFrame =
    metricsHistory.groupBy(col("table_name"), col("metric_name"))
      .agg(
        count(lit(1)).as("n_checks"),
        sum(when(col("status") === "PASS", 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("status") === "WARN", 1L).otherwise(0L)).as("n_warn"),
        sum(when(col("status") === "FAIL", 1L).otherwise(0L)).as("n_fail"),
        round(avg(col("metric_value")), 4).as("avg_value"),
        min(col("metric_value")).as("min_value"))
}
