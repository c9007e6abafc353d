package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TimeSeriesLib
import QueryUtil._

/** Oracle-backed queries for the time-series library (§2.J) and the
  * batch-equivalent semantics of the streaming windows (§2.L). Timestamps are
  * emitted as formatted strings (never raw) so parquet µs/ns width can't skew
  * the compare.
  */
object QueriesTime {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, Q] = Map(
    "q_ts_resample" -> ((s, dir) =>
      TimeSeriesLib.resample(t(s, dir, "events"), "ts", "1 hour",
          Seq("value" -> "count", "value" -> "sum"))
        .select(date_format(col("period"), fmt).as("period_str"),
          col("value_count").as("n"), round(col("value_sum"), 3).as("total"))
        .orderBy("period_str")),

    "q_ts_grid_ffill" -> ((s, dir) =>
      TimeSeriesLib.resampleWithGrid(t(s, dir, "events"), "ts", "1 hour",
          Seq("value" -> "avg"), keys = Seq("event_type"), fillMethod = "ffill")
        .select(col("event_type"), date_format(col("period"), fmt).as("period_str"),
          roundf(col("value_avg"), 4).as("value_avg"))
        .orderBy("event_type", "period_str")),

    "q_ts_rolling" -> ((s, dir) =>
      TimeSeriesLib.rollingStats(t(s, dir, "events"), "value", 5,
          Seq("mean", "min", "max"), orderCol = "event_id", partitionBy = Seq("user_id"))
        .select(col("event_id"), col("user_id"),
          roundf(col("value_rolling_mean"), 4).as("r_mean"),
          col("value_rolling_min").as("r_min"), col("value_rolling_max").as("r_max"))
        .orderBy("event_id")),

    "q_ts_rolling_time" -> ((s, dir) =>
      TimeSeriesLib.rollingStatsTime(t(s, dir, "events"), "value", 3600,
          Seq("mean", "count"), tsCol = "ts", partitionBy = Seq("user_id"))
        .select(col("event_id"),
          roundf(col("value_tw_mean"), 4).as("tw_mean"), col("value_tw_count").as("tw_n"))
        .orderBy("event_id")),

    "q_ts_lags_diffs" -> ((s, dir) => {
      val l = TimeSeriesLib.calculateLags(t(s, dir, "events"), "value", Seq(1, 3),
        orderCol = "event_id", partitionBy = Seq("user_id"))
      TimeSeriesLib.calculateDifferences(l, "value", Seq(1), orderCol = "event_id",
          partitionBy = Seq("user_id"))
        .select(col("event_id"), col("value_lag_1"), col("value_lag_3"),
          round(col("value_diff_1"), 4).as("value_diff_1"))
        .orderBy("event_id")
    }),

    "q_ts_outlier_zscore" -> ((s, dir) =>
      TimeSeriesLib.flagOutliers(t(s, dir, "events"), "value", "zscore", 2.5,
          partitionBy = Seq("event_type"))
        .select(col("event_id"), col("value_outlier"))
        .orderBy("event_id")),

    "q_ts_outlier_iqr" -> ((s, dir) =>
      TimeSeriesLib.flagOutliers(t(s, dir, "events"), "value", "iqr",
          partitionBy = Seq("event_type"))
        .select(col("event_id"), col("value_outlier"))
        .orderBy("event_id")),

    "q_ts_interpolate" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
      TimeSeriesLib.fillMissing(e, "v", "interpolate", orderCol = "event_id",
          partitionBy = Seq("user_id"))
        .select(col("event_id"), roundf(col("v"), 6).as("v_interp"))
        .orderBy("event_id")
    }),

    "q_ts_time_features" -> ((s, dir) =>
      TimeSeriesLib.timeFeatures(t(s, dir, "events"), "ts")
        .select(col("event_id"), col("ts_year"), col("ts_month"), col("ts_day"),
          col("ts_hour"), col("ts_dayofweek"), col("ts_quarter"), col("ts_weekofyear"),
          col("ts_dayofyear"), col("ts_is_weekend"), col("ts_day_name"))
        .orderBy("event_id")),

    "q_ts_changepoints" -> ((s, dir) => {
      val hourly = TimeSeriesLib.resample(t(s, dir, "events"), "ts", "1 hour",
        Seq("value" -> "sum"), keys = Seq("event_type"))
      TimeSeriesLib.detectChangepoints(hourly, "value_sum", 6, orderCol = "period",
          partitionBy = Seq("event_type"))
        .select(col("event_type"), date_format(col("period"), fmt).as("period_str"),
          col("value_sum_changepoint").as("is_cp"))
        .orderBy("event_type", "period_str")
    }),

    "q_ts_ewm" -> ((s, dir) =>
      // oracle = a DuckDB RECURSIVE CTE running the identical per-key
      // num/den recurrence (the closed-form (1-α)^-t cumsum rewrite would
      // overflow doubles on long series — the recurrence doesn't); hand
      // parity vs pandas stays pinned in TimeSeriesSpec
      TimeSeriesLib.smoothEwm(
          t(s, dir, "events"), "value", 0.3, orderCol = "event_id", partitionBy = Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("value_ewm"), 6).as("value_ewm"))
        .orderBy("event_id")),

    "q_ts_savgol" -> ((s, dir) =>
      TimeSeriesLib.smoothSavgol(t(s, dir, "events"), "value", 7, 2,
          orderCol = "event_id", partitionBy = Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("value"),
          roundf(col("value_savgol"), 6).as("value_savgol"))
        .orderBy("event_id")),

    "q_ts_seasonal" -> ((s, dir) => {
      val hourly = TimeSeriesLib.resample(t(s, dir, "events"), "ts", "1 hour",
        Seq("value" -> "sum"), keys = Seq("event_type"))
      TimeSeriesLib.seasonalDecompose(hourly, "value_sum", 24, orderCol = "period",
          partitionBy = Seq("event_type"))
        .select(col("event_type"), date_format(col("period"), fmt).as("period_str"),
          roundf(col("trend"), 4).as("trend"),
          roundf(col("seasonal"), 4).as("seasonal"),
          roundf(col("resid"), 4).as("resid"))
        .orderBy("event_type", "period_str")
    }),

    "q_ts_seasonal_mult" -> ((s, dir) => {
      val hourly = TimeSeriesLib.resample(t(s, dir, "events"), "ts", "1 hour",
        Seq("value" -> "sum"), keys = Seq("event_type"))
      TimeSeriesLib.seasonalDecompose(hourly, "value_sum", 24, orderCol = "period",
          partitionBy = Seq("event_type"), model = "multiplicative")
        .select(col("event_type"), date_format(col("period"), fmt).as("period_str"),
          // ratios, not levels: 6 digits keeps the comparison meaningful
          roundf(col("trend"), 4).as("trend"),
          roundf(col("seasonal"), 6).as("seasonal"),
          roundf(col("resid"), 6).as("resid"))
        .orderBy("event_type", "period_str")
    }),

    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purch_value"))
      graft.ops.Joins.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purch_value"), toleranceSeconds = 86400L)
        .select(col("event_id"), col("purch_value"),
          date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("asof_ts"))
        .orderBy("event_id")
    }),

    "q_asof_forward" -> ((s, dir) => {
      // pandas merge_asof(direction='forward') parity: for each click, the
      // NEXT purchase within a day
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purch_value"))
      graft.ops.Joins.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("purch_value"), toleranceSeconds = 86400L, direction = "forward")
        .select(col("event_id"), col("purch_value"),
          date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("asof_ts"))
        .orderBy("event_id")
    }),

    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"), col("event_id").as("signup_id"))
      graft.ops.Joins.rangeJoinBucketed(errors, signups, Seq("user_id"),
          "ts", "start_ts", "end_ts", bucketSeconds = 3600L)
        .groupBy("signup_id")
        .agg(count(lit(1)).as("n_errors"), round(sum(col("value")), 3).as("err_value"))
        .orderBy("signup_id")
    }),

    "q_sessionize" -> ((s, dir) =>
      TimeSeriesLib.sessionStats(t(s, dir, "events"), "ts", 1800L, Seq("user_id"),
          Seq("value" -> "sum"))
        .select(col("user_id"), col("session_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          col("n_events"), round(col("duration_seconds"), 3).as("duration_s"),
          round(col("value_sum"), 3).as("total"))
        .orderBy("user_id", "session_start")),

    "q_scd2_apply" -> ((s, dir) => {
      // two-batch incremental apply must equal the single-pass chain the
      // oracle computes — this IS the SCD2 merge law (close + no-op-first +
      // consecutive-dedup across the batch boundary)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("state"), col("ts"), col("event_id"))
      val Array(cut) = ev.agg(
        timestamp_micros(((unix_micros(min(col("ts"))) + unix_micros(max(col("ts")))) / 2)
          .cast("long"))).collect().map(_.getAs[java.sql.Timestamp](0))
      val batch1 = ev.filter(col("ts") < lit(cut))
      val batch2 = ev.filter(col("ts") >= lit(cut))
      val empty = graft.ops.Scd.scd2Init(ev.limit(0), Seq("user_id"), Seq("state"), "ts")
      val dim1 = graft.ops.Scd.scd2Apply(empty, batch1, Seq("user_id"), Seq("state"), "ts",
        orderBy = Seq("event_id"))
      graft.ops.Scd.scd2Apply(dim1, batch2, Seq("user_id"), Seq("state"), "ts",
          orderBy = Seq("event_id"))
        .select(col("user_id"), col("state"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
          col("is_current"))
        .orderBy("user_id", "valid_from", "state")
    }),

    "q_stream_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("total"))
        .select(date_format(col("w.start"), fmt).as("w_start"), col("event_type"), col("n"), col("total"))
        .orderBy("w_start", "event_type")),

    "q_stream_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("w.start"), fmt).as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type")),

    "q_stream_session" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 3).as("total"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          col("n_events"), col("total"))
        .orderBy("user_id", "session_start")),

    "q_ts_outlier_mad" -> ((s, dir) =>
      TimeSeriesLib.flagOutliers(t(s, dir, "events"), "value", "mad", 3.5,
          partitionBy = Seq("event_type"))
        .select(col("event_id"), col("value_outlier"))
        .orderBy("event_id")),

    "q_cdc_apply" -> ((s, dir) => {
      // synthetic Debezium-shaped log over the customer snapshot: deletes
      // (%10==0), two competing updates per key (%10==1, seq 2 wins), a
      // same-seq U+D tie (%10==2, delete wins via the explicit rank), and
      // brand-new inserts (%10==3, key+1000000)
      val c = t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      def log(pred: org.apache.spark.sql.Column, keyShift: Long, delta: Double,
              op: String, seq: Long) =
        c.filter(pred).select(
          (col("c_custkey") + keyShift).as("c_custkey"), col("c_name"),
          (col("c_acctbal") + delta).as("c_acctbal"),
          lit(op).as("op"), lit(seq).as("seq"))
      val changes =
        log(col("c_custkey") % 10 === 0, 0, 0.0, "D", 5L)
          .unionByName(log(col("c_custkey") % 10 === 1, 0, 100.0, "U", 1L))
          .unionByName(log(col("c_custkey") % 10 === 1, 0, 200.0, "U", 2L))
          .unionByName(log(col("c_custkey") % 10 === 2, 0, 300.0, "U", 7L))
          .unionByName(log(col("c_custkey") % 10 === 2, 0, 0.0, "D", 7L))
          .unionByName(log(col("c_custkey") % 10 === 3, 1000000L, 0.0, "I", 1L))
      graft.ops.Scd.applyCdc(c, changes, Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"), roundf(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy("c_custkey")
    }),

    "q_rolling_corr" -> ((s, dir) =>
      TimeSeriesLib.rollingCorr(t(s, dir, "events"), "value", "event_id", 20,
          orderCol = "event_id", partitionBy = Seq("user_id"))
        .select(col("event_id"), roundf(col("value_event_id_rolling_corr"), 4).as("rc"))
        .orderBy("event_id")),

    "q_resample_p95" -> ((s, dir) =>
      // the pXX aggExpr path through resample: daily p95/p50 latency-style
      // rollup per event type (exact percentile, quantile_cont parity)
      TimeSeriesLib.resample(t(s, dir, "events"), "ts", "1 day",
          Seq(("value", "p95"), ("value", "p50"), ("value", "count")),
          keys = Seq("event_type"))
        .select(date_format(col("period"), "yyyy-MM-dd").as("day"), col("event_type"),
          roundf(col("value_p95"), 4).as("p95"),
          roundf(col("value_p50"), 4).as("p50"),
          col("value_count").as("n"))
        .orderBy("day", "event_type")),

    "q_twap" -> ((s, dir) =>
      TimeSeriesLib.timeWeightedAvg(t(s, dir, "events"), "value", "ts",
          partitionBy = Seq("user_id"), orderCols = Seq("ts", "event_id"))
        .select(col("user_id"), roundf(col("twap"), 4).as("twap"),
          roundf(col("total_seconds"), 1).as("total_seconds"), col("n_readings"))
        .orderBy("user_id")),

    "q_volume_anomalies" -> ((s, dir) =>
      TimeSeriesLib.volumeAnomalies(t(s, dir, "events"), "ts", "day",
          groupCols = Seq("event_type"))
        .select(col("event_type"), date_format(col("period"), "yyyy-MM-dd").as("period"),
          col("n"), col("volume_outlier"))
        .orderBy("event_type", "period")),

    "q_interarrival_scalable" -> ((s, dir) =>
      // the de-skewed sibling: segmented-pair gap extraction + mergeable
      // approx median (exact at gate scale — every entity's gap count is
      // far under the sketch accuracy, so the sketch retains all samples
      // and returns the discrete median element)
      TimeSeriesLib.interArrivalStatsScalable(t(s, dir, "events"), "ts",
          partitionBy = Seq("user_id"), orderCols = Seq("ts", "event_id"))
        .select(col("user_id"), col("n_gaps"),
          roundf(col("mean_gap_s"), 4).as("mean_gap_s"),
          col("median_gap_s"),
          col("max_gap_s"))
        .orderBy("user_id")),

    "q_interarrival" -> ((s, dir) =>
      TimeSeriesLib.interArrivalStats(t(s, dir, "events"), "ts",
          partitionBy = Seq("user_id"), orderCols = Seq("ts", "event_id"))
        .select(col("user_id"), col("n_gaps"),
          roundf(col("mean_gap_s"), 4).as("mean_gap_s"),
          roundf(col("median_gap_s"), 4).as("median_gap_s"),
          col("max_gap_s"))
        .orderBy("user_id")),

    "q_transitions" -> ((s, dir) =>
      // user-journey Markov matrix; (ts, event_id) makes the per-user
      // order total so lead() is partition-stable
      TimeSeriesLib.transitionMatrix(t(s, dir, "events"), "event_type",
          orderCols = Seq("ts", "event_id"), partitionBy = Seq("user_id"))
        .select(col("from_state"), col("to_state"), col("n"), roundf(col("p"), 6).as("p"))
        .orderBy("from_state", "to_state")),

    "q_trending" -> ((s, dir) =>
      TimeSeriesLib.trendingTopK(t(s, dir, "events"), "ts", "event_type", 3, "day")
        .select(date_format(col("period"), "yyyy-MM-dd").as("period"),
          col("event_type"), col("n"), col("rank"))
        .orderBy("period", "rank")),

    "q_active_users" -> ((s, dir) =>
      TimeSeriesLib.activeUsers(t(s, dir, "events"), "user_id", "ts", Seq(7))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("active_7"))
        .orderBy("day")),

    "q_cohort_retention" -> ((s, dir) =>
      TimeSeriesLib.cohortRetention(t(s, dir, "events"), "user_id", "ts", "week")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("period_offset"), col("n_active"), col("cohort_size"),
          roundf(col("retention"), 6).as("retention"))
        .orderBy("cohort", "period_offset")),

    "q_funnel" -> ((s, dir) =>
      TimeSeriesLib.funnel(t(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .select(col("step_index"), col("step"), col("n_users"),
          roundf(col("conversion_from_first"), 6).as("conv_first"),
          roundf(col("conversion_from_prev"), 6).as("conv_prev"))
        .orderBy("step_index")),

    "q_ts_trend" -> ((s, dir) =>
      // per-user OLS drift of value over event order — event_id as the
      // regressor keeps x identical in both engines (epoch extraction
      // rounds differently across them)
      TimeSeriesLib.trendFeatures(t(s, dir, "events"), "value", "event_id",
          partitionBy = Seq("user_id"))
        .select(col("user_id"), col("value_n").cast("bigint").as("n"),
          roundf(col("value_slope") * 1e6, 4).as("slope_ppm"),
          roundf(col("value_intercept"), 4).as("intercept"),
          roundf(col("value_r2"), 6).as("r2"))
        .orderBy("user_id"))
  )

  /** Savitzky–Golay oracle: the FIR coefficients are solved driver-side (the
    * same solver the engine uses) and inlined as literals — Double.toString
    * round-trips, so DuckDB parses the identical doubles; terms are summed in
    * the same -h..+h order as the engine's fold.
    */
  private val savgolSql: String = {
    val coeffs = graft.functions.TimeSeriesLib.savgolCoefficients(7, 2)
    val terms = coeffs.zipWithIndex.map { case (c, j) =>
      val off = j - 3
      val ref =
        if (off < 0) s"lag(value, ${-off}) OVER w"
        else if (off > 0) s"lead(value, $off) OVER w"
        else "value"
      s"($ref * ($c))"
    }.mkString(" + ")
    s"""SELECT event_id, user_id, value,
       |  round(CASE WHEN count(value) OVER wf = 7 THEN $terms END + 1e-9, 6) AS value_savgol
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
       |       wf AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
       |ORDER BY event_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_ts_savgol" -> savgolSql,

    "q_ts_ewm" ->
      // the engine's exact recurrence (num = num·(1-α)+x, den = den·(1-α)+1,
      // ewm = num/den; null readings leave the state untouched and carry the
      // prior EWM) replayed per user_id in event_id order — the same IEEE
      // double ops in the same order, so values match bit-for-bit
      """WITH RECURSIVE o AS (
        |  SELECT event_id, user_id, CAST(value AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events),
        |r AS (
        |  -- base case MUST be CAST to DOUBLE: a bare 1.0 types the column
        |  -- DECIMAL(2,1) and the recursion silently truncates the state
        |  SELECT event_id, user_id, rn, v,
        |    CAST(CASE WHEN v IS NULL THEN 0.0 ELSE v END AS DOUBLE) AS num,
        |    CAST(CASE WHEN v IS NULL THEN 0.0 ELSE 1.0 END AS DOUBLE) AS den
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.event_id, o.user_id, o.rn, o.v,
        |    CASE WHEN o.v IS NULL THEN r.num ELSE r.num * 0.7 + o.v END,
        |    CASE WHEN o.v IS NULL THEN r.den ELSE r.den * 0.7 + 1.0 END
        |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT event_id, user_id, v AS value,
        |  round(CASE WHEN den > 0 THEN num / den END, 6) AS value_ewm
        |FROM r ORDER BY event_id""".stripMargin,

    "q_ts_seasonal" ->
      """WITH h AS (
        |  SELECT event_type,
        |    make_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)*3600*1000000) AS period,
        |    sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, period, v,
        |        CASE WHEN count(v) OVER wf = 25 THEN
        |          (sum(v) OVER wf - (first_value(v) OVER wf + last_value(v) OVER wf)/2) / 24 END AS trend,
        |        row_number() OVER (PARTITION BY event_type ORDER BY period) AS rn
        |      FROM h
        |      WINDOW wf AS (PARTITION BY event_type ORDER BY period ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT *, (rn - 1) % 24 AS phase, v - trend AS detr FROM t),
        |p AS (SELECT *, avg(detr) OVER (PARTITION BY event_type, phase) AS pm,
        |        row_number() OVER (PARTITION BY event_type, phase ORDER BY period) AS prn FROM d),
        |s AS (SELECT *, pm - avg(CASE WHEN prn = 1 THEN pm END)
        |                   OVER (PARTITION BY event_type) AS seasonal FROM p)
        |SELECT event_type, strftime(period, '%Y-%m-%d %H:%M:%S') AS period_str,
        |  round(trend + 1e-9, 4) AS trend,
        |  round(seasonal + 1e-9, 4) AS seasonal,
        |  round(v - trend - seasonal + 1e-9, 4) AS resid
        |FROM s ORDER BY event_type, period_str""".stripMargin,

    "q_ts_seasonal_mult" ->
      """WITH h AS (
        |  SELECT event_type,
        |    make_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)*3600*1000000) AS period,
        |    sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, period, v,
        |        CASE WHEN count(v) OVER wf = 25 THEN
        |          (sum(v) OVER wf - (first_value(v) OVER wf + last_value(v) OVER wf)/2) / 24 END AS trend,
        |        row_number() OVER (PARTITION BY event_type ORDER BY period) AS rn
        |      FROM h
        |      WINDOW wf AS (PARTITION BY event_type ORDER BY period ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT *, (rn - 1) % 24 AS phase, v / nullif(trend, 0) AS detr FROM t),
        |p AS (SELECT *, avg(detr) OVER (PARTITION BY event_type, phase) AS pm,
        |        row_number() OVER (PARTITION BY event_type, phase ORDER BY period) AS prn FROM d),
        |s AS (SELECT *, pm / nullif(avg(CASE WHEN prn = 1 THEN pm END)
        |                   OVER (PARTITION BY event_type), 0) AS seasonal FROM p)
        |SELECT event_type, strftime(period, '%Y-%m-%d %H:%M:%S') AS period_str,
        |  round(trend + 1e-9, 4) AS trend,
        |  round(seasonal + 1e-9, 6) AS seasonal,
        |  round(v / nullif(trend * seasonal, 0) + 1e-9, 6) AS resid
        |FROM s ORDER BY event_type, period_str""".stripMargin,

    "q_ts_resample" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)*3600*1000000),
        |               '%Y-%m-%d %H:%M:%S') AS period_str,
        |  count(value) AS n, round(sum(value), 3) AS total
        |FROM events GROUP BY 1 ORDER BY period_str""".stripMargin,

    "q_ts_grid_ffill" ->
      """WITH b AS (
        |  SELECT event_type,
        |    make_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)*3600*1000000) AS period,
        |    avg(value) AS va
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, min(period) AS mn, max(period) AS mx FROM b GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS period FROM s),
        |j AS (SELECT g.event_type, g.period, b.va
        |      FROM g LEFT JOIN b ON g.event_type = b.event_type AND g.period = b.period)
        |SELECT event_type, strftime(period, '%Y-%m-%d %H:%M:%S') AS period_str,
        |  round(last_value(va IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY period
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-9, 4) AS value_avg
        |FROM j ORDER BY event_type, period_str""".stripMargin,

    "q_ts_rolling" ->
      """SELECT event_id, user_id,
        |  round(avg(value) OVER w + 1e-9, 4) AS r_mean,
        |  min(value) OVER w AS r_min,
        |  max(value) OVER w AS r_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_ts_rolling_time" ->
      """SELECT event_id,
        |  round(avg(value) OVER w + 1e-9, 4) AS tw_mean,
        |  count(value) OVER w AS tw_n
        |FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY es RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_ts_lags_diffs" ->
      """SELECT event_id,
        |  lag(value, 1) OVER w AS value_lag_1,
        |  lag(value, 3) OVER w AS value_lag_3,
        |  round(value - lag(value, 1) OVER w, 4) AS value_diff_1
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin,

    "q_ts_outlier_zscore" ->
      """SELECT event_id,
        |  CASE WHEN stddev_samp(value) OVER w > 0
        |       THEN abs((value - avg(value) OVER w) / stddev_samp(value) OVER w) > 2.5
        |       ELSE false END AS value_outlier
        |FROM events WINDOW w AS (PARTITION BY event_type)
        |ORDER BY event_id""".stripMargin,

    "q_ts_outlier_iqr" ->
      """SELECT event_id,
        |  value < q1 - 1.5*(q3-q1) OR value > q3 + 1.5*(q3-q1) AS value_outlier
        |FROM (SELECT event_id, value,
        |        quantile_cont(value, 0.25) OVER (PARTITION BY event_type) AS q1,
        |        quantile_cont(value, 0.75) OVER (PARTITION BY event_type) AS q3
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    "q_ts_interpolate" ->
      """WITH t AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
        |  FROM events),
        |r AS (SELECT user_id, event_id, v,
        |        row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |      FROM t),
        |x AS (SELECT event_id, v, rn,
        |        last_value(v IGNORE NULLS) OVER wb AS pv,
        |        last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS ppos,
        |        first_value(v IGNORE NULLS) OVER wa AS nv,
        |        first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wa AS npos
        |      FROM r
        |      WINDOW
        |        wb AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |        wa AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |             WHEN pv IS NOT NULL AND nv IS NOT NULL
        |             THEN pv + (nv - pv) * (rn - ppos) / (npos - ppos) END + 1e-9, 6) AS v_interp
        |FROM x ORDER BY event_id""".stripMargin,

    "q_ts_time_features" ->
      """SELECT event_id,
        |  CAST(year(ts) AS INT) AS ts_year,
        |  CAST(month(ts) AS INT) AS ts_month,
        |  CAST(day(ts) AS INT) AS ts_day,
        |  CAST(hour(ts) AS INT) AS ts_hour,
        |  CAST(dayofweek(ts) + 1 AS INT) AS ts_dayofweek,
        |  CAST(quarter(ts) AS INT) AS ts_quarter,
        |  CAST(weekofyear(ts) AS INT) AS ts_weekofyear,
        |  CAST(dayofyear(ts) AS INT) AS ts_dayofyear,
        |  dayofweek(ts) IN (0, 6) AS ts_is_weekend,
        |  dayname(ts) AS ts_day_name
        |FROM events ORDER BY event_id""".stripMargin,

    "q_ts_changepoints" ->
      """WITH h AS (
        |  SELECT event_type,
        |    make_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)*3600*1000000) AS period,
        |    sum(value) AS value_sum
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, period, value_sum,
        |        avg(value_sum) OVER wf AS rm,
        |        stddev_samp(value_sum) OVER wf AS rs
        |      FROM h
        |      WINDOW wf AS (PARTITION BY event_type ORDER BY period ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
        |x AS (SELECT event_type, period,
        |        abs(rm - lag(rm) OVER (PARTITION BY event_type ORDER BY period)) AS score,
        |        quantile_cont(rs, 0.5) OVER (PARTITION BY event_type) AS med_rs
        |      FROM r)
        |SELECT event_type, strftime(period, '%Y-%m-%d %H:%M:%S') AS period_str,
        |  score IS NOT NULL AND score > 2.0 * med_rs AS is_cp
        |FROM x ORDER BY event_type, period_str""".stripMargin,

    "q_asof_join" ->
      """WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts AS rts, value AS purch_value FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id,
        |  CASE WHEN l.ts - r.rts <= INTERVAL 1 DAY THEN r.purch_value END AS purch_value,
        |  CASE WHEN l.ts - r.rts <= INTERVAL 1 DAY THEN strftime(r.rts, '%Y-%m-%d %H:%M:%S.%f') END AS asof_ts
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.rts
        |ORDER BY event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts AS rts, value AS purch_value FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id,
        |  CASE WHEN r.rts - l.ts <= INTERVAL 1 DAY THEN r.purch_value END AS purch_value,
        |  CASE WHEN r.rts - l.ts <= INTERVAL 1 DAY THEN strftime(r.rts, '%Y-%m-%d %H:%M:%S.%f') END AS asof_ts
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.rts
        |ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """SELECT s.event_id AS signup_id, count(*) AS n_errors, round(sum(e.value), 3) AS err_value
        |FROM events s JOIN events e
        |  ON s.user_id = e.user_id AND e.ts >= s.ts AND e.ts <= s.ts + INTERVAL 2 HOUR
        |WHERE s.event_type = 'signup' AND e.event_type = 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/300) AS BIGINT)*300*1000000),
        |               '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n, round(sum(value), 3) AS total
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q_stream_sliding" ->
      """WITH x AS (
        |  SELECT event_type, CAST(floor(epoch(ts)/300) AS BIGINT)*300 AS b FROM events
        |  UNION ALL
        |  SELECT event_type, CAST(floor(epoch(ts)/300) AS BIGINT)*300 - 300 AS b FROM events)
        |SELECT strftime(make_timestamp(b*1000000), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n
        |FROM x GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q_scd2_apply" ->
      // single-pass SCD2 chain over the full change log: lag-dedup of
      // consecutive identical states, version bounds via lead — the engine
      // runs the same log as TWO incremental scd2Apply batches, so equality
      // proves the merge semantics at the batch boundary
      """WITH e AS (SELECT user_id, event_type AS state, ts, event_id FROM events),
        |d AS (SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |c AS (SELECT * FROM d WHERE prev IS NULL OR state IS DISTINCT FROM prev),
        |v AS (SELECT user_id, state, ts AS valid_from,
        |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to FROM c)
        |SELECT user_id, state,
        |  strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, valid_from, state""".stripMargin,

    "q_sessionize" ->
      // gaps-and-islands replay of TimeSeriesLib.sessionize: >= gap opens a
      // session (session_window parity); sid uses the DEFAULT (RANGE) frame
      // on both sides so timestamp ties share an ordinal deterministically
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts, value,
        |        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_id
        |      FROM o)
        |SELECT user_id, session_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  count(*) AS n_events,
        |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 3) AS duration_s,
        |  round(sum(value), 3) AS total
        |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_start""".stripMargin,

    "q_stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts, value,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM o)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  count(*) AS n_events, round(sum(value), 3) AS total
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "q_ts_outlier_mad" ->
      // stacked quantile_cont windows replay median and MAD; the scalar
      // term keeps the engine's (0.6745·|x−med|)/mad evaluation order
      """WITH m AS (
        |  SELECT event_id, event_type, value,
        |    quantile_cont(value, 0.5) OVER (PARTITION BY event_type) AS med
        |  FROM events),
        |d AS (
        |  SELECT event_id, value, med,
        |    quantile_cont(abs(value - med), 0.5) OVER (PARTITION BY event_type) AS mad
        |  FROM m)
        |SELECT event_id,
        |  coalesce(CASE WHEN mad > 0 THEN (0.6745 * abs(value - med)) / mad > 3.5
        |                ELSE false END, false) AS value_outlier
        |FROM d ORDER BY event_id""".stripMargin,

    "q_cdc_apply" ->
      // expected-result oracle: the winner-per-key semantics collapse to a
      // direct expression of the planted log (delete %10∈{0,2}, +200 update
      // for %10==1, passthrough otherwise, inserts for %10==3)
      """WITH c AS (SELECT c_custkey, c_name, c_acctbal FROM customer)
        |SELECT c_custkey, c_name,
        |  round(c_acctbal + CASE WHEN c_custkey % 10 = 1 THEN 200 ELSE 0 END + 1e-9, 2)
        |    AS c_acctbal
        |FROM c WHERE c_custkey % 10 NOT IN (0, 2)
        |UNION ALL
        |SELECT c_custkey + 1000000, c_name, round(c_acctbal + 0 + 1e-9, 2)
        |FROM c WHERE c_custkey % 10 = 3
        |ORDER BY c_custkey""".stripMargin,

    "q_rolling_corr" ->
      """SELECT event_id,
        |  round(corr(value, event_id) OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS rc
        |FROM events ORDER BY event_id""".stripMargin,

    "q_resample_p95" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |  round(quantile_cont(value, 0.95) + 1e-9, 4) AS p95,
        |  round(quantile_cont(value, 0.5) + 1e-9, 4) AS p50,
        |  count(value) AS n
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "q_twap" ->
      // lead-based in-force durations, floored-epoch parity with
      // unix_timestamp; the last reading carries zero weight
      """WITH g AS (
        |  SELECT user_id, value,
        |    CAST(CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
        |              AS BIGINT)
        |         - CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE) AS dt
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
        |SELECT user_id,
        |  round(sum(value * dt) / nullif(sum(dt), 0.0) + 1e-9, 4) AS twap,
        |  round(sum(dt) + 1e-9, 1) AS total_seconds,
        |  count(*) AS n_readings
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_volume_anomalies" ->
      // MAD replay over the aggregated (group, day) count frame — the same
      // stacked quantile_cont windows as q_ts_outlier_mad
      """WITH c AS (
        |  SELECT event_type, date_trunc('day', ts) AS period, count(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT event_type, period, n,
        |        quantile_cont(n, 0.5) OVER (PARTITION BY event_type) AS med
        |      FROM c),
        |d AS (SELECT event_type, period, n, med,
        |        quantile_cont(abs(n - med), 0.5) OVER (PARTITION BY event_type) AS mad
        |      FROM m)
        |SELECT event_type, strftime(period, '%Y-%m-%d') AS period, n,
        |  coalesce(CASE WHEN mad > 0 THEN (0.6745 * abs(n - med)) / mad > 3.5
        |                ELSE false END, false) AS volume_outlier
        |FROM d ORDER BY event_type, period""".stripMargin,

    "q_interarrival_scalable" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
        |             AS BIGINT) AS gap
        |  FROM events WHERE ts IS NOT NULL)
        |SELECT user_id, count(gap) AS n_gaps,
        |  round(avg(gap) + 1e-9, 4) AS mean_gap_s,
        |  CAST(quantile_disc(gap, 0.5) AS DOUBLE) AS median_gap_s,
        |  max(gap) AS max_gap_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_interarrival" ->
      // DuckDB epoch() keeps the µs fraction; floor to whole seconds for
      // unix_timestamp parity
      """WITH g AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
        |             AS BIGINT) AS gap
        |  FROM events WHERE ts IS NOT NULL)
        |SELECT user_id, count(gap) AS n_gaps,
        |  round(avg(gap) + 1e-9, 4) AS mean_gap_s,
        |  round(quantile_cont(gap, 0.5) + 1e-9, 4) AS median_gap_s,
        |  max(gap) AS max_gap_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
        |  FROM events WHERE event_type IS NOT NULL),
        |c AS (SELECT a, b, count(*) AS n FROM seq WHERE b IS NOT NULL GROUP BY 1, 2)
        |SELECT a AS from_state, b AS to_state, n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY a) AS DOUBLE) + 1e-9, 6) AS p
        |FROM c ORDER BY from_state, to_state""".stripMargin,

    "q_trending" ->
      """WITH c AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS period, event_type, count(*) AS n
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (SELECT period, event_type, n,
        |        CAST(row_number() OVER (PARTITION BY period
        |          ORDER BY n DESC, event_type) AS INT) AS rank
        |      FROM c)
        |SELECT strftime(period, '%Y-%m-%d') AS period, event_type, n, rank
        |FROM r WHERE rank <= 3 ORDER BY period, rank""".stripMargin,

    "q_active_users" ->
      // contribution-explode replay: each active (user, day) covers the 7
      // trailing window-ends; full outer day spine, zeros filled
      """WITH act AS (
        |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |mx AS (SELECT max(d) AS md FROM act),
        |dau AS (SELECT d AS day, count(*) AS dau FROM act GROUP BY 1),
        |w7 AS (
        |  SELECT e.day, count(DISTINCT a.u) AS active_7
        |  FROM act a, mx, LATERAL (
        |    SELECT unnest(range(0, 7)) AS off) o,
        |    LATERAL (SELECT a.d + CAST(o.off || ' days' AS INTERVAL) AS day) e
        |  WHERE e.day <= mx.md GROUP BY 1)
        |SELECT strftime(CAST(coalesce(dau.day, w7.day) AS DATE), '%Y-%m-%d') AS day,
        |  CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
        |  CAST(coalesce(w7.active_7, 0) AS BIGINT) AS active_7
        |FROM dau FULL OUTER JOIN w7 ON w7.day = dau.day
        |ORDER BY day""".stripMargin,

    "q_cohort_retention" ->
      // distinct (user, week) activity → per-user min week = cohort →
      // (cohort, offset) cells; offsets via floor day-diff / 7 (both
      // engines truncate weeks to Monday)
      """WITH act AS (
        |  SELECT DISTINCT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS p
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT u, p, min(p) OVER (PARTITION BY u) AS cohort FROM act),
        |cells AS (SELECT cohort,
        |            CAST(date_diff('day', cohort, p) // 7 AS INT) AS period_offset,
        |            count(*) AS n_active
        |          FROM c GROUP BY 1, 2),
        |sized AS (SELECT cohort, period_offset, n_active,
        |            max(CASE WHEN period_offset = 0 THEN n_active END)
        |              OVER (PARTITION BY cohort) AS cohort_size
        |          FROM cells)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, period_offset, n_active, cohort_size,
        |  round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) + 1e-9, 6) AS retention
        |FROM sized ORDER BY cohort, period_offset""".stripMargin,

    "q_funnel" ->
      // sequential earliest-completion replay: step i's min ts strictly
      // after the user's step i-1 time
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t FROM events
        |            WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
        |       JOIN s1 ON s1.u = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
        |       JOIN s2 ON s2.u = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |c AS (
        |  SELECT 1 AS step_index, 'view' AS step,
        |    CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        |  UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |  UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)),
        |w AS (SELECT step_index, step, n_users,
        |        first_value(n_users) OVER (ORDER BY step_index) AS n1,
        |        lag(n_users) OVER (ORDER BY step_index) AS np
        |      FROM c)
        |SELECT step_index, step, n_users,
        |  CASE WHEN n1 > 0
        |       THEN round(CAST(n_users AS DOUBLE) / CAST(n1 AS DOUBLE) + 1e-9, 6) END AS conv_first,
        |  CASE WHEN np > 0
        |       THEN round(CAST(n_users AS DOUBLE) / CAST(np AS DOUBLE) + 1e-9, 6) END AS conv_prev
        |FROM w ORDER BY step_index""".stripMargin,

    "q_ts_trend" ->
      """SELECT user_id,
        |  CAST(regr_count(value, event_id) AS BIGINT) AS n,
        |  round(regr_slope(value, event_id) * 1e6 + 1e-9, 4) AS slope_ppm,
        |  round(regr_intercept(value, event_id) + 1e-9, 4) AS intercept,
        |  round(regr_r2(value, event_id) + 1e-9, 6) AS r2
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
