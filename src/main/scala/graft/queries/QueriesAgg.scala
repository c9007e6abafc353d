package graft.queries

import org.apache.spark.sql.functions._
import graft.quality.{Profiler, QualityMetrics, SchemaInference}
import QueryUtil._

/** Oracle-backed queries for the aggregation/profiling/quality surface (§2.C). */
object QueriesAgg {

  val queries: Map[String, Q] = Map(
    "q_salted_agg" -> ((s, dir) =>
      // two-phase salted aggregation must equal the plain grouped agg —
      // integer-exact aggregates only (a double sum would be re-association-
      // order noise, the very thing salting changes)
      graft.ops.Scale.aggregateSalted(t(s, dir, "lineitem"), Seq("l_returnflag"),
          Seq("l_partkey" -> "sum", "l_quantity" -> "min", "l_quantity" -> "max",
            "l_orderkey" -> "count"), saltBuckets = 16)
        .select(col("l_returnflag"), col("l_partkey_sum"), col("l_quantity_min"),
          col("l_quantity_max"), col("l_orderkey_count"))
        .orderBy("l_returnflag")),

    "q_incremental_agg" -> ((s, dir) => {
      // fit three disjoint shards -> merge states -> finalize must equal the
      // one-shot full-scan stats (the mergeable-summary law, hard-gated)
      val li = t(s, dir, "lineitem")
      val vals = Seq("l_quantity", "l_extendedprice")
      val states = (0 until 3).map(i =>
        graft.ops.IncrementalAgg.fit(
          li.filter(pmod(col("l_orderkey"), lit(3)) === i), Seq("l_returnflag"), vals))
      val merged = graft.ops.IncrementalAgg.merge(states, Seq("l_returnflag"), vals)
      graft.ops.IncrementalAgg.finalizeStats(merged, Seq("l_returnflag"), vals)
        .select(col("l_returnflag"),
          col("l_quantity_n"), col("l_quantity_nulls"),
          roundf(col("l_quantity_mean"), 4).as("q_mean"),
          roundf(col("l_quantity_std"), 4).as("q_std"),
          col("l_quantity_min").as("q_min"), col("l_quantity_max").as("q_max"),
          roundf(col("l_extendedprice_mean"), 2).as("p_mean"))
        .orderBy("l_returnflag")
    }),

    "q_graph_degrees" -> ((s, dir) =>
      graft.ops.Graph.degrees(
          t(s, dir, "lineitem").select(col("l_suppkey").cast("long").as("src"),
            (pmod(col("l_partkey"), lit(5000)) + 1000000L).as("dst")),
          "src", "dst")
        .orderBy("node")),

    "q_pagerank" -> ((s, dir) => {
      // supplier -> synthetic-page edges: dst ids (1000000+) never appear
      // as src, so the dangling-mass path is exercised for real
      val edges = t(s, dir, "lineitem").select(
        col("l_suppkey").cast("long").as("src"),
        (pmod(col("l_partkey"), lit(5000)) + 1000000L).as("dst"))
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5)
        .select(col("node"), roundf(col("rank"), 9).as("rank"))
        .orderBy("node")
    }),

    "q_column_entropy" -> ((s, dir) =>
      Profiler.entropy(t(s, dir, "documents"), Seq("lang", "source"))
        .select(col("column_name"), roundf(col("entropy_bits"), 6).as("entropy_bits"),
          col("n_distinct"))
        .orderBy("column_name")),

    "q_mutual_info" -> ((s, dir) =>
      Profiler.mutualInfo(t(s, dir, "documents"), "lang", "source")
        .select(roundf(col("mi_bits"), 6).as("mi_bits"), roundf(col("h_x"), 6).as("h_x"),
          roundf(col("h_y"), 6).as("h_y"), col("n_rows"))),

    "q_distinct_counts" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "q_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
          round(percentile(col("l_extendedprice"), lit(0.25)), 4).as("p25"),
          round(percentile(col("l_extendedprice"), lit(0.95)), 4).as("p95"))
        .orderBy("l_returnflag")),

    "q_psi_drift" -> ((s, dir) => {
      // PSI numeric drift: reference = every 3rd doc, current = the rest —
      // both the binning (reference-quantile cuts) and the smoothed-log
      // terms replay exactly in DuckDB (quantile_cont == Spark percentile)
      val d = t(s, dir, "documents")
      Profiler.psiBins(d.filter(col("doc_id") % 3 === 0),
          d.filter(col("doc_id") % 3 =!= 0), "n_chars", nBins = 10)
        .select(col("bin"), col("ref_n"), col("cur_n"),
          roundf(col("ref_frac"), 6).as("ref_frac"),
          roundf(col("cur_frac"), 6).as("cur_frac"),
          roundf(col("psi_term"), 6).as("psi_term"))
        .orderBy("bin")
    }),

    "q_psi_categorical" -> ((s, dir) => {
      // categorical drift over lang: top-3 reference categories, the other
      // two pool into __other at every SF (5 langs exist at each)
      val d = t(s, dir, "documents")
      Profiler.psiCategorical(d.filter(col("doc_id") % 3 === 0),
          d.filter(col("doc_id") % 3 =!= 0), "lang", topK = 3)
        .select(col("category"), col("ref_n"), col("cur_n"),
          roundf(col("ref_frac"), 6).as("ref_frac"),
          roundf(col("cur_frac"), 6).as("cur_frac"),
          roundf(col("psi_term"), 6).as("psi_term"))
        .orderBy("category")
    }),

    "q_moment_stats" -> ((s, dir) =>
      // skewness/kurtosis via explicit moment formulas — identical SQL on both
      // engines (built-in skewness()/kurtosis() differ between engines in
      // bias correction, so the formula IS the spec here)
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          roundf(avg(col("l_quantity")), 6).as("mean_q"),
          roundf(stddev(col("l_quantity")), 6).as("std_q"),
          roundf(variance(col("l_quantity")), 6).as("var_q"),
          roundf((avg(pow(col("l_quantity"), 3)) - lit(3) * avg(col("l_quantity")) * avg(pow(col("l_quantity"), 2))
            + lit(2) * pow(avg(col("l_quantity")), 3)) / pow(stddev_pop(col("l_quantity")), 3), 4).as("skew_q"),
          sum(when(col("l_quantity") > 25, 1).otherwise(0)).as("n_above_25"))
        .orderBy("l_returnflag")),

    "q_string_stats" -> ((s, dir) =>
      t(s, dir, "part").groupBy("p_brand")
        .agg(
          min(length(col("p_name"))).as("min_len"),
          max(length(col("p_name"))).as("max_len"),
          roundf(avg(length(col("p_name"))), 6).as("avg_len"),
          sum(when(col("p_name").rlike("widget"), 1).otherwise(0)).as("n_widget"))
        .orderBy("p_brand")),

    "q_datetime_mode" -> ((s, dir) => {
      // modal month per orderdate-year, deterministic (count desc, month asc)
      val counts = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("yr")).orderBy(col("n").desc, col("mo").asc)
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("yr"), col("mo").as("modal_month"), col("n"))
        .orderBy("yr")
    }),

    "q_value_counts" -> ((s, dir) =>
      Profiler.valueCounts(t(s, dir, "part"), "p_brand", 10)),

    "q_correlation" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))
        .orderBy("l_returnflag")),

    "q_rollup_subtotals" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 3).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_cube_margins" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    "q_agg_features" -> ((s, dir) =>
      graft.functions.FeatureLib.aggregationFeatures(
          t(s, dir, "orders"), Seq("o_custkey"), Seq("o_totalprice" -> "avg", "o_totalprice" -> "max"))
        .select(col("o_orderkey"), col("o_custkey"),
          roundf(col("o_totalprice_avg_by_o_custkey"), 4).as("avg_by_cust"),
          col("o_totalprice_max_by_o_custkey").as("max_by_cust"))
        .orderBy("o_orderkey")),

    "q_quality_metrics" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      QualityMetrics.report(o, Seq(
        QualityMetrics.completeness("o_custkey"),
        QualityMetrics.uniqueness("o_orderkey"),
        QualityMetrics.validity("o_totalprice", "o_totalprice > 0"),
        QualityMetrics.rangeCheck("o_totalprice", 0, 1000000)))
        .select(
          round(col("o_custkey_completeness"), 6).as("completeness"),
          round(col("o_orderkey_uniqueness"), 6).as("uniqueness"),
          round(col("o_totalprice_validity"), 6).as("validity"),
          round(col("o_totalprice_in_range"), 6).as("in_range"))
    }),

    "q_outlier_rate" -> ((s, dir) =>
      QualityMetrics.outlierRateIqr(t(s, dir, "events"), "value", 1.5)
        .select(round(col("value_outlier_rate"), 6).as("outlier_rate"))),

    "q_quality_monitor" -> ((s, dir) => {
      // schema-derived default checks over events, threshold-classified;
      // asOf pinned past the data's end so timeliness provably FAILs and
      // the alert path fires at every SF
      val ev = t(s, dir, "events")
      graft.quality.QualityMonitor.runChecks(ev, "events",
          graft.quality.QualityMonitor.defaultChecks(ev),
          asOf = to_timestamp(lit("2024-01-31 00:00:00")))
        .orderBy("metric_name", "column_name")
    }),

    "q_quality_alerts" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val m = graft.quality.QualityMonitor.runChecks(ev, "events",
        graft.quality.QualityMonitor.defaultChecks(ev),
        asOf = to_timestamp(lit("2024-01-31 00:00:00")))
      graft.quality.QualityMonitor.alerts(m, atEpoch = 1706659200L)
        .orderBy("alert_id")
    }),

    "q_schema_stats" -> ((s, dir) =>
      SchemaInference.columnStats(t(s, dir, "customer"))
        .select(col("column"), col("n"), col("nulls"), col("n_distinct"),
          round(col("distinct_ratio"), 6).as("distinct_ratio"), col("is_pk_candidate"))
        .orderBy("column")),

    "q_numeric_profile" -> ((s, dir) =>
      Profiler.numericProfile(t(s, dir, "lineitem"), Seq("l_quantity", "l_discount"))
        .select(col("column"), col("metric"), roundf(col("value"), 4).as("value"))
        .orderBy("column", "metric")),

    "q_spearman" -> ((s, dir) =>
      Profiler.spearman(t(s, dir, "lineitem"), "l_quantity", "l_extendedprice")
        .select(round(col("spearman"), 6).as("spearman"))),

    "q_spearman_scalable" -> ((s, dir) =>
      // the no-broadcast rank path (distributed ordinals) must land on the
      // same coefficient as the broadcast fast path and the SQL oracle
      Profiler.spearmanLarge(t(s, dir, "lineitem"), "l_quantity", "l_extendedprice")
        .select(round(col("spearman"), 6).as("spearman"))),

    "q_corr_matrix" -> ((s, dir) =>
      Profiler.correlationMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("col_a"), col("col_b"), round(col("pearson"), 6).as("pearson"))
        .orderBy("col_a", "col_b")),

    "q_string_profile" -> ((s, dir) =>
      Profiler.stringProfile(t(s, dir, "part"), Seq("p_name", "p_brand"))
        .select(col("column"), col("metric"), roundf(col("value"), 4).as("value"))
        .orderBy("column", "metric")),

    "q_datetime_profile" -> ((s, dir) =>
      Profiler.datetimeProfile(t(s, dir, "orders"), "o_orderdate")
        .orderBy("metric")),

    "q_describe" -> ((s, dir) =>
      // describe() emits engine-formatted strings; Java double toString
      // round-trips exactly, so casting back to double + the roundf
      // convention makes the output oracle-comparable
      t(s, dir, "supplier").describe("s_acctbal", "s_nationkey")
        .select(col("summary"),
          roundf(col("s_acctbal").cast("double"), 4).as("s_acctbal"),
          roundf(col("s_nationkey").cast("double"), 4).as("s_nationkey"))
        .orderBy("summary")),

    "q_fk_candidates" -> ((s, dir) => {
      // star-schema FK probes: two true FKs + one deliberately-false
      // direction (parents without children)
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val li = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      SchemaInference.fkCandidateStats(o, "o_custkey", c, "c_custkey")
        .unionByName(SchemaInference.fkCandidateStats(li, "l_partkey", p, "p_partkey"))
        .unionByName(SchemaInference.fkCandidateStats(c, "c_custkey", o, "o_custkey"))
        .orderBy("child_col")
    }),

    "q_dd_quantiles" -> ((s, dir) => {
      // DDSketch state fit per flag, quantiles read from the sketch alone
      val st = graft.ops.IncrementalAgg.ddFit(t(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_extendedprice", alpha = 0.01)
      graft.ops.IncrementalAgg.ddQuantiles(st, Seq("l_returnflag"), Seq(0.5, 0.95, 0.99), alpha = 0.01)
        .select(col("l_returnflag"), col("q"),
          roundf(col("quantile_est"), 4).as("est"))
        .orderBy("l_returnflag", "q")
    }),

    "q_benford" -> ((s, dir) =>
      Profiler.benford(t(s, dir, "orders"), "o_totalprice")
        .select(col("digit"), col("n"),
          roundf(col("obs_frac"), 6).as("obs_frac"),
          roundf(col("exp_frac"), 6).as("exp_frac"),
          roundf(col("deviation"), 6).as("deviation"))
        .orderBy("digit")),

    "q_triangles" -> ((s, dir) => {
      // co-order part-bucket graph: parts bucketed mod 50 joined within an
      // order — dense enough that real triangles exist at every SF
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), pmod(col("l_partkey"), lit(50)).as("p"))
      val e = li.alias("x").join(li.alias("y"),
          col("x.k") === col("y.k") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.ops.Graph.triangleCounts(e, "src", "dst")
        .orderBy("node")
    }),

    "q_chi_square" -> ((s, dir) =>
      Profiler.chiSquare(t(s, dir, "documents"), "lang", "source")
        .select(roundf(col("chi2"), 6).as("chi2"), col("dof"),
          roundf(col("cramers_v"), 6).as("cramers_v"), col("n_rows"))),

    "q_k_anonymity" -> ((s, dir) =>
      // QI = (mktsegment, nationkey): coarse enough that most cells pass
      // k=10 at sf0.01 while a violating tail exists — both branches live
      Profiler.kAnonymity(t(s, dir, "customer"), Seq("c_mktsegment", "c_nationkey"), 10)
        .select(col("n_rows"), col("n_groups"), col("min_group_size"),
          col("violating_groups"), col("violating_rows"), col("k"), col("anonymity_ok"))),

    "q_weighted_sample" -> ((s, dir) =>
      // per-lang A-ES sample of 10 docs weighted by length; deterministic
      // md5-derived u so DuckDB replays selection AND order exactly
      graft.ops.Scale.weightedSample(t(s, dir, "documents"), "n_chars", "doc_id", 10,
          groupCols = Seq("lang"))
        .select(col("lang"), col("doc_id"),
          roundf(col("es_key") * 1e6, 4).as("es_ppm"), col("rank"))
        .orderBy("lang", "rank"))
  )

  /** Shared monitor CTE: the 12 schema-derived default checks over events
    * (completeness ×6; uniqueness on the two *_id columns; IQR non-outlier
    * rate on the three numerics; 24h timeliness on ts vs the pinned asOf),
    * classified PASS/WARN/FAIL from the RAW value like the engine.
    */
  private val monitorCte: String =
    """WITH st AS (SELECT
      |    count(*) AS n,
      |    count(event_id) AS c1, count(user_id) AS c2, count(ts) AS c3,
      |    count(event_type) AS c4, count(value) AS c5, count(props) AS c6,
      |    count(DISTINCT event_id) AS d1, count(DISTINCT user_id) AS d2,
      |    quantile_cont(event_id, 0.25) AS q1a, quantile_cont(event_id, 0.75) AS q3a,
      |    quantile_cont(user_id, 0.25) AS q1b, quantile_cont(user_id, 0.75) AS q3b,
      |    quantile_cont(value, 0.25) AS q1c, quantile_cont(value, 0.75) AS q3c,
      |    avg(CASE WHEN floor(epoch(TIMESTAMP '2024-01-31 00:00:00')) - floor(epoch(ts)) <= 86400.0
      |             THEN 1.0 ELSE 0.0 END) AS tml
      |  FROM events),
      |ol AS (SELECT
      |    coalesce(1.0 - sum(CASE WHEN e.event_id < q1a - 1.5*(q3a-q1a)
      |        OR e.event_id > q3a + 1.5*(q3a-q1a) THEN 1.0 ELSE 0.0 END)
      |      / nullif(count(e.event_id), 0), 1.0) AS o1,
      |    coalesce(1.0 - sum(CASE WHEN e.user_id < q1b - 1.5*(q3b-q1b)
      |        OR e.user_id > q3b + 1.5*(q3b-q1b) THEN 1.0 ELSE 0.0 END)
      |      / nullif(count(e.user_id), 0), 1.0) AS o2,
      |    coalesce(1.0 - sum(CASE WHEN e.value < q1c - 1.5*(q3c-q1c)
      |        OR e.value > q3c + 1.5*(q3c-q1c) THEN 1.0 ELSE 0.0 END)
      |      / nullif(count(e.value), 0), 1.0) AS o3
      |  FROM events e CROSS JOIN st),
      |m(metric_name, column_name, raw_value, threshold_value) AS (
      |  SELECT 'completeness', 'event_id', CAST(c1 AS DOUBLE)/n, CAST(0.95 AS DOUBLE) FROM st
      |  UNION ALL SELECT 'completeness', 'user_id', CAST(c2 AS DOUBLE)/n, 0.95 FROM st
      |  UNION ALL SELECT 'completeness', 'ts', CAST(c3 AS DOUBLE)/n, 0.95 FROM st
      |  UNION ALL SELECT 'completeness', 'event_type', CAST(c4 AS DOUBLE)/n, 0.95 FROM st
      |  UNION ALL SELECT 'completeness', 'value', CAST(c5 AS DOUBLE)/n, 0.95 FROM st
      |  UNION ALL SELECT 'completeness', 'props', CAST(c6 AS DOUBLE)/n, 0.95 FROM st
      |  UNION ALL SELECT 'uniqueness', 'event_id', CAST(d1 AS DOUBLE)/n, CAST(1.0 AS DOUBLE) FROM st
      |  UNION ALL SELECT 'uniqueness', 'user_id', CAST(d2 AS DOUBLE)/n, 1.0 FROM st
      |  UNION ALL SELECT 'outlier_iqr', 'event_id', o1, 0.95 FROM ol
      |  UNION ALL SELECT 'outlier_iqr', 'user_id', o2, 0.95 FROM ol
      |  UNION ALL SELECT 'outlier_iqr', 'value', o3, 0.95 FROM ol
      |  UNION ALL SELECT 'timeliness', 'ts', tml, CAST(0.8 AS DOUBLE) FROM st),
      |cls AS (SELECT 'events' AS table_name, metric_name, column_name,
      |  round(raw_value, 4) AS metric_value, threshold_value,
      |  CASE WHEN raw_value >= threshold_value THEN 'PASS'
      |       WHEN raw_value >= threshold_value * 0.8 THEN 'WARN'
      |       ELSE 'FAIL' END AS status FROM m)""".stripMargin

  /** Fixed-iteration PageRank replay: DuckDB recursive CTEs cannot aggregate
    * over the recursive reference, so the 5 rounds unroll into 5 chained
    * CTEs, each computing contributions + dangling mass exactly as the
    * engine's per-iteration plan does (same IEEE op order per row; sum
    * re-association absorbed by the round-9).
    */
  private val pagerankSql: String = {
    val d = "0.85"
    // AS MATERIALIZED throughout (round 13): every pr_i references
    // pr_{i-1} TWICE (dangling scalar + contributions) — inlined, the
    // chain expands 2^iterations copies of the 6M-row DISTINCT leaf,
    // which exhausted DuckDB's temp space on the sf~1 ScaleUp gate;
    // materialized, each step runs once (the engine's checkpoint shape).
    val steps = (1 to 5).map { i =>
      s"""pr$i AS MATERIALIZED (
         |  SELECT nd.n,
         |    (1 - $d) / cnt.nodecount + $d * (COALESCE(c.s, 0) + dg.s / cnt.nodecount) AS r
         |  FROM nodes nd
         |  CROSS JOIN cnt
         |  CROSS JOIN (SELECT COALESCE(sum(p.r), 0) AS s FROM pr${i - 1} p
         |              LEFT JOIN deg ON deg.src = p.n WHERE deg.src IS NULL) dg
         |  LEFT JOIN (SELECT e.dst AS n2, sum(p.r / deg.outd) AS s
         |             FROM e JOIN pr${i - 1} p ON p.n = e.src
         |             JOIN deg ON deg.src = e.src GROUP BY e.dst) c ON c.n2 = nd.n)""".stripMargin
    }
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
       |                  CAST(1000000 + l_partkey % 5000 AS BIGINT) AS dst FROM lineitem),
       |nodes AS MATERIALIZED (SELECT src AS n FROM e UNION SELECT dst FROM e),
       |cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nodecount FROM nodes),
       |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS outd FROM e GROUP BY src),
       |pr0 AS MATERIALIZED (SELECT n, 1.0 / cnt.nodecount AS r FROM nodes CROSS JOIN cnt),
       |${steps.mkString(",\n")}
       |SELECT n AS node, round(r + 1e-9, 9) AS rank FROM pr5 ORDER BY node""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_graph_degrees" ->
      """WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
        |                  CAST(1000000 + l_partkey % 5000 AS BIGINT) AS dst FROM lineitem),
        |nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e)
        |SELECT n AS node,
        |  COALESCE(o.c, 0) AS out_degree, COALESCE(i.c, 0) AS in_degree
        |FROM nodes
        |LEFT JOIN (SELECT src, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY src) o ON o.src = n
        |LEFT JOIN (SELECT dst, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY dst) i ON i.dst = n
        |ORDER BY node""".stripMargin,

    "q_pagerank" -> pagerankSql,

    "q_column_entropy" ->
      """WITH m AS (
        |  SELECT 'lang' AS column_name, CAST(lang AS VARCHAR) AS v
        |  FROM documents WHERE lang IS NOT NULL
        |  UNION ALL
        |  SELECT 'source', CAST(source AS VARCHAR)
        |  FROM documents WHERE source IS NOT NULL),
        |c AS (SELECT column_name, v, count(*) AS n FROM m GROUP BY 1, 2),
        |t AS (SELECT column_name, n, sum(n) OVER (PARTITION BY column_name) AS tot FROM c)
        |SELECT column_name,
        |  round(-sum((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
        |             * log2(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))) + 1e-9, 6) AS entropy_bits,
        |  count(*) AS n_distinct
        |FROM t GROUP BY column_name ORDER BY column_name""".stripMargin,

    "q_mutual_info" ->
      """WITH j AS (SELECT lang AS x, source AS y, count(*) AS n FROM documents
        |           WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT n,
        |        sum(n) OVER (PARTITION BY x) AS nx,
        |        sum(n) OVER (PARTITION BY y) AS ny,
        |        sum(n) OVER () AS tot FROM j)
        |SELECT
        |  round(sum((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
        |            * log2((CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
        |                   / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))) + 1e-9, 6) AS mi_bits,
        |  round(-sum((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
        |             * log2(CAST(nx AS DOUBLE) / CAST(tot AS DOUBLE))) + 1e-9, 6) AS h_x,
        |  round(-sum((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
        |             * log2(CAST(ny AS DOUBLE) / CAST(tot AS DOUBLE))) + 1e-9, 6) AS h_y,
        |  CAST(sum(n) AS BIGINT) AS n_rows
        |FROM w""".stripMargin,

    "q_incremental_agg" ->
      // one-shot full scan: sharded fit+merge must land on the same stats
      """SELECT l_returnflag,
        |  count(l_quantity) AS l_quantity_n,
        |  count(*) - count(l_quantity) AS l_quantity_nulls,
        |  round(avg(l_quantity) + 1e-9, 4) AS q_mean,
        |  round(sqrt(greatest(0.0, avg(l_quantity * l_quantity)
        |                           - avg(l_quantity) * avg(l_quantity))) + 1e-9, 4) AS q_std,
        |  min(l_quantity) AS q_min, max(l_quantity) AS q_max,
        |  round(avg(l_extendedprice) + 1e-9, 2) AS p_mean
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_salted_agg" ->
      // the plain one-level grouped agg: salting must be invisible in the
      // result (integer-exact aggregates re-associate losslessly)
      """SELECT l_returnflag,
        |  CAST(sum(l_partkey) AS BIGINT) AS l_partkey_sum,
        |  min(l_quantity) AS l_quantity_min,
        |  max(l_quantity) AS l_quantity_max,
        |  count(l_orderkey) AS l_orderkey_count
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_psi_drift" ->
      // replays psiBins: reference-quantile cuts (quantile_cont == Spark's
      // exact percentile), sum-of-indicators binning, per-side counts over
      // a full 0..nBins-1 spine, max(frac, 1e-6) smoothing, natural log
      """WITH refd AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 3 = 0 AND n_chars IS NOT NULL),
        |curd AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 3 <> 0 AND n_chars IS NOT NULL),
        |cuts AS (SELECT
        |  quantile_cont(v, 0.1) AS q1, quantile_cont(v, 0.2) AS q2,
        |  quantile_cont(v, 0.3) AS q3, quantile_cont(v, 0.4) AS q4,
        |  quantile_cont(v, 0.5) AS q5, quantile_cont(v, 0.6) AS q6,
        |  quantile_cont(v, 0.7) AS q7, quantile_cont(v, 0.8) AS q8,
        |  quantile_cont(v, 0.9) AS q9 FROM refd),
        |rb AS (SELECT (CAST(v > q1 AS INT) + CAST(v > q2 AS INT) + CAST(v > q3 AS INT)
        |  + CAST(v > q4 AS INT) + CAST(v > q5 AS INT) + CAST(v > q6 AS INT)
        |  + CAST(v > q7 AS INT) + CAST(v > q8 AS INT) + CAST(v > q9 AS INT)) AS bin
        |  FROM refd, cuts),
        |cb AS (SELECT (CAST(v > q1 AS INT) + CAST(v > q2 AS INT) + CAST(v > q3 AS INT)
        |  + CAST(v > q4 AS INT) + CAST(v > q5 AS INT) + CAST(v > q6 AS INT)
        |  + CAST(v > q7 AS INT) + CAST(v > q8 AS INT) + CAST(v > q9 AS INT)) AS bin
        |  FROM curd, cuts),
        |rc AS (SELECT bin, count(*) AS rn FROM rb GROUP BY bin),
        |cc AS (SELECT bin, count(*) AS cn FROM cb GROUP BY bin),
        |spine AS (SELECT unnest(range(0, 10)) AS bin),
        |fr AS (SELECT s.bin,
        |    COALESCE(rc.rn, 0) AS ref_n, COALESCE(cc.cn, 0) AS cur_n,
        |    greatest(COALESCE(rc.rn, 0) * 1.0 / (SELECT count(*) FROM refd), 0.000001) AS p,
        |    greatest(COALESCE(cc.cn, 0) * 1.0 / (SELECT count(*) FROM curd), 0.000001) AS q
        |  FROM spine s LEFT JOIN rc ON s.bin = rc.bin LEFT JOIN cc ON s.bin = cc.bin)
        |SELECT CAST(bin AS INT) AS bin, ref_n, cur_n,
        |  round(p + 1e-9, 6) AS ref_frac, round(q + 1e-9, 6) AS cur_frac,
        |  round((q - p) * ln(q / p) + 1e-9, 6) AS psi_term
        |FROM fr ORDER BY bin""".stripMargin,

    "q_psi_categorical" ->
      // replays psiCategorical: top-K by (ref count desc, category asc),
      // tail pooled to __other, smoothed fractions, natural log. sum() in
      // DuckDB is HUGEINT — the counts must CAST back to BIGINT.
      """WITH refd AS (SELECT lang AS v FROM documents WHERE doc_id % 3 = 0 AND lang IS NOT NULL),
        |curd AS (SELECT lang AS v FROM documents WHERE doc_id % 3 <> 0 AND lang IS NOT NULL),
        |rc0 AS (SELECT v AS category, count(*) AS rn FROM refd GROUP BY v),
        |cc0 AS (SELECT v AS category, count(*) AS cn FROM curd GROUP BY v),
        |top AS (SELECT category FROM rc0 ORDER BY rn DESC, category ASC LIMIT 3),
        |rc AS (SELECT CASE WHEN category IN (SELECT category FROM top)
        |    THEN category ELSE '__other' END AS category,
        |    CAST(sum(rn) AS BIGINT) AS rn FROM rc0 GROUP BY 1),
        |cc AS (SELECT CASE WHEN category IN (SELECT category FROM top)
        |    THEN category ELSE '__other' END AS category,
        |    CAST(sum(cn) AS BIGINT) AS cn FROM cc0 GROUP BY 1),
        |spine AS (SELECT category FROM top UNION ALL SELECT '__other'),
        |fr AS (SELECT s.category,
        |    COALESCE(rc.rn, 0) AS ref_n, COALESCE(cc.cn, 0) AS cur_n,
        |    greatest(COALESCE(rc.rn, 0) * 1.0 / (SELECT count(*) FROM refd), 0.000001) AS p,
        |    greatest(COALESCE(cc.cn, 0) * 1.0 / (SELECT count(*) FROM curd), 0.000001) AS q
        |  FROM spine s LEFT JOIN rc USING (category) LEFT JOIN cc USING (category))
        |SELECT category, ref_n, cur_n,
        |  round(p + 1e-9, 6) AS ref_frac, round(q + 1e-9, 6) AS cur_frac,
        |  round((q - p) * ln(q / p) + 1e-9, 6) AS psi_term
        |FROM fr ORDER BY category""".stripMargin,

    "q_quality_monitor" ->
      s"""$monitorCte
         |SELECT * FROM cls ORDER BY metric_name, column_name""".stripMargin,

    "q_quality_alerts" ->
      s"""$monitorCte
         |SELECT concat('DQ_events_', metric_name, '_', column_name, '_1706659200') AS alert_id,
         |  table_name, metric_name, column_name, metric_value, threshold_value, status,
         |  CASE WHEN status = 'FAIL' THEN 'CRITICAL' ELSE 'WARNING' END AS severity,
         |  'Data quality issue detected in table ''events'' for column ''' || column_name ||
         |  '''. ' || upper(substr(metric_name, 1, 1)) || substr(metric_name, 2) || ' is ' ||
         |  printf('%.2f', metric_value * 100) || '% (threshold: ' ||
         |  printf('%.2f', threshold_value * 100) || '%). Status: ' || status AS message
         |FROM cls WHERE status IN ('WARN', 'FAIL')
         |ORDER BY alert_id""".stripMargin,

    "q_describe" ->
      // Spark describe() rows: count (non-null), mean, stddev (sample),
      // min, max — rebuilt by UNION ALL with the same string labels
      """WITH st AS (SELECT
        |  count(s_acctbal) AS c1, avg(s_acctbal) AS m1, stddev_samp(s_acctbal) AS sd1,
        |  min(s_acctbal) AS mn1, max(s_acctbal) AS mx1,
        |  count(s_nationkey) AS c2, avg(s_nationkey) AS m2, stddev_samp(s_nationkey) AS sd2,
        |  min(s_nationkey) AS mn2, max(s_nationkey) AS mx2
        |FROM supplier)
        |SELECT 'count' AS summary,
        |  round(CAST(c1 AS DOUBLE) + 1e-9, 4) AS s_acctbal,
        |  round(CAST(c2 AS DOUBLE) + 1e-9, 4) AS s_nationkey FROM st
        |UNION ALL SELECT 'max', round(CAST(mx1 AS DOUBLE) + 1e-9, 4),
        |  round(CAST(mx2 AS DOUBLE) + 1e-9, 4) FROM st
        |UNION ALL SELECT 'mean', round(m1 + 1e-9, 4), round(m2 + 1e-9, 4) FROM st
        |UNION ALL SELECT 'min', round(CAST(mn1 AS DOUBLE) + 1e-9, 4),
        |  round(CAST(mn2 AS DOUBLE) + 1e-9, 4) FROM st
        |UNION ALL SELECT 'stddev', round(sd1 + 1e-9, 4), round(sd2 + 1e-9, 4) FROM st
        |ORDER BY summary""".stripMargin,

    "q_distinct_counts" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_moment_stats" ->
      """SELECT l_returnflag,
        |  round(avg(l_quantity) + 1e-9, 6) AS mean_q,
        |  round(stddev_samp(l_quantity) + 1e-9, 6) AS std_q,
        |  round(var_samp(l_quantity) + 1e-9, 6) AS var_q,
        |  round((avg(pow(l_quantity, 3)) - 3 * avg(l_quantity) * avg(pow(l_quantity, 2))
        |         + 2 * pow(avg(l_quantity), 3)) / pow(stddev_pop(l_quantity), 3) + 1e-9, 4) AS skew_q,
        |  CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_25
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_string_stats" ->
      """SELECT p_brand,
        |  CAST(min(length(p_name)) AS INT) AS min_len,
        |  CAST(max(length(p_name)) AS INT) AS max_len,
        |  round(avg(length(p_name)) + 1e-9, 6) AS avg_len,
        |  CAST(sum(CASE WHEN regexp_matches(p_name, 'widget') THEN 1 ELSE 0 END) AS BIGINT) AS n_widget
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_datetime_mode" ->
      """SELECT CAST(yr AS INT) AS yr, CAST(mo AS INT) AS modal_month, n FROM (
        |  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo, count(*) AS n,
        |    row_number() OVER (PARTITION BY year(o_orderdate) ORDER BY count(*) DESC, month(o_orderdate)) AS rn
        |  FROM orders GROUP BY 1, 2)
        |WHERE rn = 1 ORDER BY yr""".stripMargin,

    "q_value_counts" ->
      """SELECT p_brand, count(*) AS n FROM part
        |GROUP BY p_brand ORDER BY n DESC, p_brand LIMIT 10""".stripMargin,

    "q_correlation" ->
      """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_rollup_subtotals" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 3) AS sum_qty, count(*) AS n,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube_margins" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_features" ->
      """SELECT o_orderkey, o_custkey,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey) + 1e-9, 4) AS avg_by_cust,
        |  max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_by_cust
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_quality_metrics" ->
      """SELECT
        |  round(count(o_custkey) * 1.0 / count(*), 6) AS completeness,
        |  round(count(DISTINCT o_orderkey) * 1.0 / count(*), 6) AS uniqueness,
        |  round(avg(CASE WHEN o_totalprice > 0 THEN 1.0 ELSE 0.0 END), 6) AS validity,
        |  round(avg(CASE WHEN o_totalprice BETWEEN 0 AND 1000000 THEN 1.0 ELSE 0.0 END), 6) AS in_range
        |FROM orders""".stripMargin,

    "q_outlier_rate" ->
      """WITH s AS (SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events)
        |SELECT round(avg(CASE WHEN value < q1 - 1.5*(q3-q1) OR value > q3 + 1.5*(q3-q1)
        |                      THEN 1.0 ELSE 0.0 END), 6) AS outlier_rate
        |FROM events, s""".stripMargin,

    "q_schema_stats" ->
      """WITH t AS (
        |  SELECT 'c_custkey' AS "column", count(*) AS n,
        |    sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS nulls,
        |    count(DISTINCT c_custkey) AS n_distinct FROM customer
        |  UNION ALL SELECT 'c_name', count(*),
        |    sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END), count(DISTINCT c_name) FROM customer
        |  UNION ALL SELECT 'c_nationkey', count(*),
        |    sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END), count(DISTINCT c_nationkey) FROM customer
        |  UNION ALL SELECT 'c_acctbal', count(*),
        |    sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END), count(DISTINCT c_acctbal) FROM customer
        |  UNION ALL SELECT 'c_mktsegment', count(*),
        |    sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END), count(DISTINCT c_mktsegment) FROM customer)
        |SELECT "column", n, CAST(nulls AS BIGINT) AS nulls, n_distinct,
        |  round(n_distinct * 1.0 / n, 6) AS distinct_ratio,
        |  (nulls = 0 AND n_distinct = n) AS is_pk_candidate
        |FROM t ORDER BY "column"""".stripMargin,

    "q_numeric_profile" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS "column", count(l_quantity)::DOUBLE AS count,
        |    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::DOUBLE AS nulls,
        |    count(DISTINCT l_quantity)::DOUBLE AS "distinct",
        |    avg(l_quantity) AS mean, stddev_samp(l_quantity) AS stddev,
        |    min(l_quantity)::DOUBLE AS min, max(l_quantity)::DOUBLE AS max,
        |    quantile_cont(l_quantity, 0.5) AS median,
        |    quantile_cont(l_quantity, 0.25) AS q1, quantile_cont(l_quantity, 0.75) AS q3,
        |    sum(CASE WHEN l_quantity = 0 THEN 1 ELSE 0 END)::DOUBLE AS zeros,
        |    sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END)::DOUBLE AS positive,
        |    sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END)::DOUBLE AS negative
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', count(l_discount)::DOUBLE,
        |    sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)::DOUBLE,
        |    count(DISTINCT l_discount)::DOUBLE,
        |    avg(l_discount), stddev_samp(l_discount),
        |    min(l_discount)::DOUBLE, max(l_discount)::DOUBLE,
        |    quantile_cont(l_discount, 0.5), quantile_cont(l_discount, 0.25), quantile_cont(l_discount, 0.75),
        |    sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END)::DOUBLE,
        |    sum(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END)::DOUBLE,
        |    sum(CASE WHEN l_discount < 0 THEN 1 ELSE 0 END)::DOUBLE
        |  FROM lineitem)
        |SELECT "column", metric, round(raw + 1e-9, 4) AS value
        |FROM m UNPIVOT (raw FOR metric IN
        |  (count, nulls, "distinct", mean, stddev, min, max, median, q1, q3, zeros, positive, negative))
        |ORDER BY "column", metric""".stripMargin,

    "q_spearman" ->
      """WITH t AS (SELECT l_quantity, l_extendedprice FROM lineitem),
        |r AS (SELECT
        |    rank() OVER (ORDER BY l_quantity) + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS ra,
        |    rank() OVER (ORDER BY l_extendedprice) + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS rb
        |  FROM t)
        |SELECT round(corr(ra, rb), 6) AS spearman FROM r""".stripMargin,

    "q_spearman_scalable" ->
      """WITH t AS (SELECT l_quantity, l_extendedprice FROM lineitem),
        |r AS (SELECT
        |    rank() OVER (ORDER BY l_quantity) + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS ra,
        |    rank() OVER (ORDER BY l_extendedprice) + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS rb
        |  FROM t)
        |SELECT round(corr(ra, rb), 6) AS spearman FROM r""".stripMargin,

    "q_corr_matrix" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    round(corr(l_quantity, l_extendedprice), 6) AS pearson FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount', round(corr(l_quantity, l_discount), 6) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', round(corr(l_extendedprice, l_discount), 6) FROM lineitem)
        |ORDER BY col_a, col_b""".stripMargin,

    "q_string_profile" ->
      """WITH m AS (
        |  SELECT 'p_name' AS "column",
        |    count(p_name)::DOUBLE AS count, count(DISTINCT p_name)::DOUBLE AS "distinct",
        |    min(length(p_name))::DOUBLE AS min_len, max(length(p_name))::DOUBLE AS max_len,
        |    avg(length(p_name)) AS avg_len,
        |    sum(CASE WHEN p_name = '' THEN 1 ELSE 0 END)::DOUBLE AS empty,
        |    sum(CASE WHEN trim(p_name) = '' AND p_name <> '' THEN 1 ELSE 0 END)::DOUBLE AS whitespace
        |  FROM part
        |  UNION ALL
        |  SELECT 'p_brand', count(p_brand)::DOUBLE, count(DISTINCT p_brand)::DOUBLE,
        |    min(length(p_brand))::DOUBLE, max(length(p_brand))::DOUBLE, avg(length(p_brand)),
        |    sum(CASE WHEN p_brand = '' THEN 1 ELSE 0 END)::DOUBLE,
        |    sum(CASE WHEN trim(p_brand) = '' AND p_brand <> '' THEN 1 ELSE 0 END)::DOUBLE
        |  FROM part)
        |SELECT "column", metric, round(raw + 1e-9, 4) AS value
        |FROM m UNPIVOT (raw FOR metric IN (count, "distinct", min_len, max_len, avg_len, empty, whitespace))
        |ORDER BY "column", metric""".stripMargin,

    "q_fk_candidates" ->
      """WITH probe AS (
        |  SELECT 'o_custkey' AS child_col, 'c_custkey' AS parent_col,
        |    (SELECT count(DISTINCT o_custkey) FROM orders WHERE o_custkey IS NOT NULL) AS n_child_keys,
        |    (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL)
        |     WHERE k NOT IN (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IS NOT NULL)) AS n_missing
        |  UNION ALL
        |  SELECT 'l_partkey', 'p_partkey',
        |    (SELECT count(DISTINCT l_partkey) FROM lineitem WHERE l_partkey IS NOT NULL),
        |    (SELECT count(*) FROM (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_partkey IS NOT NULL)
        |     WHERE k NOT IN (SELECT DISTINCT p_partkey FROM part WHERE p_partkey IS NOT NULL))
        |  UNION ALL
        |  SELECT 'c_custkey', 'o_custkey',
        |    (SELECT count(DISTINCT c_custkey) FROM customer WHERE c_custkey IS NOT NULL),
        |    (SELECT count(*) FROM (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey IS NOT NULL)
        |     WHERE k NOT IN (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL)))
        |SELECT child_col, parent_col,
        |  CAST(n_child_keys AS BIGINT) AS n_child_keys,
        |  CAST(n_missing AS BIGINT) AS n_missing,
        |  round((n_child_keys - n_missing) * 1.0 / n_child_keys, 6) AS containment,
        |  (n_missing = 0) AS is_fk_candidate
        |FROM probe ORDER BY child_col""".stripMargin,

    "q_datetime_profile" ->
      """WITH modes AS (
        |  SELECT 'year' AS metric, CAST(year(o_orderdate) AS DOUBLE) AS value,
        |    row_number() OVER (ORDER BY count(*) DESC, year(o_orderdate)) AS rn
        |  FROM orders GROUP BY year(o_orderdate)
        |  UNION ALL
        |  SELECT 'month', CAST(month(o_orderdate) AS DOUBLE),
        |    row_number() OVER (ORDER BY count(*) DESC, month(o_orderdate))
        |  FROM orders GROUP BY month(o_orderdate)
        |  UNION ALL
        |  SELECT 'day', CAST(day(o_orderdate) AS DOUBLE),
        |    row_number() OVER (ORDER BY count(*) DESC, day(o_orderdate))
        |  FROM orders GROUP BY day(o_orderdate))
        |SELECT metric, value FROM modes WHERE rn = 1
        |UNION ALL
        |SELECT 'min_epoch', epoch(min(o_orderdate))::DOUBLE FROM orders
        |UNION ALL
        |SELECT 'max_epoch', epoch(max(o_orderdate))::DOUBLE FROM orders
        |ORDER BY metric""".stripMargin,

    "q_dd_quantiles" ->
      // full DDSketch replay: γ = (1+α)/(1−α) computed with the same IEEE
      // ops as the driver literal, ceil-log bucketing, cumulative walk in
      // (sign, sign·bucket) order, 2γ^b/(γ+1) point estimates
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CASE WHEN l_extendedprice > 0 THEN 1
        |         WHEN l_extendedprice < 0 THEN -1 ELSE 0 END AS sign,
        |    CASE WHEN l_extendedprice = 0 THEN 0
        |         ELSE CAST(ceil(ln(abs(CAST(l_extendedprice AS DOUBLE)))
        |                        / ln((1.0 + 0.01) / (1.0 - 0.01))) AS INT) END AS bucket
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |st AS (SELECT l_returnflag, sign, bucket, count(*) AS n FROM b GROUP BY 1, 2, 3),
        |cum AS (SELECT l_returnflag, sign, bucket, n,
        |          sum(n) OVER (PARTITION BY l_returnflag
        |                       ORDER BY sign, sign * bucket) AS cum,
        |          sum(n) OVER (PARTITION BY l_returnflag) AS tot
        |        FROM st),
        |qs(q) AS (VALUES (0.5), (0.95), (0.99)),
        |hit AS (
        |  SELECT c.l_returnflag, q.q, c.sign, c.bucket,
        |    CASE WHEN c.sign = 0 THEN 0.0
        |         ELSE c.sign * (2.0 * power((1.0 + 0.01) / (1.0 - 0.01), c.bucket)
        |                        / ((1.0 + 0.01) / (1.0 - 0.01) + 1.0)) END AS est
        |  FROM cum c CROSS JOIN qs q
        |  WHERE CAST(c.cum AS DOUBLE) >= q.q * CAST(c.tot AS DOUBLE))
        |SELECT l_returnflag, q,
        |  -- composite key = sign·1e8 + sign·bucket: same (sign, sign·bucket)
        |  -- order as the engine's struct min_by (|bucket| ≪ 1e8 for doubles)
        |  round(arg_min(est, CAST(sign AS BIGINT) * 100000000 + sign * bucket) + 1e-9, 4) AS est
        |FROM hit GROUP BY l_returnflag, q
        |ORDER BY l_returnflag, q""".stripMargin,

    "q_benford" ->
      // numeric digit extraction (floor(|x|/10^floor(log10|x|))) — both
      // engines' correctly-rounded log10/power make it bit-identical
      """WITH v AS (
        |  SELECT abs(CAST(o_totalprice AS DOUBLE)) AS x FROM orders
        |  WHERE o_totalprice IS NOT NULL AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
        |d AS (SELECT CAST(floor(x / power(10.0, floor(log10(x)))) AS INT) AS digit
        |      FROM v WHERE x > 0 AND NOT isinf(x)),
        |c AS (SELECT digit, count(*) AS n FROM d
        |      WHERE digit BETWEEN 1 AND 9 GROUP BY digit)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) + 1e-9, 6) AS obs_frac,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) + 1e-9, 6) AS exp_frac,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)
        |        - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) + 1e-9, 6) AS deviation
        |FROM c ORDER BY digit""".stripMargin,

    "q_triangles" ->
      // enumeration strategy differs (the oracle uses the simple a<b<c
      // 3-join; the engine uses degree orientation) but the triangle SET
      // is identical — that's the point of the differential
      """WITH li AS (SELECT l_orderkey AS k, l_partkey % 50 AS p FROM lineitem),
        |e AS (SELECT DISTINCT least(x.p, y.p) AS a, greatest(x.p, y.p) AS b
        |      FROM li x JOIN li y ON x.k = y.k AND x.p < y.p),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (
        |  SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |SELECT node, count(*) AS n_triangles
        |FROM corners GROUP BY node ORDER BY node""".stripMargin,

    "q_chi_square" ->
      // margins over the aggregated joint frame, e = (nx·ny)/tot,
      // term = ((n−e)·(n−e))/e, V = sqrt(chi2/(n·mindim)) — the engine's
      // pinned order
      """WITH j AS (SELECT lang AS x, source AS y, count(*) AS n FROM documents
        |           WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT n,
        |        sum(n) OVER (PARTITION BY x) AS nx,
        |        sum(n) OVER (PARTITION BY y) AS ny,
        |        sum(n) OVER () AS tot FROM j),
        |a AS (SELECT
        |        sum(((CAST(n AS DOUBLE) - (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)) / CAST(tot AS DOUBLE))
        |             * (CAST(n AS DOUBLE) - (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)) / CAST(tot AS DOUBLE)))
        |            / ((CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)) / CAST(tot AS DOUBLE))) AS chi2,
        |        CAST(sum(n) AS BIGINT) AS n_rows
        |      FROM w),
        |d AS (SELECT (SELECT count(DISTINCT x) FROM j) AS ra,
        |             (SELECT count(DISTINCT y) FROM j) AS rb)
        |SELECT round(a.chi2 + 1e-9, 6) AS chi2,
        |  CAST((d.ra - 1) * (d.rb - 1) AS BIGINT) AS dof,
        |  CASE WHEN least(d.ra, d.rb) > 1
        |       THEN round(sqrt(a.chi2 / (CAST(a.n_rows AS DOUBLE)
        |                                 * CAST(least(d.ra, d.rb) - 1 AS DOUBLE))) + 1e-9, 6)
        |  END AS cramers_v,
        |  a.n_rows
        |FROM a CROSS JOIN d""".stripMargin,

    "q_k_anonymity" ->
      """WITH g AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
        |           FROM customer GROUP BY 1, 2)
        |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |  count(*) AS n_groups,
        |  min(n) AS min_group_size,
        |  CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
        |  CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT) AS violating_rows,
        |  10 AS k,
        |  min(n) >= 10 AS anonymity_ok
        |FROM g""".stripMargin,

    "q_weighted_sample" ->
      // Efraimidis–Spirakis replay: u = (60-bit md5 prefix + 1)/2^60,
      // es = ln(u)/w; BIGINT→DOUBLE conversion is correctly rounded in
      // both engines, so the keys are bit-identical
      """WITH h AS (
        |  SELECT lang, doc_id, n_chars,
        |    md5('42:' || CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0),
        |s AS (
        |  SELECT lang, doc_id,
        |    ln((CAST(CAST('0x' || substr(hx, 1, 15) AS BIGINT) AS DOUBLE) + 1.0)
        |       / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) AS es
        |  FROM h),
        |r AS (SELECT lang, doc_id, es,
        |        CAST(row_number() OVER (PARTITION BY lang ORDER BY es DESC, doc_id) AS INT) AS rank
        |      FROM s)
        |SELECT lang, doc_id, round(es * 1e6 + 1e-9, 4) AS es_ppm, rank
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin
  )
}
