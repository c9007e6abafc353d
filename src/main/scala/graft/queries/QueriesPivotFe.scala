package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{FeatureLib, PivotLib}
import QueryUtil._

/** Oracle-backed queries for the pivot library (§2.I) and the
  * feature-engineering surface (§2.K). MLlib-backed members carry
  * LAW-based hard oracles since round 6 (kmeans: nearest-centroid
  * violation counts; pca: projection contraction + auto-k bounds) — the
  * model floats are partitioning-dependent, the laws are not; property
  * specs add the in-JVM checks.
  */
object QueriesPivotFe {

  val queries: Map[String, Q] = Map(
    "q_pivot_table_multi" -> ((s, dir) =>
      PivotLib.pivotTable(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_linestatus",
          "l_quantity", Seq("sum", "avg"), pivotValues = Seq("F", "O"))
        .select(col("l_returnflag"),
          round(col("F_sum"), 3).as("F_sum"), roundf(col("F_avg"), 4).as("F_avg"),
          round(col("O_sum"), 3).as("O_sum"), roundf(col("O_avg"), 4).as("O_avg"))
        .orderBy("l_returnflag")),

    "q_pivot_subtotals" -> ((s, dir) =>
      PivotLib.pivotWithSubtotals(t(s, dir, "orders"), Seq("o_orderstatus", "o_orderpriority"),
          "o_totalprice", "sum")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          round(col("sum_o_totalprice"), 2).as("total"), col("grouping_id").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))),

    "q_crosstab_norm" -> ((s, dir) =>
      PivotLib.crossTab(t(s, dir, "lineitem"), "l_returnflag", "l_linestatus",
          normalize = "index", colValues = Seq("F", "O"))
        .select(col("l_returnflag"), round(col("F"), 6).as("F"), round(col("O"), 6).as("O"))
        .orderBy("l_returnflag")),

    "q_pivot_multi_values" -> ((s, dir) =>
      PivotLib.pivotMultipleValues(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_linestatus",
          Seq("l_quantity", "l_extendedprice"), "sum", pivotValues = Seq("F", "O"))
        .select(col("l_returnflag"),
          round(col("F_sum_l_quantity"), 3).as("F_qty"),
          round(col("F_sum_l_extendedprice"), 2).as("F_price"),
          round(col("O_sum_l_quantity"), 3).as("O_qty"),
          round(col("O_sum_l_extendedprice"), 2).as("O_price"))
        .orderBy("l_returnflag")),

    "q_time_pivot" -> ((s, dir) =>
      PivotLib.timeBasedPivot(
          t(s, dir, "orders").filter(year(col("o_orderdate")) === 1997),
          Seq("o_orderpriority"), "o_orderdate", "quarter", "o_totalprice", "sum")
        .select(col("o_orderpriority"),
          round(col("1997-01-01"), 2).as("q1"), round(col("1997-04-01"), 2).as("q2"),
          round(col("1997-07-01"), 2).as("q3"), round(col("1997-10-01"), 2).as("q4"))
        .orderBy("o_orderpriority")),

    "q_pivot_summary" -> ((s, dir) =>
      PivotLib.pivotSummaryStats(t(s, dir, "part"), Seq("p_brand"), "p_type", "p_retailprice",
          pivotValues = Seq("ECONOMY", "STANDARD"))
        .select(col("p_brand"),
          // pivot yields NULL counts for absent (brand, type) combos — SQL
          // count() yields 0; normalize so sparse SFs don't diverge (and so
          // the parquet column stays integral, not null-forced float)
          coalesce(col("ECONOMY_count"), lit(0L)).as("eco_n"),
          roundf(col("ECONOMY_avg"), 4).as("eco_avg"),
          round(col("ECONOMY_stddev"), 4).as("eco_std"),
          coalesce(col("STANDARD_count"), lit(0L)).as("std_n"),
          roundf(col("STANDARD_avg"), 4).as("std_avg"),
          round(col("STANDARD_stddev"), 4).as("std_std"))
        .orderBy("p_brand")),

    "q_dynamic_pivot" -> ((s, dir) =>
      PivotLib.dynamicPivot(t(s, dir, "customer"), Seq("c_nationkey"), "c_mktsegment",
          "c_acctbal", "avg", prefix = "seg_")
        .select(col("c_nationkey"),
          roundf(col("seg_AUTOMOBILE"), 4).as("seg_AUTOMOBILE"),
          roundf(col("seg_BUILDING"), 4).as("seg_BUILDING"),
          roundf(col("seg_FURNITURE"), 4).as("seg_FURNITURE"),
          roundf(col("seg_HOUSEHOLD"), 4).as("seg_HOUSEHOLD"),
          roundf(col("seg_MACHINERY"), 4).as("seg_MACHINERY"))
        .orderBy("c_nationkey")),

    "q_conditional_pivot" -> ((s, dir) =>
      PivotLib.conditionalPivot(t(s, dir, "lineitem"), "l_quantity > 25",
          Seq("l_returnflag"), "l_linestatus", "l_extendedprice", "count")
        .select(col("l_returnflag"), col("F"), col("O"))
        .orderBy("l_returnflag")),

    "q_poly_features" -> ((s, dir) =>
      FeatureLib.polynomialFeatures(t(s, dir, "part"), Seq("p_size", "p_retailprice"), degree = 2)
        .select(col("p_partkey"),
          col("p_size_pow2"), round(col("p_retailprice_pow2"), 4).as("p_retailprice_pow2"),
          round(col("p_size_x_p_retailprice"), 4).as("p_size_x_p_retailprice"))
        .orderBy("p_partkey")),

    "q_interactions" -> ((s, dir) =>
      FeatureLib.interactionFeatures(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_discount", "l_tax"), "multiply", 3)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity_multiply_l_discount"), 6).as("qty_disc"),
          round(col("l_quantity_multiply_l_tax"), 6).as("qty_tax"),
          round(col("l_discount_multiply_l_tax"), 6).as("disc_tax"))
        // full tiebreakers: duplicate (orderkey, linenumber) pairs exist
        .orderBy("l_orderkey", "l_linenumber", "qty_disc", "qty_tax", "disc_tax")),

    "q_bin_uniform" -> ((s, dir) =>
      FeatureLib.binUniform(t(s, dir, "orders"), "o_totalprice", 10)
        .groupBy("o_totalprice_bin").agg(count(lit(1)).as("n"))
        .orderBy("o_totalprice_bin")),

    "q_bin_quantile" -> ((s, dir) =>
      FeatureLib.binQuantile(t(s, dir, "events"), "value", 4)
        .groupBy("value_qbin").agg(count(lit(1)).as("n"))
        .orderBy("value_qbin")),

    "q_bin_quantile_grouped" -> ((s, dir) =>
      // per-language quartiles of doc length — the grouped form of
      // q_bin_quantile (CCNet-style per-group bucketing); aggregated to
      // (lang, bin) cells so the gate pins both assignment and coverage
      FeatureLib.binQuantileGrouped(t(s, dir, "documents"), "n_chars", 4, Seq("lang"))
        .groupBy("lang", "n_chars_qbin")
        .agg(count(lit(1)).as("n"), min("n_chars").as("lo"), max("n_chars").as("hi"))
        .orderBy("lang", "n_chars_qbin")),

    "q_encode_freq_label" -> ((s, dir) => {
      val f = FeatureLib.encodeFrequency(t(s, dir, "customer"), "c_mktsegment")
      FeatureLib.encodeLabel(f, "c_mktsegment")
        .select(col("c_custkey"), col("c_mktsegment_freq").as("freq"),
          col("c_mktsegment_label").as("label"))
        .orderBy("c_custkey")
    }),

    "q_encode_onehot" -> ((s, dir) =>
      FeatureLib.encodeOneHot(t(s, dir, "customer"), "c_mktsegment",
          Seq("BUILDING", "AUTOMOBILE", "MACHINERY"))
        .select(col("c_custkey"), col("c_mktsegment_BUILDING"), col("c_mktsegment_AUTOMOBILE"),
          col("c_mktsegment_MACHINERY"), col("c_mktsegment_other"))
        .orderBy("c_custkey")),

    "q_text_basic" -> ((s, dir) =>
      FeatureLib.textBasicStats(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("text_char_count"), col("text_word_count"),
          round(col("text_avg_word_length"), 6).as("text_avg_word_length"))
        .orderBy("doc_id")),

    // ---- MLlib model-backed: LAW-gated (VERDICT r5 #2) ----
    // K-means centroids are float-order/partitioning-dependent, so the raw
    // assignment can't be hash-compared — but the nearest-centroid LAW can:
    // kmeansLaw recomputes, per row, whether the model assigned the argmin
    // center (and a legal id), and the oracle pins "every violation count is
    // zero over exactly |table| scored rows". A broken assignment path flips
    // the sums and hard-FAILs the gate.
    "q_fe_kmeans" -> ((s, dir) =>
      FeatureLib.kmeansLaw(t(s, dir, "part"), Seq("p_size", "p_retailprice"), 4)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("not_nearest")).cast("long").as("n_not_nearest"),
          sum(col("bad_cluster_id")).cast("long").as("n_bad_cluster_id"),
          (countDistinct(col("cluster")) <= 4).as("clusters_le_k"))),

    "q_fe_pca" -> ((s, dir) => {
      // LAW gate (round 6, extending VERDICT r5 #2's pattern): PCA
      // components are solver-sign/float-order-dependent, but orthogonal
      // projection is a CONTRACTION — every row's ‖projection‖² must be ≤
      // its standardized feature vector's ‖z‖² (Parseval), with z
      // recomputed in-plan from the same sample-stddev standardization
      // MLlib's StandardScaler applies. The oracle pins "every lineitem
      // row scored, zero contraction violations, k within [1, 4]". A
      // broken scaler, projection, or auto-k path flips the counts.
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val base = t(s, dir, "lineitem")
        .select(("l_orderkey" +: "l_linenumber" +: feats).map(col): _*)
      val p = FeatureLib.pcaFeatures(base, feats, 0.9)
      val stats = base.agg(
        array(feats.map(c => avg(col(c))): _*).as("__mu"),
        array(feats.map(c => stddev_samp(col(c))): _*).as("__sd"))
      val arr = org.apache.spark.ml.functions.vector_to_array(col("pca"))
      val projSq = aggregate(arr, lit(0.0), (acc, x) => acc + x * x)
      val featArr = array(feats.map(c => col(c).cast("double")): _*)
      val zSq = aggregate(
        zip_with(zip_with(featArr, col("__mu"), (x, m) => x - m), col("__sd"),
          (d, sd) => when(sd > 0, d / sd).otherwise(lit(0.0))),
        lit(0.0), (acc, z) => acc + z * z)
      p.crossJoin(broadcast(stats))
        .select(
          when(projSq > zSq * 1.000001 + 1e-6, 1L).otherwise(0L).as("__viol"),
          size(arr).as("__k"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("__viol")).as("n_contraction_violations"),
          (min(col("__k")) >= 1 && max(col("__k")) <= 4).as("k_ok"))
    }),

    "q_fe_kmeans_bin" -> ((s, dir) =>
      // same law gate for the 1-D binning path — binKmeans IS kmeansLaw
      // modulo column renames (round 7: the separate fit path was removed),
      // so this gate exercises the shipped operator's training+assignment;
      // nearest-centroid in 1-D implies the bins are contiguous disjoint
      // intervals, which is the binning contract
      FeatureLib.kmeansLaw(t(s, dir, "orders"), Seq("o_totalprice"), 5)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("not_nearest")).cast("long").as("n_not_nearest"),
          sum(col("bad_cluster_id")).cast("long").as("n_bad_cluster_id"),
          (countDistinct(col("cluster")) <= 5).as("clusters_le_k"))),

    "q_fe_tfidf" -> ((s, dir) => {
      // deterministic sparse-triplet tf-idf (textTfidfTerms) — full DuckDB
      // oracle; the MLlib textTfidf sibling keeps its vector API and is
      // spec-gated (CountVectorizer's equal-count vocab order is engine-
      // internal, so its exact layout cannot be oracle-compared)
      val d = t(s, dir, "documents")
      val per = FeatureLib.textTfidfTerms(d, "text", "doc_id", vocabSize = 100)
        .filter(col("tfidf") =!= 0.0)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("tfidf_nnz"),
          roundf(sqrt(sum(col("tfidf") * col("tfidf"))), 4).as("tfidf_norm"))
      d.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("tfidf_nnz"), lit(0L)).as("tfidf_nnz"),
          coalesce(col("tfidf_norm"), lit(0.0)).as("tfidf_norm"))
        .orderBy("doc_id")
    }),

    "q_fe_dbscan" -> ((s, dir) => {
      // distributed DBSCAN on integer geometry derived from doc_id, so the
      // oracle can replay the whole algorithm (grid pairs → cores → recursive
      // -CTE connected components → border assignment) exactly. Per group of
      // 8 docs, family g%3 builds: a chain where all 8 are core and one
      // cluster; a 5-chain with a border point at distance eps and two noise
      // points; all-noise spread. Groups sit 1000 apart — isolated.
      val d = t(s, dir, "documents").select("doc_id")
      val g = floor(col("doc_id") / 8).cast("long")
      val j = (col("doc_id") % 8).cast("long")
      val x = (g % 100) * 1000 +
        when(g % 3 === 0, j)
          .when(g % 3 === 1,
            when(j <= 4, j).when(j === 5, lit(6L)).when(j === 6, lit(40L)).otherwise(lit(50L)))
          .otherwise(j * 10)
      val y = floor(g / 100).cast("long") * 1000
      val pts = d.withColumn("x", x.cast("double")).withColumn("y", y.cast("double"))
      graft.functions.Dbscan.dbscan(pts, Seq("x", "y"), eps = 2.0, minPts = 3, idCol = "doc_id")
        .select(col("doc_id"), col("x").cast("bigint").as("x"),
          col("y").cast("bigint").as("y"), col("cluster"), col("is_core"))
        .orderBy("doc_id")
    }),

    "q_encode_target" -> ((s, dir) => {
      // smoothed mean encoding of mktsegment against acctbal; BUILDING is
      // nulled out so the null-category group and the all-null-target
      // fallback paths are both on the gate
      val c = t(s, dir, "customer")
        .withColumn("cat", when(col("c_mktsegment") === "BUILDING", lit(null))
          .otherwise(col("c_mktsegment")))
      FeatureLib.encodeTarget(c, "cat", "c_acctbal", smoothing = 20.0)
        .select(col("c_custkey"), roundf(col("cat_target"), 6).as("enc"))
        .orderBy("c_custkey")
    }),

    "q_winsorize" -> ((s, dir) =>
      FeatureLib.winsorize(t(s, dir, "events"), "value", 0.05, 0.95,
          groupCols = Seq("event_type"))
        .select(col("event_id"), roundf(col("value_wins"), 6).as("value_wins"))
        .orderBy("event_id")),

    "q_top_keywords" -> ((s, dir) =>
      FeatureLib.textTopKeywords(t(s, dir, "documents"), "text", "doc_id",
          k = 3, vocabSize = 100)
        .select(col("doc_id"), col("rank"), col("token"),
          roundf(col("tfidf"), 4).as("tfidf"))
        .orderBy("doc_id", "rank")),

    "q_pareto" -> ((s, dir) =>
      // top-3 market segments by customer count + the tail rolled to
      // __other, shares of the grand total
      PivotLib.paretoReport(t(s, dir, "customer"), "c_mktsegment", 3)
        .select(col("c_mktsegment"), col("measure").cast("long").as("n"),
          roundf(col("share"), 6).as("share"), col("rank"))
        .orderBy("rank")),

    "q_graph_clustering" -> ((s, dir) => {
      // same co-order part-bucket graph as q_triangles
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), pmod(col("l_partkey"), lit(50)).as("p"))
      val e = li.alias("x").join(li.alias("y"),
          col("x.k") === col("y.k") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.ops.Graph.clusteringCoefficient(e, "src", "dst")
        .select(col("node"), col("degree"), col("n_triangles"),
          roundf(col("clustering_coeff"), 6).as("cc"))
        .orderBy("node")
    }),

    "q_scale_robust" -> ((s, dir) =>
      FeatureLib.scaleFeatures(t(s, dir, "events"), Seq("value"), "robust",
          groupCols = Seq("event_type"))
        .select(col("event_id"), roundf(col("value_scaled"), 6).as("value_scaled"))
        .orderBy("event_id")),

    "q_scale_minmax" -> ((s, dir) =>
      FeatureLib.scaleFeatures(t(s, dir, "orders"), Seq("o_totalprice"), "minmax")
        .select(col("o_orderkey"), roundf(col("o_totalprice_scaled"), 6).as("sc"))
        .orderBy("o_orderkey")),

    "q_grouping_sets" -> ((s, dir) =>
      // detail + one-key subtotal + grand total in ONE pass (single Expand
      // + aggregate); grouping_id disambiguates the TOTAL label
      PivotLib.groupingSetsAgg(t(s, dir, "lineitem"),
          Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"), Seq.empty),
          Seq(("l_quantity", "sum"), ("l_extendedprice", "avg")))
        .select(col("l_returnflag"), col("l_linestatus"),
          roundf(col("sum_l_quantity"), 4).as("sum_qty"),
          roundf(col("avg_l_extendedprice"), 4).as("avg_price"),
          col("grouping_id").cast("int").as("grouping_id"))
        .orderBy("grouping_id", "l_returnflag", "l_linestatus"))
  )

  val oracle: Map[String, String] = Map(
    // k-means LAW oracles: every row scored, zero nearest-centroid /
    // cluster-id violations, ≤k clusters — see kmeansLaw's scaladoc
    "q_fe_kmeans" ->
      """SELECT count(*) AS n_rows, CAST(0 AS BIGINT) AS n_not_nearest,
        |  CAST(0 AS BIGINT) AS n_bad_cluster_id, TRUE AS clusters_le_k
        |FROM part WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL""".stripMargin,

    "q_fe_pca" ->
      // projection-contraction law: every row scored, zero violations,
      // auto-k within bounds (see the query's scaladoc)
      """SELECT count(*) AS n_rows,
        |  CAST(0 AS BIGINT) AS n_contraction_violations, TRUE AS k_ok
        |FROM lineitem""".stripMargin,
    "q_fe_kmeans_bin" ->
      """SELECT count(*) AS n_rows, CAST(0 AS BIGINT) AS n_not_nearest,
        |  CAST(0 AS BIGINT) AS n_bad_cluster_id, TRUE AS clusters_le_k
        |FROM orders WHERE o_totalprice IS NOT NULL""".stripMargin,

    "q_pivot_table_multi" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END), 3) AS "F_sum",
        |  round(avg(CASE WHEN l_linestatus='F' THEN l_quantity END) + 1e-9, 4) AS "F_avg",
        |  round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END), 3) AS "O_sum",
        |  round(avg(CASE WHEN l_linestatus='O' THEN l_quantity END) + 1e-9, 4) AS "O_avg"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_pivot_subtotals" ->
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus)=1 THEN 'TOTAL' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN GROUPING(o_orderpriority)=1 THEN 'TOTAL' ELSE o_orderpriority END AS o_orderpriority,
        |  round(sum(o_totalprice), 2) AS total,
        |  CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "q_crosstab_norm" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus='F' THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS "F",
        |  round(sum(CASE WHEN l_linestatus='O' THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_pivot_multi_values" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END), 3) AS "F_qty",
        |  round(sum(CASE WHEN l_linestatus='F' THEN l_extendedprice END), 2) AS "F_price",
        |  round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END), 3) AS "O_qty",
        |  round(sum(CASE WHEN l_linestatus='O' THEN l_extendedprice END), 2) AS "O_price"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_time_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN quarter(o_orderdate)=1 THEN o_totalprice END), 2) AS q1,
        |  round(sum(CASE WHEN quarter(o_orderdate)=2 THEN o_totalprice END), 2) AS q2,
        |  round(sum(CASE WHEN quarter(o_orderdate)=3 THEN o_totalprice END), 2) AS q3,
        |  round(sum(CASE WHEN quarter(o_orderdate)=4 THEN o_totalprice END), 2) AS q4
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_pivot_summary" ->
      """SELECT p_brand,
        |  count(CASE WHEN p_type='ECONOMY' THEN p_retailprice END) AS eco_n,
        |  round(avg(CASE WHEN p_type='ECONOMY' THEN p_retailprice END) + 1e-9, 4) AS eco_avg,
        |  round(stddev_samp(CASE WHEN p_type='ECONOMY' THEN p_retailprice END), 4) AS eco_std,
        |  count(CASE WHEN p_type='STANDARD' THEN p_retailprice END) AS std_n,
        |  round(avg(CASE WHEN p_type='STANDARD' THEN p_retailprice END) + 1e-9, 4) AS std_avg,
        |  round(stddev_samp(CASE WHEN p_type='STANDARD' THEN p_retailprice END), 4) AS std_std
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_dynamic_pivot" ->
      """SELECT c_nationkey,
        |  round(avg(CASE WHEN c_mktsegment='AUTOMOBILE' THEN c_acctbal END) + 1e-9, 4) AS seg_AUTOMOBILE,
        |  round(avg(CASE WHEN c_mktsegment='BUILDING' THEN c_acctbal END) + 1e-9, 4) AS seg_BUILDING,
        |  round(avg(CASE WHEN c_mktsegment='FURNITURE' THEN c_acctbal END) + 1e-9, 4) AS seg_FURNITURE,
        |  round(avg(CASE WHEN c_mktsegment='HOUSEHOLD' THEN c_acctbal END) + 1e-9, 4) AS seg_HOUSEHOLD,
        |  round(avg(CASE WHEN c_mktsegment='MACHINERY' THEN c_acctbal END) + 1e-9, 4) AS seg_MACHINERY
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_conditional_pivot" ->
      """SELECT l_returnflag,
        |  count(CASE WHEN l_linestatus='F' THEN l_extendedprice END) AS "F",
        |  count(CASE WHEN l_linestatus='O' THEN l_extendedprice END) AS "O"
        |FROM lineitem WHERE l_quantity > 25
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_poly_features" ->
      """SELECT p_partkey,
        |  pow(p_size, 2) AS p_size_pow2,
        |  round(pow(p_retailprice, 2), 4) AS p_retailprice_pow2,
        |  round(p_size * p_retailprice, 4) AS p_size_x_p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_interactions" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_quantity * l_discount, 6) AS qty_disc,
        |  round(l_quantity * l_tax, 6) AS qty_tax,
        |  round(l_discount * l_tax, 6) AS disc_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, qty_disc, qty_tax, disc_tax""".stripMargin,

    "q_bin_uniform" ->
      """WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
        |SELECT CAST(least(greatest(floor((o_totalprice - mn) / ((mx - mn) / 10)), 0), 9) AS INT)
        |         AS o_totalprice_bin,
        |  count(*) AS n
        |FROM orders, s GROUP BY 1 ORDER BY o_totalprice_bin""".stripMargin,

    "q_bin_quantile" ->
      """WITH s AS (SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.5) AS q2,
        |                  quantile_cont(value, 0.75) AS q3 FROM events)
        |SELECT CAST((CASE WHEN value > q1 THEN 1 ELSE 0 END) +
        |            (CASE WHEN value > q2 THEN 1 ELSE 0 END) +
        |            (CASE WHEN value > q3 THEN 1 ELSE 0 END) AS INT) AS value_qbin,
        |  count(*) AS n
        |FROM events, s GROUP BY 1 ORDER BY value_qbin""".stripMargin,

    "q_bin_quantile_grouped" ->
      // quantile_cont = Spark's exact percentile (same (n-1)·p linear
      // interpolation); integer n_chars vs interpolated double cuts keeps
      // the > comparisons off ulp boundaries
      """WITH s AS (
        |  SELECT lang, quantile_cont(n_chars, 0.25) AS q1,
        |         quantile_cont(n_chars, 0.5) AS q2,
        |         quantile_cont(n_chars, 0.75) AS q3
        |  FROM documents GROUP BY lang)
        |SELECT d.lang,
        |  CAST((CASE WHEN d.n_chars > s.q1 THEN 1 ELSE 0 END) +
        |       (CASE WHEN d.n_chars > s.q2 THEN 1 ELSE 0 END) +
        |       (CASE WHEN d.n_chars > s.q3 THEN 1 ELSE 0 END) AS INT) AS n_chars_qbin,
        |  count(*) AS n, min(d.n_chars) AS lo, max(d.n_chars) AS hi
        |FROM documents d JOIN s USING (lang)
        |GROUP BY 1, 2 ORDER BY d.lang, n_chars_qbin""".stripMargin,

    "q_encode_freq_label" ->
      """SELECT c_custkey,
        |  count(*) OVER (PARTITION BY c_mktsegment) AS freq,
        |  CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS INT) AS label
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_encode_onehot" ->
      """SELECT c_custkey,
        |  CASE WHEN c_mktsegment='BUILDING' THEN 1 ELSE 0 END AS c_mktsegment_BUILDING,
        |  CASE WHEN c_mktsegment='AUTOMOBILE' THEN 1 ELSE 0 END AS c_mktsegment_AUTOMOBILE,
        |  CASE WHEN c_mktsegment='MACHINERY' THEN 1 ELSE 0 END AS c_mktsegment_MACHINERY,
        |  CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY') THEN 0 ELSE 1 END AS c_mktsegment_other
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_text_basic" ->
      // run-count token spec (non-empty elements of the \s+ split), matching
      // tokenCountWs on the engine side; nullif guard for token-free text
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS text_char_count,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS INT) AS text_word_count,
        |  round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0 /
        |        nullif(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')), 0), 6)
        |    AS text_avg_word_length
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fe_tfidf" ->
      // deterministic tf-idf contract (textTfidfTerms): whitespace-dialect
      // tokens, vocab = top-100 by corpus tf (ties → token asc),
      // idf = ln((N+1)/(df+1)); zero-token docs come back (0, 0.0)
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
        |       WHERE token <> '' GROUP BY 1, 2),
        |vocab AS (SELECT token, sum(tf) AS total, count(*) AS dfreq FROM tf
        |          GROUP BY 1 ORDER BY total DESC, token ASC LIMIT 100),
        |n AS (SELECT count(*) AS nd FROM documents),
        |w AS (SELECT tf.doc_id, tf.tf * ln((nd + 1.0) / (dfreq + 1.0)) AS tfidf
        |      FROM tf JOIN vocab USING (token) CROSS JOIN n),
        |per AS (SELECT doc_id, count(*) AS tfidf_nnz,
        |          round(sqrt(sum(tfidf * tfidf)) + 1e-9, 4) AS tfidf_norm
        |        FROM w WHERE tfidf <> 0 GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(per.tfidf_nnz, 0) AS tfidf_nnz,
        |  coalesce(per.tfidf_norm, 0.0) AS tfidf_norm
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_fe_dbscan" ->
      // full DBSCAN replay: eps-pairs via a banded self-join (the BETWEEN
      // mirrors the engine's grid cells; dist^2 <= eps^2 is the real rule),
      // core = degree+1 >= minPts, clusters = min-id connected components
      // via a RECURSIVE CTE over core-core edges, border = min cluster
      // among core neighbors, noise = -1
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id // 8 AS g, doc_id % 8 AS j FROM documents),
        |pts AS (SELECT doc_id AS id,
        |  CAST((g % 100) * 1000 + CASE g % 3
        |    WHEN 0 THEN j
        |    WHEN 1 THEN CASE WHEN j <= 4 THEN j WHEN j = 5 THEN 6
        |                     WHEN j = 6 THEN 40 ELSE 50 END
        |    ELSE j * 10 END AS BIGINT) AS x,
        |  CAST((g // 100) * 1000 AS BIGINT) AS y FROM d),
        |pairs AS (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
        |  ON b.x BETWEEN a.x - 2 AND a.x + 2 AND a.id < b.id
        |  AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 4),
        |deg AS (SELECT id, count(*) AS nbrs FROM (
        |    SELECT ia AS id FROM pairs UNION ALL SELECT ib FROM pairs) GROUP BY id),
        |core AS (SELECT p.id FROM pts p LEFT JOIN deg ON deg.id = p.id
        |         WHERE coalesce(deg.nbrs, 0) + 1 >= 3),
        |sym AS (SELECT ia AS src, ib AS dst FROM pairs
        |        WHERE ia IN (SELECT id FROM core) AND ib IN (SELECT id FROM core)
        |        UNION ALL
        |        SELECT ib, ia FROM pairs
        |        WHERE ia IN (SELECT id FROM core) AND ib IN (SELECT id FROM core)),
        |reach AS (SELECT id AS node, id AS label FROM core
        |          UNION
        |          SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node),
        |clab AS (SELECT node AS id, min(label) AS cluster FROM reach GROUP BY node),
        |border AS (SELECT e.nid AS id, min(c.cluster) AS cluster FROM (
        |    SELECT ia AS nid, ib AS cid FROM pairs
        |    UNION ALL SELECT ib, ia FROM pairs) e
        |    JOIN clab c ON c.id = e.cid
        |  WHERE e.nid NOT IN (SELECT id FROM core) GROUP BY e.nid)
        |SELECT p.id AS doc_id, p.x, p.y,
        |  CAST(coalesce(cl.cluster, b.cluster, -1) AS BIGINT) AS cluster,
        |  (cr.id IS NOT NULL) AS is_core
        |FROM pts p
        |LEFT JOIN clab cl ON cl.id = p.id
        |LEFT JOIN border b ON b.id = p.id
        |LEFT JOIN core cr ON cr.id = p.id
        |ORDER BY doc_id""".stripMargin,

    "q_encode_target" ->
      // replay: per-category (n over non-null targets, mean), prior from
      // the stats frame (Σ n·mean / Σ n), smoothed blend m=20. The
      // numerator term order matches the engine's IEEE evaluation.
      """WITH base AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS cat,
        |    c_acctbal
        |  FROM customer),
        |s AS (SELECT cat, count(c_acctbal) AS n, avg(c_acctbal) AS mean
        |      FROM base GROUP BY cat),
        |p AS (SELECT sum(n * coalesce(mean, 0)) / sum(n) AS prior FROM s)
        |SELECT b.c_custkey,
        |  round((s.n * coalesce(s.mean, 0) + 20 * p.prior) / (s.n + 20) + 1e-9, 6) AS enc
        |FROM base b
        |LEFT JOIN s ON b.cat IS NOT DISTINCT FROM s.cat
        |CROSS JOIN p
        |ORDER BY c_custkey""".stripMargin,

    "q_winsorize" ->
      // quantile_cont = Spark's exact percentile; clip is row-local.
      // Explicit null guard: DuckDB least/greatest skip nulls while the
      // engine keeps null values null.
      """WITH s AS (SELECT event_type,
        |             quantile_cont(value, 0.05) AS lo,
        |             quantile_cont(value, 0.95) AS hi
        |           FROM events GROUP BY event_type)
        |SELECT e.event_id,
        |  CASE WHEN e.value IS NOT NULL
        |       THEN round(least(greatest(e.value, s.lo), s.hi) + 1e-9, 6) END AS value_wins
        |FROM events e LEFT JOIN s ON e.event_type IS NOT DISTINCT FROM s.event_type
        |ORDER BY event_id""".stripMargin,

    "q_top_keywords" ->
      // same tf-idf contract as q_fe_tfidf, read as per-doc top-3 with
      // (tfidf DESC, token) ranking — tfidf doubles are bit-identical in
      // both engines (integer tf/df/N through the same IEEE ops)
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
        |       WHERE token <> '' GROUP BY 1, 2),
        |vocab AS (SELECT token, sum(tf) AS total, count(*) AS dfreq FROM tf
        |          GROUP BY 1 ORDER BY total DESC, token ASC LIMIT 100),
        |n AS (SELECT count(*) AS nd FROM documents),
        |w AS (SELECT tf.doc_id, tf.token,
        |        tf.tf * ln((nd + 1.0) / (dfreq + 1.0)) AS tfidf
        |      FROM tf JOIN vocab USING (token) CROSS JOIN n),
        |r AS (SELECT doc_id, token, tfidf,
        |        CAST(row_number() OVER (PARTITION BY doc_id
        |          ORDER BY tfidf DESC, token ASC) AS INT) AS rank
        |      FROM w WHERE tfidf > 0)
        |SELECT doc_id, rank, token, round(tfidf + 1e-9, 4) AS tfidf
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_pareto" ->
      """WITH c AS (SELECT c_mktsegment AS k, CAST(count(*) AS DOUBLE) AS m
        |           FROM customer GROUP BY 1),
        |top AS (SELECT k, m FROM c ORDER BY m DESC, k LIMIT 3),
        |rest AS (SELECT '__other' AS k, sum(m) AS m FROM c
        |         WHERE k NOT IN (SELECT k FROM top) HAVING sum(m) > 0),
        |u AS (SELECT k, m FROM top UNION ALL SELECT k, m FROM rest),
        |r AS (SELECT k, m, m / sum(m) OVER () AS share,
        |        CAST(row_number() OVER (
        |          ORDER BY (CASE WHEN k = '__other' THEN 1 ELSE 0 END), m DESC, k) AS INT) AS rank
        |      FROM u)
        |SELECT k AS c_mktsegment, CAST(m AS BIGINT) AS n,
        |  round(share + 1e-9, 6) AS share, rank
        |FROM r ORDER BY rank""".stripMargin,

    "q_graph_clustering" ->
      """WITH li AS (SELECT l_orderkey AS k, l_partkey % 50 AS p FROM lineitem),
        |e AS (SELECT DISTINCT least(x.p, y.p) AS a, greatest(x.p, y.p) AS b
        |      FROM li x JOIN li y ON x.k = y.k AND x.p < y.p),
        |deg AS (SELECT node, count(*) AS degree FROM (
        |          SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tc AS (SELECT node, count(*) AS n_triangles FROM (
        |         SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        |         UNION ALL SELECT z FROM tri) GROUP BY node)
        |SELECT d.node, d.degree, coalesce(tc.n_triangles, 0) AS n_triangles,
        |  CASE WHEN d.degree > 1
        |       THEN round((2.0 * coalesce(tc.n_triangles, 0))
        |                  / CAST(d.degree * (d.degree - 1) AS DOUBLE) + 1e-9, 6)
        |       ELSE 0.0 END AS cc
        |FROM deg d LEFT JOIN tc ON tc.node = d.node
        |ORDER BY d.node""".stripMargin,

    "q_scale_robust" ->
      // (x − median)/IQR with exact quantile_cont stats; the engine's
      // subtraction/division order replayed term by term
      """WITH s AS (SELECT event_type,
        |             quantile_cont(value, 0.5) AS med,
        |             quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
        |           FROM events GROUP BY event_type)
        |SELECT e.event_id,
        |  CASE WHEN e.value IS NOT NULL AND s.iqr > 0
        |       THEN round((e.value - s.med) / s.iqr + 1e-9, 6) END AS value_scaled
        |FROM events e LEFT JOIN s ON e.event_type IS NOT DISTINCT FROM s.event_type
        |ORDER BY event_id""".stripMargin,

    "q_scale_minmax" ->
      """WITH s AS (SELECT CAST(min(o_totalprice) AS DOUBLE) AS mn,
        |                  CAST(max(o_totalprice) AS DOUBLE) AS mx FROM orders)
        |SELECT o.o_orderkey,
        |  CASE WHEN o.o_totalprice IS NOT NULL AND s.mx > s.mn
        |       THEN round((o.o_totalprice - s.mn) / (s.mx - s.mn) + 1e-9, 6) END AS sc
        |FROM orders o CROSS JOIN s
        |ORDER BY o_orderkey""".stripMargin,

    "q_grouping_sets" ->
      // GROUPING(a, b) packs bits in argument order in both engines
      // (first argument = highest bit), matching Spark's grouping_id()
      """SELECT
        |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'TOTAL' ELSE l_returnflag END AS l_returnflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'TOTAL' ELSE l_linestatus END AS l_linestatus,
        |  round(sum(l_quantity) + 1e-9, 4) AS sum_qty,
        |  round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS grouping_id
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY grouping_id, l_returnflag, l_linestatus""".stripMargin
  )
}
