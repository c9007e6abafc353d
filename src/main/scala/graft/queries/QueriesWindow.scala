package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.WindowLib
import QueryUtil._

/** Oracle-backed queries for the window-function library (§2.E) — one per
  * function family, DuckDB-verifiable (it speaks the full ANSI window set).
  */
object QueriesWindow {

  val queries: Map[String, Q] = Map(
    "q_win_row_number" -> ((s, dir) => {
      val w = WindowLib.spec(Seq("l_orderkey"), Seq("l_linenumber" -> true))
      t(s, dir, "lineitem")
        .withColumn("rn", WindowLib.rowNumber(w))
        .select("l_orderkey", "l_linenumber", "rn")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_win_ranks" -> ((s, dir) => {
      val w = WindowLib.spec(Seq("s_nationkey"), Seq("s_acctbal" -> false, "s_suppkey" -> true))
      t(s, dir, "supplier")
        .withColumn("rnk", WindowLib.rankMin(w))
        .withColumn("drnk", WindowLib.denseRank(w))
        .withColumn("prnk", round(WindowLib.percentRank(w), 6))
        .select("s_suppkey", "s_nationkey", "s_acctbal", "rnk", "drnk", "prnk")
        .orderBy("s_suppkey")
    }),

    "q_win_ntile" -> ((s, dir) => {
      val w = WindowLib.spec(Seq("c_mktsegment"), Seq("c_acctbal" -> true, "c_custkey" -> true))
      t(s, dir, "customer")
        .withColumn("quartile", WindowLib.ntileN(4, w))
        .select("c_custkey", "c_mktsegment", "quartile")
        .orderBy("c_custkey")
    }),

    "q_win_lag_lead" -> ((s, dir) => {
      val w = WindowLib.spec(Seq("o_custkey"), Seq("o_orderdate" -> true, "o_orderkey" -> true))
      t(s, dir, "orders")
        .withColumn("prev_price", WindowLib.lagCol("o_totalprice", 1, null, w))
        .withColumn("next_price", WindowLib.leadCol("o_totalprice", 1, null, w))
        .withColumn("prev2_price", WindowLib.lagCol("o_totalprice", 2, -1.0, w))
        .select("o_orderkey", "o_custkey", "o_totalprice", "prev_price", "next_price", "prev2_price")
        .orderBy("o_orderkey")
    }),

    "q_win_first_last_nth" -> ((s, dir) => {
      val w = WindowLib.spec(Seq("o_custkey"), Seq("o_orderdate" -> true, "o_orderkey" -> true))
      t(s, dir, "orders")
        .withColumn("first_price", WindowLib.firstValue("o_totalprice", w))
        .withColumn("last_price", WindowLib.lastValue("o_totalprice", w))
        .withColumn("second_price", WindowLib.nthValue("o_totalprice", 2, w))
        .select("o_orderkey", "o_custkey", "first_price", "last_price", "second_price")
        .orderBy("o_orderkey")
    }),

    "q_win_running" -> ((s, dir) => {
      // l_quantity/l_extendedprice tiebreakers: sf0.1 has rows sharing the
      // full (shipdate, orderkey, linenumber) key, and a non-total ordering
      // makes window contents engine-arbitrary (caught by the sf0.1 gate)
      val w = WindowLib.spec(Seq("l_suppkey"), Seq("l_shipdate" -> true, "l_orderkey" -> true,
        "l_linenumber" -> true, "l_quantity" -> true, "l_extendedprice" -> true))
      t(s, dir, "lineitem")
        .withColumn("run_sum", round(WindowLib.runningSum("l_quantity", w), 3))
        .withColumn("run_avg", roundf(WindowLib.runningAvg("l_quantity", w), 4))
        .select("l_orderkey", "l_linenumber", "l_suppkey", "run_sum", "run_avg")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_win_moving" -> ((s, dir) => {
      // l_quantity/l_extendedprice tiebreakers: sf0.1 has rows sharing the
      // full (shipdate, orderkey, linenumber) key, and a non-total ordering
      // makes window contents engine-arbitrary (caught by the sf0.1 gate)
      val w = WindowLib.spec(Seq("l_suppkey"), Seq("l_shipdate" -> true, "l_orderkey" -> true,
        "l_linenumber" -> true, "l_quantity" -> true, "l_extendedprice" -> true))
      t(s, dir, "lineitem")
        .withColumn("mov_avg", roundf(WindowLib.movingAverage("l_quantity", 5, 3, w), 4))
        .withColumn("mov_sum", round(WindowLib.movingSum("l_quantity", 5, 1, w), 3))
        .select("l_orderkey", "l_linenumber", "l_suppkey", "mov_avg", "mov_sum")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_win_cume_dist" -> ((s, dir) => {
      val w = WindowLib.spec(Seq("s_nationkey"), Seq("s_acctbal" -> true, "s_suppkey" -> true))
      t(s, dir, "supplier")
        .withColumn("cd", round(WindowLib.cumeDist(w), 6))
        .select("s_suppkey", "s_nationkey", "cd")
        .orderBy("s_suppkey")
    }),

    "q_win_range_frame" -> ((s, dir) => {
      // RANGE frame over a numeric ordering: peers within 500 acctbal below
      val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal"))
        .rangeBetween(-500L, 0L)
      t(s, dir, "supplier")
        .withColumn("n_within_500", count(lit(1)).over(w))
        .withColumn("sum_within_500", round(sum(col("s_acctbal")).over(w), 2))
        .select("s_suppkey", "s_nationkey", "s_acctbal", "n_within_500", "sum_within_500")
        .orderBy("s_suppkey")
    }),

    "q_win_agg_over" -> ((s, dir) => {
      // plain aggregate over an unordered partition window (agg broadcast onto rows)
      val w = Window.partitionBy(col("o_custkey"))
      t(s, dir, "orders")
        .withColumn("cust_total", round(sum(col("o_totalprice")).over(w), 2))
        .withColumn("cust_n", count(lit(1)).over(w))
        .withColumn("share", round(col("o_totalprice") / col("cust_total"), 6))
        .select("o_orderkey", "o_custkey", "cust_total", "cust_n", "share")
        .orderBy("o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_row_number" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS INT) AS rn
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_win_ranks" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_win_lag_lead" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  lag(o_totalprice, 2, -1.0) OVER w AS prev2_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_first_last_nth" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_running" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |  round(sum(l_quantity) OVER w, 3) AS run_sum,
        |  round(avg(l_quantity) OVER w + 1e-9, 4) AS run_avg
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_win_moving" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |  round(CASE WHEN count(l_quantity) OVER w >= 3 THEN avg(l_quantity) OVER w END + 1e-9, 4) AS mov_avg,
        |  round(sum(l_quantity) OVER w, 3) AS mov_sum
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_win_cume_dist" ->
      """SELECT s_suppkey, s_nationkey,
        |  round(cume_dist() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey), 6) AS cd
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q_win_range_frame" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        |  count(*) OVER w AS n_within_500,
        |  round(sum(s_acctbal) OVER w, 2) AS sum_within_500
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal
        |             RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
        |ORDER BY s_suppkey""".stripMargin,

    "q_win_agg_over" ->
      """SELECT o_orderkey, o_custkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey), 2) AS cust_total,
        |  count(*) OVER (PARTITION BY o_custkey) AS cust_n,
        |  round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_custkey), 6) AS share
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
