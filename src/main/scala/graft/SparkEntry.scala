package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full oracle-gated operator registry, one entry per
  * implemented operator from SURVEY.md §2 (plus the beyond-reference
  * LLM-data ops). `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible entry; hash-based/model-based ops are rows-only and
  * property-tested in src/test/scala.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q3-shaped: 3-way join, derived measure, grouped agg, top-k.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesWindow.queries ++ QueriesAgg.queries ++
      QueriesTime.queries ++ QueriesPivotFe.queries ++ QueriesText.queries ++
      QueriesLaws.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops → driver
    * records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueriesCore.oracle ++ QueriesWindow.oracle ++ QueriesAgg.oracle ++
      QueriesTime.oracle ++ QueriesPivotFe.oracle ++ QueriesText.oracle ++
      QueriesLaws.oracle
}
