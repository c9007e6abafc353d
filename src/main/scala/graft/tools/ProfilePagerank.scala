package graft.tools

import org.apache.spark.sql.functions._

/** Timing/plan probe for Graph.pageRank (the most expensive bench
  * headliner): repeats the q_pagerank workload at a given SF dir and
  * prints per-run wall times, so checkpoint-interval / dangling-fold
  * changes can be measured in isolation from the bench harness.
  *
  * Usage: ProfilePagerank [sfDir] [runs] [iterations] [checkpointInterval]
  */
object ProfilePagerank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val iterations = args.lift(2).map(_.toInt).getOrElse(5)
    val ci = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local(appName = "profile-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val edges = graft.queries.QueryUtil.t(spark, sfDir, "lineitem").select(
        col("l_suppkey").cast("long").as("src"),
        (pmod(col("l_partkey"), lit(5000)) + 1000000L).as("dst"))
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = graft.ops.Graph.pageRank(edges, "src", "dst",
          iterations = iterations, checkpointInterval = ci).count()
        println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n nodes, ci=$ci)")
      }
    } finally spark.stop()
  }
}
