package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for web-curation pipelines: degree statistics and
  * PageRank. Crawl-derived quality signals (a page's link authority is a
  * classic training-data quality prior — pages nobody links to skew spam)
  * need exactly these two primitives over the (src, dst) edge relation that
  * UrlLib.registeredDomain extraction produces from a crawl.
  *
  * Scale shape: every step is an equi-join/groupBy on node ids (one shuffle
  * each); the rank state is |nodes| rows, never |edges|; per-iteration
  * `localCheckpoint` truncates the lineage so the plan stays O(1) deep and
  * the dangling-mass scalar reads the materialized state, not a replay of
  * the whole iteration history (the clusterCandidates lesson, NOTES_r05).
  */
object Graph {

  /** Per-node out/in degrees over the DISTINCT edge relation. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outd = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_degree"))
    val ind = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_degree"))
    nodes.join(outd, Seq("node"), "left").join(ind, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }

  /** PageRank with uniform dangling-mass redistribution:
    * r(v) = (1−d)/N + d·(Σ_{u→v} r(u)/outdeg(u) + dangling/N), iterated a
    * fixed number of rounds from the uniform vector over the DISTINCT
    * simple graph. The dangling scalar is a one-row aggregate per round
    * over the materialized |nodes|-sized state (scalar-broadcast pattern);
    * folding it in as a driver literal keeps every per-row expression
    * codegen-able and the whole computation engine-replayable.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"pageRank: damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val outd = e.groupBy("src").agg(count(lit(1)).as("outd")).localCheckpoint()
    val eDeg = e.join(outd, Seq("src")).localCheckpoint()

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iterations) {
      // mass sitting on nodes with no out-edges, redistributed uniformly;
      // ranks is materialized (localCheckpoint), so this one-row job reads
      // state, not the iteration history
      val dangling = ranks.join(outd, ranks("node") === outd("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("outd")).as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("__contrib"), lit(0.0)) + lit(dangling / n))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
