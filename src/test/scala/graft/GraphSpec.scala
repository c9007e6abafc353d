package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("degrees: out/in per node over the distinct simple graph") {
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d") // dup edge collapses
    val out = Graph.degrees(e, "s", "d").orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }

  test("pageRank conserves total mass and handles dangling nodes (hand calc)") {
    // a -> b, b dangling. N=2: r1(a) = 0.15/2 + 0.85*(0 + 0.5/2) = 0.2875,
    // r1(b) = 0.15/2 + 0.85*(0.5 + 0.5/2) = 0.7125
    val e = Seq(("a", "b")).toDF("s", "d")
    val r1 = Graph.pageRank(e, "s", "d", iterations = 1)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(math.abs(r1(0)._2 - 0.2875) < 1e-12 && r1(0)._1 == "a")
    assert(math.abs(r1(1)._2 - 0.7125) < 1e-12)

    val r5 = Graph.pageRank(e, "s", "d", iterations = 5)
      .agg(sum("rank")).head().getDouble(0)
    assert(math.abs(r5 - 1.0) < 1e-9, s"mass must be conserved, got $r5")
  }

  test("pageRank: a cycle stays exactly uniform; authority ranks above orphans") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = Graph.pageRank(cycle, "s", "d", iterations = 7)
      .select("rank").as[Double].collect()
    r.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))

    // hub: everyone links to node 99
    val hub = Seq((1L, 99L), (2L, 99L), (3L, 99L), (1L, 2L)).toDF("s", "d")
    val byNode = Graph.pageRank(hub, "s", "d", iterations = 10)
      .as[(Long, Double)].collect().toMap
    assert(byNode(99L) > byNode(2L) && byNode(2L) > byNode(3L))
  }

  test("triangleCounts: K4 has C(3,2)=3 per node; direction/dup/self-loop insensitive") {
    // K4 on {1..4}, given messy: duplicates, both directions, a self-loop,
    // and a pendant node 5 in no triangle
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 4L), (4L, 4L), (4L, 5L)).toDF("s", "d")
    val m = Graph.triangleCounts(e, "s", "d")
      .as[(Long, Long)].collect().toMap
    // each K4 node sits in C(3,2) = 3 triangles
    assert((1L to 4L).forall(m(_) == 3L), s"got $m")
    assert(!m.contains(5L), "pendant node is in no triangle")
    // global count = Σ/3 = 4 triangles in K4
    assert(m.values.sum == 12L)
    // a pure star has zero triangles
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    assert(Graph.triangleCounts(star, "s", "d").count() == 0)
  }

  test("pageRank releases every intermediate checkpoint — only the result's blocks survive") {
    // the 100x scale-stress regression class: edge-sized checkpoint blocks
    // (e, eDeg, superseded rank generations) accumulating in storage and
    // starving the iteration aggregations. The contract: after pageRank
    // returns, at most ONE persisted RDD (the returned ranks) exists per
    // call, and repeated calls do not accumulate.
    def persistedCount(): Int =
      spark.sparkContext.getPersistentRDDs.count { case (_, r) => r.getStorageLevel.useMemory || r.getStorageLevel.useDisk }
    val before = persistedCount()
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val r1 = Graph.pageRank(e, "s", "d", iterations = 3)
    assert(r1.count() == 4)
    val afterOne = persistedCount()
    assert(afterOne <= before + 1,
      s"pageRank must leave at most its result persisted: before=$before after=$afterOne")
    val r2 = Graph.pageRank(e, "s", "d", iterations = 3)
    assert(r2.count() == 4)
    assert(persistedCount() <= before + 2,
      s"repeated pageRank calls must not accumulate checkpoint blocks")
  }

  test("clusteringCoefficient: clique 1.0, star hub 0.0, triangle-plus-pendant hand case") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d") // triangle + pendant 4
    val m = Graph.clusteringCoefficient(e, "s", "d")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L) == ((2L, 1L, 1.0)))
    assert(m(2L) == ((2L, 1L, 1.0)))
    assert(m(3L) == ((3L, 1L, 2.0 * 1 / (3 * 2))), "deg-3 node in one triangle: cc = 1/3")
    assert(m(4L) == ((1L, 0L, 0.0)), "degree-1 node has cc 0, not a divide error")
  }
}
