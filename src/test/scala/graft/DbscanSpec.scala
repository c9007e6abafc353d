package graft

import org.apache.spark.sql.functions._
import graft.functions.Dbscan

class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int,
                  maxLocalPairs: Long = 2000000L) =
    Dbscan.dbscan(pts.toDF("id", "x", "y"), Seq("x", "y"), eps, minPts, "id",
        maxLocalPairs = maxLocalPairs)
      .select("id", "cluster", "is_core").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

  /** Same rules, O(n^2), driver-side: core = |eps-ball| >= minPts (point
    * included); clusters = min-id connected component over core-core
    * edges; border = min cluster among core neighbors; noise = -1.
    */
  private def brute(pts: Map[Long, Seq[Double]], eps: Double, minPts: Int): Map[Long, (Long, Boolean)] = {
    val ids = pts.keys.toSeq.sorted
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum
    val nbrs = ids.map(i => i -> ids.filter(j => j != i && d2(pts(i), pts(j)) <= eps * eps)).toMap
    val core = ids.filter(i => nbrs(i).size + 1 >= minPts).toSet
    val parent = scala.collection.mutable.Map(core.toSeq.map(i => i -> i): _*)
    def find(i: Long): Long = { if (parent(i) != i) parent(i) = find(parent(i)); parent(i) }
    for (i <- core; j <- nbrs(i) if core(j)) {
      val (a, b) = (find(i), find(j))
      if (a != b) parent(math.max(a, b)) = math.min(a, b) // root stays the min id
    }
    ids.map { i =>
      if (core(i)) i -> (find(i), true)
      else {
        val cn = nbrs(i).filter(core)
        i -> (if (cn.nonEmpty) (cn.map(find).min, false) else (-1L, false))
      }
    }.toMap
  }

  test("known geometry: chain cluster, border point, noise") {
    // ids 0-7: collinear spacing 1 (all core at eps=2,minPts=3, one cluster);
    // 10-15: 5-chain + border at distance 2 from the end core;
    // 20-21: isolated pair -> noise (each degree 1+1 < 3)
    val pts = Seq[(Long, Double, Double)](
      (0L, 0, 0), (1L, 1, 0), (2L, 2, 0), (3L, 3, 0), (4L, 4, 0), (5L, 5, 0), (6L, 6, 0), (7L, 7, 0),
      (10L, 100, 0), (11L, 101, 0), (12L, 102, 0), (13L, 103, 0), (14L, 104, 0), (15L, 106, 0),
      (20L, 200, 0), (21L, 210, 0))
    val got = run(pts, eps = 2.0, minPts = 3)
    (0L to 7L).foreach(i => assert(got(i) == (0L, true), s"id $i"))
    (10L to 14L).foreach(i => assert(got(i) == (10L, true), s"id $i"))
    assert(got(15L) == (10L, false), "border point joins the cluster, not core")
    assert(got(20L) == (-1L, false) && got(21L) == (-1L, false), "noise")
  }

  test("differential vs brute force on mixed-density points") {
    // deterministic LCG layout in [0,25)^2 (a multiplicative hash makes a
    // lattice — no clusters ever form); at eps=1.2 this mix has 32 cores /
    // 18 borders / 100 noise at minPts=3 and 2/8/140 at minPts=5
    var s = 1L
    def nxt(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11) % 2500L) / 100.0
    }
    val pts = (0L until 150L).map(i => (i, nxt(), nxt()))
    val m = pts.map { case (i, x, y) => i -> Seq(x, y) }.toMap
    for (minPts <- Seq(3, 5)) {
      val expect = brute(m, 1.2, minPts)
      val local = run(pts, 1.2, minPts)                       // driver union-find path
      val dist = run(pts, 1.2, minPts, maxLocalPairs = 0L)    // distributed path
      assert(local == expect, s"local path, minPts=$minPts")
      assert(dist == expect, s"distributed path, minPts=$minPts")
      val kinds = expect.values.groupBy { case (c, core) =>
        if (core) "core" else if (c >= 0) "border" else "noise" }.map { case (k, v) => k -> v.size }
      assert(kinds.keySet == Set("core", "border", "noise"),
        s"layout must exercise all three point kinds, got $kinds")
    }
  }

  test("border point between two clusters takes the min cluster id") {
    // two 4-point blobs 8 apart; id 99 sits exactly eps from one core of
    // each but reaches only 2 cores -> not core itself at minPts=4, so it
    // is a border of BOTH clusters (deterministic min rule — sklearn would
    // pick by scan order)
    val blob1 = Seq[(Long, Double, Double)]((1L, 0, 0), (2L, 1, 0), (3L, 0, 1), (4L, 0.5, 0.5))
    val blob2 = Seq[(Long, Double, Double)]((11L, 8, 0), (12L, 7, 0), (13L, 8, 1), (14L, 7.5, 0.5))
    val between = (99L, 4.0, 0.0)
    val got = run(blob1 ++ blob2 :+ between, eps = 3.0, minPts = 4)
    assert(got(1L) == (1L, true) && got(11L) == (11L, true))
    assert(got(99L) == (1L, false))
  }

  test("minPts=1: every point is core; singletons cluster alone") {
    val got = run(Seq((5L, 0.0, 0.0), (9L, 100.0, 0.0), (7L, 0.5, 0.0)), eps = 1.0, minPts = 1)
    assert(got(5L) == (5L, true) && got(7L) == (5L, true))
    assert(got(9L) == (9L, true), "isolated core = its own cluster, not noise")
  }

  test("3 dimensions and null coordinates (null -> 0.0, fillna parity)") {
    val df = Seq(
      (1L, Some(0.0), Some(0.0), Some(0.0)),
      (2L, Some(1.0), Some(1.0), Some(1.0)),
      (3L, None, None, None),              // = origin after fill
      (4L, Some(50.0), Some(50.0), Some(50.0))
    ).toDF("id", "x", "y", "z")
    val got = Dbscan.dbscan(df, Seq("x", "y", "z"), eps = 2.0, minPts = 2, "id")
      .select("id", "cluster", "is_core").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (1L, true) && got(2L) == (1L, true) && got(3L) == (1L, true))
    assert(got(4L) == (-1L, false))
  }

  test("input already carrying cluster_id/is_core columns does not collide") {
    // e.g. a kmeans clusteringFeatures pass piped into dbscan — the label
    // join must use internal names, not the bare cluster_id/is_core
    val df = Seq((1L, 0.0, 7L, false), (2L, 0.5, 8L, true), (3L, 50.0, 9L, false))
      .toDF("id", "x", "cluster_id", "is_core")
    val out = Dbscan.dbscan(df, Seq("x"), eps = 1.0, minPts = 2, idCol = "id")
      .select("id", "cluster", "is_core", "cluster_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out(1L) == ((1L, true, 7L)) && out(2L) == ((1L, true, 8L)) &&
      out(3L) == ((-1L, false, 9L)),
      "is_core is the dbscan output (overwritten by contract); the input cluster_id column is preserved")
  }

  test("guards: dimensionality, eps, minPts") {
    val df = Seq((1L, 0.0)).toDF("id", "x")
    intercept[IllegalArgumentException] {
      Dbscan.dbscan(df.withColumn("a", lit(0.0)).withColumn("b", lit(0.0))
        .withColumn("c", lit(0.0)).withColumn("d", lit(0.0)),
        Seq("x", "a", "b", "c", "d"), 1.0, 2, "id")
    }
    intercept[IllegalArgumentException] { Dbscan.dbscan(df, Seq("x"), 0.0, 2, "id") }
    intercept[IllegalArgumentException] { Dbscan.dbscan(df, Seq("x"), 1.0, 0, "id") }
  }

  test("no cartesian product in the physical plan") {
    val df = (0L until 100L).map(i => (i, (i % 10).toDouble, (i / 10).toDouble)).toDF("id", "x", "y")
    assertNoCartesian(Dbscan.dbscan(df, Seq("x", "y"), 1.5, 3, "id"))
  }

  test("standardized op wrapper: scale-invariant labels, constant column safe") {
    // same shape at wildly different scales must cluster identically after
    // the StandardScaler pass; a constant column must not divide by zero
    val base = Seq[(Long, Double)]((0L, 0.0), (1L, 0.1), (2L, 0.2), (3L, 5.0), (4L, 5.1), (5L, 5.2))
    def labels(mult: Double) =
      Dbscan.clusteringFeaturesDbscan(
        base.map { case (i, x) => (i, x * mult, 7.0) }.toDF("id", "x", "const"),
        Seq("x", "const"), eps = 0.5, minPts = 2, idCol = "id")
      .select("id", "cluster_label").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val l1 = labels(1.0)
    assert(l1 == labels(1000.0), "standardization makes labels scale-invariant")
    assert(l1.map(_._2) == Seq(0L, 0L, 0L, 3L, 3L, 3L))
  }
}
