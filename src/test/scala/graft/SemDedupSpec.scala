package graft

import org.apache.spark.sql.functions._
import graft.vec.SemDedup

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated base directions with jittered near-copies + two
  // far singletons; ids chosen so group membership is unambiguous
  private def corpus(): org.apache.spark.sql.DataFrame = {
    val base = Map(
      0L -> Array(1.0f, 0f, 0f, 0f), // group A: 0,1,2
      10L -> Array(0f, 1.0f, 0f, 0f), // group B: 10,11
      20L -> Array(0f, 0f, 1.0f, 0f)) // group C: 20,21,22
    val rows = Seq(
      (0L, base(0L)), (1L, base(0L).map(_ * 2.0f)), // same direction, diff norm
      (2L, Array(0.999f, 0.04f, 0f, 0f)),
      (10L, base(10L)), (11L, Array(0.03f, 0.999f, 0f, 0f)),
      (20L, base(20L)), (21L, Array(0f, 0.02f, 0.999f, 0f)), (22L, base(20L)),
      (90L, Array(0.6f, 0.6f, 0.5f, 0.2f)),  // singleton
      (91L, Array(0f, 0f, 0f, 1.0f)))        // singleton
    rows.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
  }

  test("near-identical directions collapse to one survivor per group; singletons stay") {
    val out = SemDedup.semanticDedup(corpus(), "vec_id", "embedding",
      threshold = 0.98, nClusters = 4, keep = "min_id")
    val kept = out.select("vec_id").as[Long].collect().toSet
    assert(kept.intersect(Set(0L, 1L, 2L)) == Set(0L), "group A -> min id 0")
    assert(kept.intersect(Set(10L, 11L)) == Set(10L), "group B -> min id 10")
    assert(kept.intersect(Set(20L, 21L, 22L)) == Set(20L), "group C -> min id 20")
    assert(kept.contains(90L) && kept.contains(91L), "singletons survive")
  }

  test("paper election: the survivor is the member FARTHEST from its centroid") {
    val groups = SemDedup.semanticDupGroups(corpus(), "vec_id", "embedding",
      threshold = 0.98, nClusters = 4, keep = "far_from_centroid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byGroup = groups.groupBy(_._2)
    byGroup.foreach { case (survivor, members) =>
      val minCos = members.map(_._3).min
      val survivorCos = members.find(_._1 == survivor).get._3
      assert(survivorCos == minCos,
        s"survivor $survivor cos $survivorCos != group min $minCos")
    }
    assert(byGroup.keys.size >= 3, "three duplicate groups expected")
  }

  test("threshold is respected: sub-threshold neighbors are not duplicates") {
    // 0.98 groups the jittered copies; 0.9999 must split the jittered ones
    // apart (their cosine ~0.999) while exact-direction copies still merge
    val strict = SemDedup.semanticDedup(corpus(), "vec_id", "embedding",
      threshold = 0.9999, nClusters = 4, keep = "min_id")
      .select("vec_id").as[Long].collect().toSet
    assert(!strict.contains(1L), "exact-direction copy of 0 still deduped (cos=1)")
    assert(strict.contains(2L) && strict.contains(11L) && strict.contains(21L),
      "jittered neighbors below the strict threshold survive")
    assert(!strict.contains(22L), "bit-identical copy of 20 deduped")
  }

  test("malformed vectors pass through and never poison a cluster cell") {
    // wrong-dim and null vectors must neither crash training nor be
    // funneled into cluster 0 (where they could blow maxClusterSize and
    // silently drop that cell's REAL duplicate pairs)
    val dirty = corpus().unionByName(Seq(
      (800L, Seq(0.1f, 0.2f)),                    // wrong dimension
      (801L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val out = SemDedup.semanticDedup(dirty, "vec_id", "embedding",
      threshold = 0.98, nClusters = 4, keep = "min_id")
    val kept = out.select("vec_id").as[Long].collect().toSet
    assert(kept.contains(800L) && kept.contains(801L), "malformed rows survive untouched")
    assert(kept.intersect(Set(0L, 1L, 2L)) == Set(0L), "real groups still dedup")
  }

  test("identical vectors dedup via the collapse; zero vectors never do") {
    // exact byte-copies are cos-exactly-1 duplicates and must collapse to
    // the min id WITHOUT entering pair generation; all-zero vectors are
    // byte-identical too but their self-dot is 0 — the pair predicate
    // fails, so (matching the uncollapsed formulation) they are NOT
    // duplicates of each other or of anything else
    val withCopies = corpus().unionByName(Seq(
      (300L, Seq(1.0f, 0f, 0f, 0f)),  // exact copy of id 0's direction AND bytes
      (301L, Seq(1.0f, 0f, 0f, 0f)),
      (400L, Seq(0f, 0f, 0f, 0f)),    // zero vectors: identical, never dups
      (401L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val groups = SemDedup.semanticDupGroups(withCopies, "vec_id", "embedding",
      threshold = 0.98, nClusters = 4, keep = "min_id")
      .select("id", "survivor").as[(Long, Long)].collect().toMap
    assert(groups.get(300L).contains(0L) && groups.get(301L).contains(0L),
      "exact copies join id 0's group and elect its min id")
    assert(!groups.contains(400L) && !groups.contains(401L),
      "identical zero vectors are not semantic duplicates")
    val kept = SemDedup.semanticDedup(withCopies, "vec_id", "embedding",
      threshold = 0.98, nClusters = 4, keep = "min_id")
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(400L) && kept.contains(401L), "zero vectors both survive")
    assert(!kept.contains(300L) && !kept.contains(301L), "copies are pruned")
  }

  test("deterministic across partitionings; no cartesian product") {
    val df = corpus()
    def run(parts: Int): Seq[(Long, Long)] =
      SemDedup.semanticDupGroups(df.repartition(parts), "vec_id", "embedding",
        threshold = 0.98, nClusters = 4)
        .select("id", "survivor").as[(Long, Long)].collect().sorted.toSeq
    assert(run(7) == run(2), "partitioning must not change groups or elections")
    assertNoCartesian(SemDedup.semanticDedup(df, "vec_id", "embedding", nClusters = 4))
  }
}
