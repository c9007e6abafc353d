package graft

import org.apache.spark.sql.functions._
import graft.text.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple cherry"),        // tf(apple)=2, dl=4
    (2L, "apple banana banana banana"),       // tf(banana)=3, dl=4
    (3L, "cherry cherry cherry"),             // rare-ish term doc, dl=3
    (4L, "unrelated words only here"),        // no query term
    (5L, null.asInstanceOf[String])           // null text must not crash
  ).toDF("id", "text")

  private def queries = Seq((10L, "apple cherry"), (20L, "banana"), (30L, "zzz")).toDF("qid", "q")

  /** Independent reimplementation of the BM25 formula for the differential. */
  private def bm25(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double,
                   k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + (b * dl) / avgdl))

  test("bm25TopK matches a hand-computed differential on a tiny corpus") {
    val out = Search.bm25TopK(corpus, "text", "id", queries, "qid", "q", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3), r.getInt(4))).toMap
    // N=5 docs, dl: (4,4,3,4,0) → avgdl = 15/5 = 3.0
    val n = 5L; val avgdl = 3.0
    // query 10 "apple cherry": df(apple)=2, df(cherry)=2
    val s1 = bm25(2, 2, 4, n, avgdl) + bm25(1, 2, 4, n, avgdl) // doc1: apple tf2 + cherry tf1
    val s3 = bm25(3, 2, 3, n, avgdl)                           // doc3: cherry tf3
    val s2 = bm25(1, 2, 4, n, avgdl)                           // doc2: apple tf1
    def r6(x: Double) = math.rint((x + 1e-9) * 1e6) / 1e6
    assert(math.abs(out((10L, 1L))._1 - r6(s1)) < 1e-9)
    assert(math.abs(out((10L, 3L))._1 - r6(s3)) < 1e-9)
    assert(math.abs(out((10L, 2L))._1 - r6(s2)) < 1e-9)
    assert(out((10L, 1L))._2 == 2L, "doc1 matches both query terms")
    assert(out((10L, 3L))._2 == 1L)
    assert(!out.contains((10L, 4L)), "doc without query terms is not retrieved")
    assert(!out.contains((10L, 5L)), "null-text doc is not retrieved")
    // query 20: only docs 1 and 2 contain banana; tf3 in the shorter... same dl → tf wins
    assert(out((20L, 2L))._3 == 1, "higher tf ranks first at equal dl")
    assert(out((20L, 1L))._3 == 2)
    // query 30: term absent everywhere → no rows at all
    assert(!out.keys.exists(_._1 == 30L))
  }

  test("bm25TopK: k caps per query, rank is contiguous, ordering deterministic") {
    val docs = (1L to 50L).map(i => (i, "common " * (i % 5 + 1).toInt)).toDF("id", "text")
    val qs = Seq((1L, "common")).toDF("qid", "q")
    val out = Search.bm25TopK(docs, "text", "id", qs, "qid", "q", k = 7)
      .orderBy("rank").collect()
    assert(out.length == 7)
    assert(out.map(_.getInt(4)).toSeq == (1 to 7), "ranks contiguous from 1")
    // equal rounded scores tie-break on ascending doc id
    val grouped = out.groupBy(_.getDouble(2))
    grouped.values.foreach { rows =>
      val ids = rows.sortBy(_.getInt(4)).map(_.getLong(1))
      assert(ids.sorted.sameElements(ids), "ties ordered by ascending id")
    }
  }

  test("rrfFuse: hand-computed fusion — consensus beats either single-list winner") {
    // list A: d1@1, d2@2, d3@3; list B: d3@1, d2@2, d4@3 (kRrf = 60)
    // d2: 1/62 + 1/62        = 0.032258
    // d3: 1/63 + 1/61        = 0.032264  <- top (consensus of mid+high)
    // d1: 1/61               = 0.016393, d4: 1/63 = 0.015873
    val a = Seq((1L, "d1", 1), (1L, "d2", 2), (1L, "d3", 3)).toDF("qid", "doc", "rank")
    val b = Seq((1L, "d3", 1), (1L, "d2", 2), (1L, "d4", 3)).toDF("qid", "doc", "rank")
    val out = Search.rrfFuse(Seq(a, b), "qid", "doc", k = 4).orderBy("rank")
      .select("doc", "rrf_score", "rank").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("d3", "d2", "d1", "d4"),
      s"fusion order: ${out.toSeq}")
    assert(math.abs(out(0).getDouble(1) - (1.0 / 63 + 1.0 / 61)) < 1e-6)
    // null ranks are ignored, k caps output
    val withNull = Seq((1L, "d9", null.asInstanceOf[Integer])).toDF("qid", "doc", "rank")
    assert(Search.rrfFuse(Seq(a, withNull), "qid", "doc", k = 2).count() == 2)
  }

  test("rrfFuse: fuses real bm25 + brute-ANN lists over a shared id space") {
    val docs = Seq(
      (1L, "spark query engine"), (2L, "spark shuffle service"),
      (3L, "cooking pasta recipe"), (4L, "spark catalyst optimizer")).toDF("id", "text")
    val vecs = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.2f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.8f, 0.1f))).toDF("vec_id", "embedding")
    val lex = Search.bm25TopK(docs, "text", "id", Seq((7L, "spark")).toDF("qid", "q"),
      "qid", "q", k = 3).select(col("qid"), col("id"), col("rank"))
    val sem = graft.vec.Similarity.bruteTopK(vecs, "vec_id", "embedding",
        Seq((7L, Array(1.0f, 0.0f))).toDF("qid", "qv"), "qid", "qv", k = 3,
        excludeSelf = false)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)))
      .select(col("query_id").as("qid"), col("neighbor_id").as("id"), col("rank"))
    val fused = Search.rrfFuse(Seq(lex, sem), "qid", "id", k = 4).collect()
    // docs 1/2/4 appear in both lists; doc 3 (pasta, orthogonal vector) in neither
    assert(fused.map(_.getLong(1)).toSet == Set(1L, 2L, 4L), s"fused: ${fused.toSeq}")
  }

  test("mmrSelect: hand-computed greedy with non-binary cosines; lambda=1 is pure relevance") {
    // vectors at 0°, 45°, 90°: cos(0°,45°) = cos(45°,90°) = √2/2 ≈ .7071
    // relevance: d1 .9 (0°), d2 .8 (45°), d3 .7 (90°); λ = 0.5
    //   pick1: d1 (.45)
    //   then d2: .5·.8 − .5·.7071 = .0464;  d3: .5·.7 − 0 = .35 → d3
    //   then d2: maxSim vs {d1,d3} = .7071 → .0464 → d2 last
    val r2 = (math.sqrt(2.0) / 2).toFloat
    val cands = Seq(
      (1L, 1L, 0.9, Array(1.0f, 0.0f)),
      (1L, 2L, 0.8, Array(r2, r2)),
      (1L, 3L, 0.7, Array(0.0f, 1.0f))).toDF("qid", "id", "rel", "vec")
    val out = Search.mmrSelect(cands, "qid", "id", "rel", "vec", k = 3, lambda = 0.5)
      .orderBy("mmr_rank").select("id", "mmr_score").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L), s"greedy order: ${out.toSeq}")
    assert(math.abs(out(0).getDouble(1) - 0.45) < 1e-6)
    assert(math.abs(out(2).getDouble(1) - (0.4 - 0.5 * math.sqrt(2.0) / 2)) < 1e-6)
    // λ=1 degenerates to relevance order (penalty term gone)
    val pure = Search.mmrSelect(cands, "qid", "id", "rel", "vec", k = 3, lambda = 1.0)
      .orderBy("mmr_rank").select("id").as[Long].collect()
    assert(pure.toSeq == Seq(1L, 2L, 3L), s"lambda=1 order: ${pure.toSeq}")
    // exact duplicates of the top pick sink below a diverse lower-relevance doc
    val dup = Seq(
      (1L, 1L, 0.9, Array(1.0f, 0.0f)),
      (1L, 2L, 0.89, Array(1.0f, 0.0f)),
      (1L, 3L, 0.2, Array(0.0f, 1.0f))).toDF("qid", "id", "rel", "vec")
    val d = Search.mmrSelect(dup, "qid", "id", "rel", "vec", k = 3, lambda = 0.5)
      .orderBy("mmr_rank").select("id").as[Long].collect()
    assert(d.toSeq == Seq(1L, 3L, 2L), s"duplicate demotion: ${d.toSeq}")
  }

  test("mmrSelect: NaN/null relevance and double vectors don't crash; NaN ranks last") {
    // regression (round-6 review): an all-NaN final round left best = -1
    // and threw AIOOBE; null relevance NPE'd in the UDF; double vectors
    // ClassCastException'd per element
    val cands = Seq(
      (1L, 1L, Some(0.9), Array(1.0, 0.0)),
      (1L, 2L, Some(Double.NaN), Array(0.0, 1.0)),
      (1L, 3L, None: Option[Double], Array(0.5, 0.5)),
      (1L, 4L, Some(0.5), Array(0.0, 1.0))).toDF("qid", "id", "rel", "vec")
    val out = Search.mmrSelect(cands, "qid", "id", "rel", "vec", k = 4, lambda = 0.5)
      .orderBy("mmr_rank").select("id").as[Long].collect()
    // null row filtered; NaN candidate still emitted but last
    assert(out.toSeq == Seq(1L, 4L, 2L), s"order: ${out.toSeq}")
  }

  test("mmrSelect: negative similarity to every selected doc is a boost, not clamped to 0") {
    // ADVICE r6: maxSim initialized to 0.0 clamped negative cosines. An
    // anti-parallel candidate (cos = −1 to the pick) must get score
    // λ·rel − (1−λ)·(−1) = λ·rel + (1−λ) under Carbonell–Goldstein.
    //   pick1: d1 (rel .9, (1,0)) → .45
    //   rank2: d2 (rel .5, (−1,0)): .25 + .5 = .75  beats  d3 (rel .6, (0,1)): .30
    //   (the 0-clamp gave d2 .25 and wrongly picked d3)
    val cands = Seq(
      (1L, 1L, 0.9, Array(1.0f, 0.0f)),
      (1L, 2L, 0.5, Array(-1.0f, 0.0f)),
      (1L, 3L, 0.6, Array(0.0f, 1.0f))).toDF("qid", "id", "rel", "vec")
    val out = Search.mmrSelect(cands, "qid", "id", "rel", "vec", k = 3, lambda = 0.5)
      .orderBy("mmr_rank").select("id", "mmr_score").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), s"order: ${out.toSeq}")
    assert(math.abs(out(1).getDouble(1) - 0.75) < 1e-6, s"boosted score: ${out.toSeq}")
  }

  test("bm25TopK: repeated query term counts once; rarer term outweighs common one") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "common filler filler"),
      (4L, "filler filler filler")
    ).toDF("id", "text")
    val qs = Seq((1L, "rare rare rare common")).toDF("qid", "q")
    val out = Search.bm25TopK(docs, "text", "id", qs, "qid", "q", k = 4).collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getInt(4))).toMap
    assert(out(1L)._1 == 2L, "repeated query token collapses to distinct terms")
    assert(out(1L)._2 == 1, "the doc holding the rare term ranks first")
  }
}
