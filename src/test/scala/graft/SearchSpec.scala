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
