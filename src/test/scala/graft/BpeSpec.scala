package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE corpus: low×5, lower×2, newest×6, widest×3
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("trainMerges reproduces the classic merge sequence deterministically") {
    val (merges, pieces) = Bpe.trainMerges(corpus, "text", numMerges = 5)
    // hand-computed: pair counts peak at 9 for (e,s),(s,t),(t,</w>) — ties
    // break lexicographically — then the es/est chain, then l+o, lo+w
    val expected = Seq(
      (0, "e", "s", "es", 9L),
      (1, "es", "t", "est", 9L),
      (2, "est", Bpe.EndOfWord, "est" + Bpe.EndOfWord, 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L))
    assert(merges == expected, s"got $merges")
    assert(pieces("low") == Seq("low", Bpe.EndOfWord))
    assert(pieces("newest") == Seq("n", "e", "w", "est" + Bpe.EndOfWord))
    assert(pieces("lower") == Seq("low", "e", "r", Bpe.EndOfWord))
    // repartitioning the input must not change the result
    val (again, _) = Bpe.trainMerges(corpus.repartition(5), "text", numMerges = 5)
    assert(again == merges)
  }

  test("trainMerges stops early when no pair reaches minPairCount") {
    val (merges, _) = Bpe.trainMerges(
      Seq((1L, "ab cd")).toDF("id", "t"), "t", numMerges = 10, minPairCount = 2)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("encode maps trained words via pieces, falls back to chars for OOV") {
    val (_, pieces) = Bpe.trainMerges(corpus, "text", numMerges = 5)
    val docs = Seq(
      (10L, "low newest"),
      (11L, "zap"),                         // untrained word
      (12L, ""),                            // token-free
      (13L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "text", "doc_id", pieces)
      .select("doc_id", "bpe_pieces", "bpe_len")
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    assert(out(10L)._1 == Seq("low", Bpe.EndOfWord, "n", "e", "w", "est" + Bpe.EndOfWord))
    assert(out(11L)._1 == Seq("z", "a", "p", Bpe.EndOfWord))
    assert(out(12L) == ((Seq(), 0)))
    assert(out(13L) == ((Seq(), 0)))
    // token order survives shuffling (posexplode + sort, not bare collect_list)
    val long = Seq((1L, (1 to 200).map(i => if (i % 2 == 0) "low" else "zap").mkString(" ")))
      .toDF("doc_id", "text")
    val enc = Bpe.encode(long.repartition(7), "text", "doc_id", pieces)
      .select("bpe_pieces").head().getSeq[String](0)
    val one = Seq("z", "a", "p", Bpe.EndOfWord) ++ Seq("low", Bpe.EndOfWord)
    assert(enc == Seq.fill(100)(one).flatten)
  }
}
