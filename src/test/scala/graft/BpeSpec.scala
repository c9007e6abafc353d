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
    val model = Bpe.trainMerges(corpus, "text", numMerges = 5)
    // hand-computed: pair counts peak at 9 for (e,s),(s,t),(t,</w>) — ties
    // break lexicographically — then the es/est chain, then l+o, lo+w
    val expected = Seq(
      (0, "e", "s", "es", 9L),
      (1, "es", "t", "est", 9L),
      (2, "est", Bpe.EndOfWord, "est" + Bpe.EndOfWord, 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L))
    assert(model.merges == expected, s"got ${model.merges}")
    assert(model.pieces("low") == Seq("low", Bpe.EndOfWord))
    assert(model.pieces("newest") == Seq("n", "e", "w", "est" + Bpe.EndOfWord))
    assert(model.pieces("lower") == Seq("low", "e", "r", Bpe.EndOfWord))
    // repartitioning the input must not change the result
    val again = Bpe.trainMerges(corpus.repartition(5), "text", numMerges = 5)
    assert(again.merges == model.merges)
  }

  test("trainMerges stops early when no pair reaches minPairCount") {
    val model = Bpe.trainMerges(
      Seq((1L, "ab cd")).toDF("id", "t"), "t", numMerges = 10, minPairCount = 2)
    assert(model.merges.isEmpty) // every pair occurs once
  }

  test("trainMerges splits supplementary characters as code points, not surrogates") {
    // U+1D11E MUSICAL SYMBOL G CLEF is outside the BMP (2 UTF-16 units)
    val model = Bpe.trainMerges(
      Seq((1L, "a𝄞b a𝄞b a𝄞b")).toDF("id", "t"),
      "t", numMerges = 1)
    val (_, l, r, merged, c) = model.merges.head
    // the first merge involves the intact 2-unit character, never a lone
    // surrogate (which is not a valid string and corrupts through Spark):
    // every symbol must decode to code points outside the surrogate range
    def noLoneSurrogate(s: String): Boolean =
      s.codePoints().toArray.forall(cp => cp < 0xD800 || cp > 0xDFFF)
    assert(Seq(l, r, merged).forall(noLoneSurrogate), s"lone surrogate in ($l, $r, $merged)")
    assert(c == 3L)
    assert(model.pieces("a𝄞b").head.nonEmpty)
  }

  test("encode resolves trained words, replays merges for unseen words") {
    val model = Bpe.trainMerges(corpus, "text", numMerges = 5)
    val docs = Seq(
      (10L, "low newest"),
      (11L, "lowest"),                      // unseen, but every merge applies
      (12L, "zap"),                         // unseen, no merge applies
      (13L, ""),                            // token-free
      (14L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "text", "doc_id", model)
      .select("doc_id", "bpe_pieces", "bpe_len")
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    assert(out(10L)._1 == Seq("low", Bpe.EndOfWord, "n", "e", "w", "est" + Bpe.EndOfWord))
    // replaying ranks on "lowest": e+s, es+t, est+</w>, l+o, lo+w →
    // [low, est</w>] — NOT a char-level fallback
    assert(out(11L)._1 == Seq("low", "est" + Bpe.EndOfWord))
    assert(out(12L)._1 == Seq("z", "a", "p", Bpe.EndOfWord))
    assert(out(13L) == ((Seq(), 0)))
    assert(out(14L) == ((Seq(), 0)))
    // token order survives shuffling (posexplode + sort, not bare collect_list)
    val long = Seq((1L, (1 to 200).map(i => if (i % 2 == 0) "low" else "zap").mkString(" ")))
      .toDF("doc_id", "text")
    val enc = Bpe.encode(long.repartition(7), "text", "doc_id", model)
      .select("bpe_pieces").head().getSeq[String](0)
    val one = Seq("z", "a", "p", Bpe.EndOfWord) ++ Seq("low", Bpe.EndOfWord)
    assert(enc == Seq.fill(100)(one).flatten)
  }

  test("incremental trainer matches a naive recount reference on random corpora") {
    // differential test: the lazy-heap/occurrence-index trainer must agree
    // with a straightforward recount-everything implementation
    def naive(wordCounts: Seq[(String, Long)], numMerges: Int, minPair: Long)
        : Seq[(Int, String, String, String, Long)] = {
      var pieces = wordCounts.map { case (w, c) =>
        (w.map(_.toString).toVector :+ Bpe.EndOfWord, c) }
      val out = Seq.newBuilder[(Int, String, String, String, Long)]
      var rank = 0
      var go = true
      while (rank < numMerges && go) {
        val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
        pieces.foreach { case (s, c) =>
          s.sliding(2).filter(_.size == 2).foreach(p =>
            pc.update((p(0), p(1)), pc.getOrElse((p(0), p(1)), 0L) + c)) }
        val best = pc.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
        best match {
          case Some(((l, r), c)) if c >= minPair =>
            pieces = pieces.map { case (s, wc) =>
              val b = Vector.newBuilder[String]
              var i = 0
              while (i < s.length) {
                if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
                else { b += s(i); i += 1 }
              }
              (b.result(), wc)
            }
            out += ((rank, l, r, l + r, c)); rank += 1
          case _ => go = false
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(3)
    (1 to 3).foreach { trial =>
      val words = (1 to 40).map(_ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
      val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w)).mkString(" ")
      val df = Seq((trial.toLong, text)).toDF("id", "t")
      val fast = Bpe.trainMerges(df, "t", numMerges = 12, minPairCount = 2).merges
      val wcs = graft.text.TextLib.wordCounts(df, "t")
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(x => (-x._2, x._1)).toSeq
      assert(fast == naive(wcs, 12, 2L), s"trial $trial diverged")
    }
  }
}
