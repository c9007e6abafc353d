package graft

import org.apache.spark.sql.functions._
import graft.text.TextLib

/** The fused in-row n-gram repetition kernel ([[graft.expr.GramRepStats]],
  * round 14) vs the relational (explode → count → re-aggregate → join-back)
  * formulation it replaced ([[TextLib.repetitionSignalsRelational]]) —
  * q_repetition_signals is oracle-hash-compared, so all four fractions must
  * be bit-identical on arbitrary input: same gram stream (WordGrams'
  * lowercase → \s+ → drop-empties → space-joined), same (max count,
  * UTF8String-smallest gram) top election, same has-dup / dup-chars nulls,
  * same null-id non-participation.
  */
class RepSignalsParitySpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("doc_id", "dup_line_frac", "dup_line_char_frac",
    "top_ngram_char_frac", "dup_ngram_char_frac")

  private def compare(df: org.apache.spark.sql.DataFrame,
                      topN: Int = 2, dupN: Int = 5): Unit = {
    val a = TextLib.repetitionSignals(df, "text", "doc_id", topN, dupN)
      .select(cols.map(col): _*).orderBy("doc_id").collect()
    val b = TextLib.repetitionSignalsRelational(df, "text", "doc_id", topN, dupN)
      .select(cols.map(col): _*).orderBy("doc_id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"kernel $x vs relational $y") }
  }

  test("kernel matches the relational reference on hostile fixtures") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "repeat me line\nrepeat me line\nother text r1 r2 r3 r4 r5 r1 r2 r3 r4 r5"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "one"), // fewer than topN tokens: all n-gram stats null
      (6L, "a b c d"), // topN grams exist, dupN(5) grams do not
      (7L, "a b c d e"), // exactly one 5-gram, count 1: has_dup=1, dup_chars null
      (8L, "x y x y x y x y x y x y"), // heavy bigram + 5-gram repetition
      (9L, "café 😀 naïve 你好 café 😀 naïve 你好 café 😀"), // unicode lengths
      (10L, "A A a a"), // case folding collapses to one gram, ties
      (11L, "b a b a b"), // bigram tie "b a" vs "a b": smallest gram elected
      (12L, "😀 zz 😀 zz 😀"), // supplementary
      // vs BMP gram ordering: UTF8String byte order, not UTF-16 order
      (13L, "   \n\t  "),
      (14L, "spam ham spam ham spam ham spam ham spam ham spam ham")
    ).toDF("doc_id", "text")
    compare(docs)
    compare(docs, topN = 1, dupN = 2)
    compare(docs, topN = 3, dupN = 3) // shared order: one count pass
  }

  test("null-id docs carry null n-gram stats, both paths") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "w w w w w w w w"),
      (null.asInstanceOf[java.lang.Long], "w w w w w w w w")
    ).toDF("doc_id", "text")
    val viaKernel = TextLib.repetitionSignals(docs, "text", "doc_id")
      .select(cols.map(col): _*).collect()
    val nullRow = viaKernel.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(3) && nullRow.isNullAt(4),
      s"null-id doc must not participate: $nullRow")
    compare(docs)
  }

  test("kernel matches the relational reference on randomized corpora") {
    val rnd = new scala.util.Random(1414)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "x", "yy", "café", "你好")
    val rows = (1L to 300L).map { i =>
      val len = rnd.nextInt(30)
      val t = (0 until len).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
      (i, if (rnd.nextInt(20) == 0) null else t)
    }
    compare(rows.toDF("doc_id", "text"))
    compare(rows.toDF("doc_id", "text"), topN = 1, dupN = 3)
  }
}
