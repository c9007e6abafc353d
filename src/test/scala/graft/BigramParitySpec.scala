package graft

import org.apache.spark.sql.functions._
import graft.text.TextLib

/** The fused in-row Stupid-Backoff scorer ([[graft.expr.BigramLogProbMean]],
  * round 14) vs the explode → broadcast-joins → per-doc avg formulation it
  * replaced ([[TextLib.bigramScoreJoinPath]]) — q_lm_bigram is
  * oracle-hash-compared at 4dp, so (n_tokens, rounded lm2_logprob) must
  * agree on arbitrary input: same token stream, same four backoff branches,
  * same Math.log arithmetic, same null/empty/null-id contracts. Scores
  * compare at the 6dp rounding (one decimal tighter than the declared
  * query's 4dp edge): the kernel sums in array order, the old avg() in
  * partition order — the pinned 1e-9 seam of every LM gate.
  */
class BigramParitySpec extends SparkSpec {
  import spark.implicits._

  private def compare(df: org.apache.spark.sql.DataFrame,
                      vocabSize: Int, bigramSize: Int): Unit = {
    def norm(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), col("n_tokens"),
        round(col("lm2_logprob") + lit(1e-9), 6).as("s"))
      .orderBy("doc_id").collect()
    val a = norm(TextLib.bigramScore(df, "text", "doc_id",
      vocabSize = vocabSize, bigramSize = bigramSize))
    val b = norm(TextLib.bigramScoreJoinPath(df, "text", "doc_id",
      vocabSize = vocabSize, bigramSize = bigramSize))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"kernel $x vs join-path $y") }
  }

  test("kernel matches the join path on a corpus exercising every backoff branch") {
    // caps below the distinct counts so seen-bigram / backoff-to-vocab /
    // OOV floor / position-1 all fire
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat"),
      (2L, "the cat sat"),
      (3L, "zzz unknown tokens only qqq www"),
      (4L, "the zzz cat qqq sat"), // vocab/OOV alternation
      (5L, ""),
      (6L, null.asInstanceOf[String]),
      (7L, "single"),
      (8L, "CASE case CaSe"), // folding collapses
      (9L, "café 😀 café 😀 café"),
      (10L, "a b a b a b a b a b a b a b")
    ).toDF("doc_id", "text")
    compare(docs, vocabSize = 6, bigramSize = 5)
    compare(docs, vocabSize = 1000, bigramSize = 1000) // nothing capped
  }

  test("kernel matches the join path on randomized corpora") {
    val rnd = new scala.util.Random(2828)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "x", "yy")
    val rows = (1L to 300L).map { i =>
      val len = rnd.nextInt(40)
      val t = (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      (i, if (rnd.nextInt(25) == 0) null else t)
    }
    compare(rows.toDF("doc_id", "text"), vocabSize = 5, bigramSize = 12)
  }

  test("null-id docs keep n_tokens 0 and a null score, both paths") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "the cat sat the cat"),
      (null.asInstanceOf[java.lang.Long], "the cat sat the cat")
    ).toDF("doc_id", "text")
    val viaKernel = TextLib.bigramScore(docs, "text", "doc_id", vocabSize = 10, bigramSize = 10)
      .select("doc_id", "n_tokens", "lm2_logprob").collect()
    val nullRow = viaKernel.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 0L && nullRow.isNullAt(2),
      s"null-id doc must not participate: $nullRow")
    val joined = TextLib.bigramScoreJoinPath(docs, "text", "doc_id",
      vocabSize = 10, bigramSize = 10)
      .select("doc_id", "n_tokens", "lm2_logprob").collect()
    val nullRowJ = joined.find(_.isNullAt(0)).get
    assert(nullRowJ.getLong(1) == 0L && nullRowJ.isNullAt(2))
  }
}
