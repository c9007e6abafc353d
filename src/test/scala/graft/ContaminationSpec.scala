package graft

import org.apache.spark.sql.functions._
import graft.text.Contamination

/** Benchmark decontamination on a hand-computable corpus: overlap counts,
  * case-insensitivity (shingles are over normalized text), the clean-doc
  * invariant, and the no-Cartesian scale gate.
  */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def evalDf = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"),
    (200L, "one two three four five six")
  ).toDF("doc_id", "text")

  private def trainDf = Seq(
    (1L, "intro alpha beta gamma delta epsilon zeta outro"), // both eval-100 shingles
    (2L, "ALPHA BETA Gamma delta epsilon unrelated tail words"), // one, via normalization
    (3L, "zzz yyy xxx www vvv uuu"), // clean
    (4L, "prefix one two three four five six alpha beta gamma delta epsilon") // hits both eval docs
  ).toDF("doc_id", "text")

  test("contaminationStats counts distinct overlapping 5-grams and eval docs") {
    val stats = Contamination.contaminationStats(trainDf, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5)
    val m = stats.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map(1L -> ((2L, 1L)), 2L -> ((1L, 1L)), 4L -> ((3L, 2L))),
      s"unexpected stats: $m")
  }

  test("decontaminate drops only docs at/above minOverlap") {
    val kept = Contamination.decontaminate(trainDf, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5, minOverlap = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
    // minOverlap = 1: any shared 5-gram contaminates
    val strict = Contamination.decontaminate(trainDf, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5, minOverlap = 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(strict == Seq(3L))
  }

  test("eval suite never collides with itself and the plan is join-bucketed") {
    // a clean corpus passes through untouched
    val clean = trainDf.filter(col("doc_id") === 3L)
    val out = Contamination.decontaminate(clean, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5)
    assert(out.count() == 1L)
    assertNoCartesian(Contamination.contaminationStats(trainDf, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5))
  }
}
