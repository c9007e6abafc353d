package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextLib}
import graft.vec.Similarity
import graft.quality.QualityMetrics

/** Degenerate-input robustness: Spark 4 runs ANSI mode by default, where an
  * unguarded 0-division is a job-killing exception — and the inputs most
  * likely to hit it (empty docs, zero vectors, constant columns, empty
  * partitions) are exactly what data-quality tooling exists to process.
  */
class DirtyDataSpec extends SparkSpec {
  import spark.implicits._

  test("qualityFeatures/qualityScore survive empty and whitespace-only docs") {
    val docs = Seq((1L, "a real document with several words"), (2L, ""), (3L, "   \t "))
      .toDF("doc_id", "text")
    val f = TextLib.qualityFeatures(docs, "text").orderBy("doc_id").collect()
    assert(f.length == 3)
    assert(f(1).isNullAt(f(1).fieldIndex("punct_ratio"))) // 0 chars → null ratio, not a crash
    assert(f(2).isNullAt(f(2).fieldIndex("mean_word_len"))) // 0 tokens → null
    val s = TextLib.qualityScore(docs, "text").orderBy("doc_id").collect()
    assert(s.length == 3 && !s(1).isNullAt(s(1).fieldIndex("quality_score")))
  }

  test("textBasicStats: empty/whitespace-only docs give null avg word length") {
    val docs = Seq((1L, "two words"), (2L, ""), (3L, " \t\n "), (4L, "\tabc"))
      .toDF("doc_id", "text")
    val f = graft.functions.FeatureLib.textBasicStats(docs, "text").orderBy("doc_id").collect()
    assert(f(0).getInt(f(0).fieldIndex("text_word_count")) == 2)
    assert(f(0).getDouble(f(0).fieldIndex("text_avg_word_length")) == 4.0)
    // 0 tokens → null (not NaN, not ANSI DIVIDE_BY_ZERO)
    Seq(1, 2).foreach { i =>
      assert(f(i).getInt(f(i).fieldIndex("text_word_count")) == 0)
      assert(f(i).isNullAt(f(i).fieldIndex("text_avg_word_length")))
    }
    // leading tab: run-count spec says ONE token, not a phantom empty one
    assert(f(3).getInt(f(3).fieldIndex("text_word_count")) == 1)
    assert(f(3).getDouble(f(3).fieldIndex("text_avg_word_length")) == 3.0)
  }

  test("similarity tiers tolerate zero-norm vectors") {
    val corpus = ((1L to 20L).map(i => (i, Seq.fill(8)(i.toFloat))) :+ (99L, Seq.fill(8)(0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
    val brute = Similarity.bruteTopK(corpus, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
      .collect()
    assert(brute.length == 5 && !brute.map(_.getLong(1)).contains(99L)) // zero vector drops out
    val lsh = Similarity.lshTopK(corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, dim = 8, bands = 4, bitsPerBand = 4)
    assert(lsh.count() >= 0) // must not throw
  }

  test("outlier/completeness metrics survive constant columns and empty frames") {
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val rate = QualityMetrics.outlierRateZscore(const, "v").collect()(0).getDouble(0)
    assert(rate == 0.0)
    val empty = spark.emptyDataFrame.withColumn("c", lit(1))
    val row = QualityMetrics.report(empty, Seq(QualityMetrics.completeness("c"))).collect()(0)
    assert(row.isNullAt(0)) // "no data arrived" reports null, not a crash
  }

  test("chunkDocuments keeps null-text documents visible") {
    val docs = Seq((1L, Some("abcdefghij" * 30)), (2L, None: Option[String])).toDF("doc_id", "text")
    val out = TextLib.chunkDocuments(docs, "text", chunkSize = 100, overlap = 10)
    assert(out.filter(col("doc_id") === 2L).count() == 1) // not silently dropped
    val r = out.filter(col("doc_id") === 2L).collect()(0)
    assert(r.isNullAt(r.fieldIndex("chunk_text")))
  }

  test("shingles keep control chars glued to tokens (oracle tokenization parity)") {
    val withCtl = Seq((1L, "\u0001the cat sat on the mat")).toDF("id", "t")
    val sh = withCtl.select(explode(TextLib.shingles(col("t"), 3)).as("s"))
      .as[String].collect().toSet
    assert(sh.contains("\u0001the cat sat"), s"got $sh")
    assert(!sh.contains("the cat sat"))
  }

  test("redactPii masks emails, phones, IPs and leaves prose untouched") {
    val rows = Seq(
      "mail me at jane_d+spam@sub.example.co.uk please",
      "call (555) 123-4567 or +44-555-123-4567",
      "host 10.0.255.3 responded",
      "version 1.2 of chapter 3.4.5 stays intact" // dots/digits that are NOT an IP
    ).zipWithIndex.map(_.swap).toDF("id", "t")
    val out = rows.select(TextLib.redactPii(col("t")).as("r")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> please")
    assert(out(1) == "call <PHONE> or <PHONE>")
    assert(out(2) == "host <IP> responded")
    assert(out(3) == "version 1.2 of chapter 3.4.5 stays intact")
  }

  test("repetitionRatio: 0 for all-distinct, rises toward 1 for repeated text") {
    val rows = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, Seq.fill(10)("spam ham eggs").mkString(" ")),
      (3L, "ab")
    ).toDF("id", "t")
    val out = rows.select(col("id"), TextLib.repetitionRatio(col("t"), 3).as("r"))
      .orderBy("id").as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    assert(out(2L) > 0.8, s"repeated text scored ${out(2L)}")
    assert(out(3L) == 0.0) // fewer than n words → defined as 0
  }

  test("exact dedup and near-dedup pass through empty-text corpora") {
    val docs = Seq((1L, ""), (2L, ""), (3L, "real content here with words"))
      .toDF("doc_id", "text")
    val exact = Dedup.exact(docs, "text", "doc_id").select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 3L)) // the two empties collapse to the min id
  }
}
