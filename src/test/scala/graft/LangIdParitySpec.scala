package graft

import org.apache.spark.sql.functions._
import graft.text.TextLib

/** The fused single-pass language election ([[graft.expr.LangBestScore]],
  * round 14) vs the K-column fold formulation it replaced
  * ([[TextLib.langIdApplyFold]]) — q_lang_id_model is oracle-hash-compared,
  * so (lang_pred, lang_score) must be bit-identical on arbitrary input:
  * same per-language array-order sums, same round(mean + 1e-9, 6), same
  * greatest(struct(score, lang)) tie election, same null/empty contracts.
  */
class LangIdParitySpec extends SparkSpec {
  import spark.implicits._

  private def compare(df: org.apache.spark.sql.DataFrame, textCol: String,
                      model: TextLib.LangIdModel): Unit = {
    val a = TextLib.langIdApply(df, textCol, model)
      .select("doc_id", "lang_pred", "lang_score").orderBy("doc_id").collect()
    val b = TextLib.langIdApplyFold(df, textCol, model)
      .select("doc_id", "lang_pred", "lang_score").orderBy("doc_id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"fused $x vs fold $y") }
  }

  test("fused kernel matches the fold reference on a mixed-language corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat with the other cat", "en"),
      (2L, "der hund und die katze sind nicht hier", "de"),
      (3L, "le chat est dans la maison avec le chien", "fr"),
      (4L, "the dog und le chat mixed evidence here", "en"),
      (5L, "", "en"),
      (6L, null.asInstanceOf[String], "de"),
      (7L, "zz", "fr"), // shorter than n: one whole-text gram
      (8L, "unicode café naïve 你好 😀 end", "en"),
      (9L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "de"),
      (10L, "the the the the the the the the", "en")
    ).toDF("doc_id", "text", "lang")
    val m = TextLib.langIdFit(docs.filter(col("doc_id") <= 8), "text", "lang", n = 3, tableSize = 50)
    compare(docs, "text", m)
  }

  test("fused kernel matches the fold reference on randomized corpora") {
    val rnd = new scala.util.Random(4242)
    val alphabets = Seq("abcdet ", "klmnop ", "xyzuvw ")
    val rows = (1L to 400L).map { i =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(60)
      val t = (0 until len).map(_ => a(rnd.nextInt(a.length))).mkString
      (i, t, s"l${alphabets.indexOf(a)}")
    }
    val docs = rows.toDF("doc_id", "text", "lang")
    val m = TextLib.langIdFit(docs.filter(col("doc_id") % 4 =!= 0), "text", "lang",
      n = 2, tableSize = 30)
    compare(docs, "text", m)
  }

  test("identical models tie: election picks the lexicographically last language, both paths") {
    // two languages fitted on the SAME text => identical vocab/floors =>
    // equal rounded scores on every doc; the pinned policy elects the
    // LAST language code
    val train = Seq((1L, "same evidence for both", "aa"), (2L, "same evidence for both", "zz"))
      .toDF("doc_id", "text", "lang")
    val m = TextLib.langIdFit(train, "text", "lang", n = 3, tableSize = 50)
    val docs = Seq((1L, "same evidence for both"), (2L, "other words entirely out of vocab"))
      .toDF("doc_id", "text")
    val fused = TextLib.langIdApply(docs, "text", m)
      .select("doc_id", "lang_pred", "lang_score").orderBy("doc_id").collect()
    assert(fused.forall(_.getString(1) == "zz"))
    compare(docs, "text", m)
  }

  test("rounding parity at HALF_UP boundaries: kernel round == Spark round") {
    // engineer per-doc means that land on adversarial 6dp edges: single
    // whole-text grams (text shorter than n) with planted lp values
    val planted = Seq(
      -0.1234565, -0.12345649999, -0.1234575, -3.0000005, -1e-7, -2.5e-6,
      -0.9999995, -123.4567895, -4.9999999999e-7, -0.0000005, -1.0000004999)
    val pairs = planted.zipWithIndex.map { case (v, i) => (s"g$i", v) }
    val lmA = graft.expr.LmVocab(pairs, -20.0)
    val lmB = graft.expr.LmVocab(pairs.map { case (g, v) => (g, v - 0.001) }, -21.0)
    val m = new TextLib.LangIdModel(99, Seq("aa", "bb"), Seq(lmA, lmB))
    // n=99 > text length => charGramArray yields the whole text as ONE gram
    val docs = planted.indices.map(i => (i.toLong, s"g$i")).toDF("doc_id", "text")
    compare(docs, "text", m)
    // and the absolute scores are what Spark's round() computes
    val viaSpark = docs.withColumn("exp",
        round(element_at(typedlit(planted.map(_ + 1e-9)), col("doc_id").cast("int") + 1), 6))
      .select("doc_id", "exp").orderBy("doc_id").collect().map(_.getDouble(1))
    val fused = TextLib.langIdApply(docs, "text", m)
      .select("doc_id", "lang_score").orderBy("doc_id").collect().map(_.getDouble(1))
    fused.zip(viaSpark).foreach { case (f, e) =>
      assert(f == e, s"kernel rounding $f vs Spark round $e") }
  }

  test("null and token-free docs predict und with null score, both paths") {
    val train = Seq((1L, "the cat sat", "en"), (2L, "der hund lief", "de"))
      .toDF("doc_id", "text", "lang")
    val m = TextLib.langIdFit(train, "text", "lang", n = 3, tableSize = 10)
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val fused = TextLib.langIdApply(docs, "text", m)
      .select("doc_id", "lang_pred", "lang_score").orderBy("doc_id").collect()
    assert(fused.forall(r => r.getString(1) == "und" && r.isNullAt(2)))
    compare(docs, "text", m)
  }
}
