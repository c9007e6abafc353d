package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.{KeyValueSink, Readers}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv glob read with _source_file lineage") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1)
      .write.option("header", "true").csv(s"$dir/part1")
    Seq((3, "c")).toDF("id", "v").coalesce(1)
      .write.option("header", "true").csv(s"$dir/part2")
    val df = Readers.csv(spark, s"$dir/part*/*.csv")
    assert(df.count() == 3)
    val files = df.select("_source_file").distinct().as[String].collect()
    assert(files.length == 2 && files.forall(_.contains("part")))
  }

  test("jsonl read + one-level struct flatten") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.jsonl"),
      """{"id":1,"meta":{"lang":"en","score":0.9}}
        |{"id":2,"meta":{"lang":"de","score":0.4}}""".stripMargin)
    val df = Readers.json(spark, s"$dir/*.jsonl", flattenTopLevel = true)
    assert(df.columns.toSet == Set("id", "meta_lang", "meta_score", "_source_file"))
    assert(df.filter($"meta_lang" === "de").count() == 1)
  }

  test("orc round-trip and raw text lines source") {
    val dir = Files.createTempDirectory("graft_orc").toString
    Seq((1, "x"), (2, "y")).toDF("id", "v").write.orc(s"$dir/t")
    val back = Readers.orc(spark, s"$dir/t")
    assert(back.count() == 2 && back.columns.toSet == Set("id", "v"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/corpus.txt"), "line one\nline two\nline three")
    val txt = Readers.text(spark, s"$dir/corpus.txt")
    assert(txt.count() == 3)
    assert(txt.columns.contains("value") && txt.columns.contains("_source_file"))
  }

  test("document chunking: coverage, overlap and short-doc invariants") {
    val docs = Seq((1L, "a" * 500), (2L, "b" * 30)).toDF("doc_id", "text")
    val chunks = graft.text.TextLib.chunkDocuments(docs, "text", chunkSize = 200, overlap = 50)
    val byDoc = chunks.orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_text").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSeq).toMap
    assert(byDoc(2L) == Seq("b" * 30)) // short doc = one whole chunk
    val c1 = byDoc(1L)
    assert(c1.length == 3) // ceil((500-50)/150) = 3
    assert(c1.head.length == 200 && c1(1).length == 200 && c1(2).length == 200)
    // consecutive chunks overlap by exactly `overlap` chars
    assert(c1.head.takeRight(50) == c1(1).take(50))
    // full coverage: stitched (dropping overlaps) reconstructs a prefix of the doc
    val stitched = c1.head + c1.tail.map(_.drop(50)).mkString
    assert(("a" * 500).startsWith(stitched.take(500)) && stitched.length >= 500)
  }

  test("KV sink batch write: per-record put with JSON values") {
    KeyValueSink.InMemoryKV.clear("t1")
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    KeyValueSink.writeBatch(df, "id", () => new KeyValueSink.InMemoryKV("t1"))
    assert(KeyValueSink.InMemoryKV.keys("t1").size == 2)
    val v1 = KeyValueSink.InMemoryKV.get("t1", "1").get
    assert(v1.contains("\"v\":\"x\""))
  }

  test("KV sink as checkpointed streaming foreachBatch") {
    KeyValueSink.InMemoryKV.clear("t2")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val cp = Files.createTempDirectory("graft_cp").toString
    val q = KeyValueSink.streamWriter(input.toDF().withColumn("k", col("user")),
      "k", cp, () => new KeyValueSink.InMemoryKV("t2")).start()
    try {
      input.addData(Ev(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "u1", 1.0))
      q.processAllAvailable()
      assert(KeyValueSink.InMemoryKV.get("t2", "u1").isDefined)
    } finally q.stop()
  }

  test("label encoding: broadcast-join shape, lexicographic, null-safe") {
    val df = Seq((1, "b"), (2, "a"), (3, "c"), (4, null: String), (5, "a"))
      .toDF("id", "cat")
    val out = graft.functions.FeatureLib.encodeLabel(df, "cat")
    val m = out.orderBy("id").select("cat_label").collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(m.toSeq == Seq(1, 0, 2, -1, 0))
  }
}
