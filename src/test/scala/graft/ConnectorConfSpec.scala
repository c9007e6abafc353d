package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Readers, Sinks}
import graft.streaming.StreamOps

/** Offline config-shape gates for the S3/Kafka connectors (VERDICT r6 #5):
  * the named residual risk on the three infra-bound connectors is
  * config-shaped bugs, and that part IS testable without a broker or
  * object store — the key/URI building, format inference and dispatch,
  * the consumer-config → Spark option map, the wire-frame envelope
  * projection, and the producer key/value serialization, each checked
  * against the reference's semantics (s3_source.py:50-121,200-216;
  * kafka_source.py:26-61,126-139,254-348). Only the network hop itself
  * stays untestable in this sandbox.
  */
class ConnectorConfSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- S3

  test("s3Key/s3aUri: the reference's prefix/slash algebra") {
    // prefix.rstrip('/') + '/' + source.lstrip('/')
    assert(Readers.s3Key("data/x.csv", "raw/") == "raw/data/x.csv")
    assert(Readers.s3Key("/data/x.csv", "raw") == "raw/data/x.csv")
    assert(Readers.s3Key("x.csv", "a/b/") == "a/b/x.csv")
    // no prefix → source unchanged (the reference's passthrough)
    assert(Readers.s3Key("data/x.csv") == "data/x.csv")
    assert(Readers.s3aUri("lake", "/data/x.csv", "raw/") == "s3a://lake/raw/data/x.csv")
    assert(Readers.s3aUri("lake", "data/*.parquet") == "s3a://lake/data/*.parquet",
      "globs pass through to S3A")
    intercept[IllegalArgumentException](Readers.s3aUri("", "x.csv"))
  }

  test("inferFormat: the reference's extension map, csv default, glob/case handling") {
    assert(Readers.inferFormat("a/b/data.csv") == "csv")
    assert(Readers.inferFormat("data.json") == "json")
    assert(Readers.inferFormat("data.jsonl") == "jsonl")
    assert(Readers.inferFormat("data.ndjson") == "ndjson")
    assert(Readers.inferFormat("data.parquet") == "parquet")
    assert(Readers.inferFormat("data.PARQUET") == "parquet", "extension is case-insensitive")
    assert(Readers.inferFormat("events/*.jsonl") == "jsonl", "glob basename carries the extension")
    assert(Readers.inferFormat("data.txt") == "csv", "unknown extension defaults to csv")
    assert(Readers.inferFormat("noext") == "csv")
    assert(Readers.inferFormat("dir.d/noext") == "csv", "a dot in a directory is not an extension")
  }

  test("objectStore dispatch + lineage: every format reads through its reader, _source_s3_key rides") {
    val dir = Files.createTempDirectory("graft_conn").toString
    val rows = Seq((1L, "a"), (2L, "b"))
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(s"$dir/p")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$dir/c")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").json(s"$dir/j")
    Seq("parquet" -> s"$dir/p", "csv" -> s"$dir/c",
        "json" -> s"$dir/j", "jsonl" -> s"$dir/j", "ndjson" -> s"$dir/j")
      .foreach { case (fmt, path) =>
        val df = Readers.objectStore(spark, path, fmt)
        assert(df.columns.contains("_source_s3_key"), s"$fmt: lineage column missing")
        assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L), s"$fmt read")
      }
    intercept[IllegalArgumentException](Readers.objectStore(spark, s"$dir/p", "avro"))
    // the end-to-end config shape with an explicit local URI stand-in:
    // format inferred from the source extension, custom lineage col
    val viaConf = Readers.objectStore(spark, s"$dir/j/*.json",
      Readers.inferFormat("events/*.json"), lineageCol = "_src")
    assert(viaConf.columns.contains("_src") && viaConf.count() == 2)
  }

  // ---------------------------------------------------------------- Kafka source

  test("kafkaSourceOptions: consumer config → Spark option map, with validation") {
    val opts = StreamOps.kafkaSourceOptions(
      Seq("k1:9092", "k2:9092"), Seq("events", "clicks"),
      autoOffsetReset = "earliest", groupId = Some("graft-grp"),
      maxPollRecords = Some(500L))
    assert(opts("kafka.bootstrap.servers") == "k1:9092,k2:9092")
    assert(opts("subscribe") == "events,clicks")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("kafka.group.id") == "graft-grp")
    assert(opts("maxOffsetsPerTrigger") == "500")
    // defaults: latest, no group id / trigger cap injected
    val defaults = StreamOps.kafkaSourceOptions(Seq("k:9092"), Seq("t"))
    assert(defaults("startingOffsets") == "latest")
    assert(!defaults.contains("kafka.group.id") && !defaults.contains("maxOffsetsPerTrigger"))
    // explicit per-partition offsets JSON passes through
    assert(StreamOps.kafkaSourceOptions(Seq("k:9092"), Seq("t"),
      autoOffsetReset = """{"t":{"0":42}}""")("startingOffsets") == """{"t":{"0":42}}""")
    intercept[IllegalArgumentException](StreamOps.kafkaSourceOptions(Nil, Seq("t")))
    intercept[IllegalArgumentException](StreamOps.kafkaSourceOptions(Seq("k:9092"), Nil))
    intercept[IllegalArgumentException](
      StreamOps.kafkaSourceOptions(Seq("k:9092"), Seq("t"), autoOffsetReset = "oldest"))
    intercept[IllegalArgumentException](
      StreamOps.kafkaSourceOptions(Seq("k:9092"), Seq("t"), maxPollRecords = Some(0L)))
  }

  test("kafkaEnvelope: wire frame → reference envelope (decoded key, parsed+flattened value)") {
    val valueSchema = StructType(Seq(
      StructField("user", StringType), StructField("amount", LongType)))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val wire = Seq(
      ("events", 0, 100L, ts, "k1".getBytes("UTF-8"),
        """{"user":"alice","amount":7}""".getBytes("UTF-8")),
      ("events", 1, 200L, ts, null.asInstanceOf[Array[Byte]],
        """{"user":"bob","amount":9}""".getBytes("UTF-8")),
      ("events", 1, 201L, ts, "k3".getBytes("UTF-8"),
        "not json".getBytes("UTF-8"))
    ).toDF("topic", "partition", "offset", "timestamp", "key", "value")
    val out = StreamOps.kafkaEnvelope(wire, valueSchema).orderBy("offset").collect()
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("topic", "partition", "offset", "kafka_timestamp", "key", "user", "amount"),
      "envelope = reference fields + flattened value")
    assert(out(0).getString(4) == "k1" && out(0).getString(5) == "alice" && out(0).getLong(6) == 7L)
    assert(out(1).isNullAt(4), "null key decodes to null, not a crash")
    assert(out(1).getString(5) == "bob")
    assert(out(2).isNullAt(5) && out(2).isNullAt(6),
      "malformed JSON value → null fields (permissive parse), record survives")
  }

  // ---------------------------------------------------------------- Kafka sink

  test("kafkaPayload: whole row as JSON value, stringified key, null-safe") {
    val df = Seq((1L, "alice", Some(2.5)), (2L, null.asInstanceOf[String], None))
      .toDF("id", "name", "score")
    val keyed = Sinks.kafkaPayload(df, "id").orderBy("key").collect()
    assert(keyed.head.schema.fieldNames.toSeq == Seq("key", "value"))
    assert(keyed(0).getString(0) == "1", "key is the stringified key column")
    val v0 = graft.core.Json.parse(keyed(0).getString(1)).asInstanceOf[Map[String, Any]]
    assert(v0("id") == 1L && v0("name") == "alice" && v0("score") == 2.5,
      s"value is the whole row as JSON: $v0")
    val v1 = graft.core.Json.parse(keyed(1).getString(1)).asInstanceOf[Map[String, Any]]
    assert(!v1.contains("name") && !v1.contains("score"),
      "null fields are omitted by to_json (the reference maps NaN→None/null)")
    // keyless form: single value column
    val keyless = Sinks.kafkaPayload(df)
    assert(keyless.columns.toSeq == Seq("value"))
    intercept[IllegalArgumentException](Sinks.kafkaPayload(df, "nope"))
  }

  // ------------------------------------------------- environment probe (r9)

  test("environment probe: s3a/kafka classes stay absent — else upgrade rows 22/23/26 to live I/O specs") {
    // Round-9 probe (VERDICT r8 #6): zero of the jars on the runtime
    // classpath carry org.apache.hadoop.fs.s3a or org.apache.kafka.clients,
    // and offline coursier forbids adding hadoop-aws / kafka-clients — so
    // the s3a hop and a loopback KRaft broker are ENVIRONMENT-IMPOSSIBLE,
    // not merely untested. This test pins that finding: if a future
    // environment ships the classes, it FAILS, which is the signal to
    // replace the config-shape gates with live localhost round-trip specs
    // (an S3-compatible HTTP stub FileSystem; an embedded broker).
    def absent(cls: String): Boolean =
      try { Class.forName(cls); false } catch { case _: ClassNotFoundException => true }
    val probes = Seq(
      "org.apache.hadoop.fs.s3a.S3AFileSystem",
      "org.apache.kafka.clients.consumer.KafkaConsumer",
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")
    // negative path (round 10): the probe MECHANISM must detect presence —
    // a classloader quirk that made absent() true for everything would
    // silently green this test forever
    assert(!absent("org.apache.spark.sql.SparkSession"),
      "probe helper reports a loaded class as absent — the probe is broken, not the environment")
    val present = probes.filterNot(absent)
    assert(present.isEmpty,
      s"connector classes now AVAILABLE: ${present.mkString(", ")} — upgrade COVERAGE " +
        "rows 22/23/26 from config-shape gates to live loopback I/O specs")
  }
}
