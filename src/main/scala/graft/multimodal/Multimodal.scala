package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media payloads are opaque `binary` columns with a typed
  * metadata struct; decode/featurize steps run distributed via
  * `mapPartitions` over batched rows (the Scala analogue of `mapInPandas`
  * batch plumbing).
  *
  * STUB NOTE: this container ships no image/audio codecs, so `decode*` below
  * are clearly-marked deterministic FAKES (hash-derived features with the
  * right shapes). The Spark-side contract — schema, batching, partitioning,
  * null passthrough — is real and tested; swapping in a true codec is a
  * one-function change.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", MediaMetaSchema)))

  /** Wrap raw binary + fields into the canonical media struct columns. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              format: String, width: Int = 0, height: Int = 0, durationMs: Long = 0L): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(lit(format).as("format"), lit(width).as("width"), lit(height).as("height"),
        lit(durationMs).as("duration_ms")).as("meta"))

  /** STUB decoder: deterministic `dim`-float feature vector derived from the
    * payload bytes (xxhash64 seeded per index). Real plumbing: evaluated
    * per-partition, codegen'd, null payload → null features.
    */
  def decodeToFeatures(df: DataFrame, payloadCol: String, dim: Int = 16,
                       outCol: String = "features"): DataFrame =
    df.withColumn(outCol,
      when(col(payloadCol).isNull, lit(null))
        .otherwise(transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col(payloadCol), i), lit(1000L)).cast("double") / 500.0) - 1.0)))

  /** STUB resize: records the target dims in metadata and truncates the
    * payload proportionally — shape-correct placeholder for a real resampler.
    */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame =
    df.withColumn("meta",
        struct(col("meta.format").as("format"), lit(targetW).as("width"),
          lit(targetH).as("height"), col("meta.duration_ms").as("duration_ms")))
      .withColumn("payload",
        expr(s"substring(payload, 1, greatest(1, int(length(payload) * 0.5)))"))

  /** Frame sampling for video payloads: every `everyMs` milliseconds of the
    * declared duration, emit (media_id, frame_idx, frame_payload). The frame
    * extraction itself is a STUB byte-slice; the explode/partition shape is
    * the real contract (rows fan out, downstream repartitions by media_id).
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0L), greatest(expr(s"meta.duration_ms div $everyMs") - 1, lit(0L)))))
      .withColumn("frame_payload",
        expr("substring(payload, int(frame_idx * 16) + 1, 16)"))
      .select("media_id", "frame_idx", "frame_payload")

  /** Batched per-partition featurizer — the mapPartitions path for codecs
    * that need library calls (not expressible as Catalyst expressions).
    * Processes rows in `batchSize` groups (arrow-style batch shape).
    */
  def featurizeBatched(df: DataFrame, payloadCol: String, dim: Int = 16,
                       batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = inSchema.add("features", ArrayType(DoubleType))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // STUB "codec call" per batch: deterministic hash features.
        batch.map { row =>
          val payload = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val feats: Array[Double] =
            if (payload == null) null
            else {
              var h = 1125899906842597L
              payload.foreach(b => h = h * 31 + b)
              // floorMod: signed % would put negative-hash features in
              // [-3, 1), diverging from decodeToFeatures' pmod range [-1, 1)
              Array.tabulate(dim)(i => (Math.floorMod(h + i * 2654435761L, 1000L).toDouble / 500.0) - 1.0)
            }
          Row.fromSeq(row.toSeq :+ (if (feats == null) null else feats.toSeq))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
