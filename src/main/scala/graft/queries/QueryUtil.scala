package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object QueryUtil {
  /** Driver contract: query = (session, sfDir) => DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** Table loader. `events.ts` has shipped as two parquet encodings across
    * driver testdata builds: TIMESTAMP(NANOS) (unreadable natively —
    * PARQUET_TYPE_ILLEGAL — so it's read as raw nanos via
    * legacy.parquet.nanosAsLong and truncated to µs), and TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Branch on the schema
    * actually read and normalize BOTH to a µs TimestampType: the session
    * timezone is UTC, so the NTZ→TZ cast preserves the wall-clock value
    * DuckDB sees when it reads the same file naively, and oracles agree
    * under either encoding.
    */
  /** Rounding for order-dependent float aggregates: Spark rounds the decimal
    * string (HALF_UP), DuckDB the binary value — exact decimal halves (common
    * with cent-valued data) disagree systematically, and partial-agg ordering
    * adds ±ulp noise. Nudging by 1e-9 (≫ ulp at 1e5-magnitude, ≪ the rounding
    * grid) moves values off razor boundaries in BOTH engines. Oracles use
    * `round(x + 1e-9, n)` to match.
    */
  def roundf(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    round(c + lit(1e-9), n)

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = s.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df // already a µs TimestampType
      }
    } else s.read.parquet(s"$dir/$name.parquet")
}
