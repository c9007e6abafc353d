package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object QueryUtil {
  /** Driver contract: query = (session, sfDir) => DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** Table loader. `events.ts` is parquet TIMESTAMP(NANOS), which Spark does
    * not read natively (PARQUET_TYPE_ILLEGAL): read it as raw nanos
    * (legacy.parquet.nanosAsLong) and truncate to a µs TimestampType —
    * the same truncation DuckDB's µs formatting applies, so oracles agree.
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
      s.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else s.read.parquet(s"$dir/$name.parquet")
}
