package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up stress generator: writes an sf≈1 replica (N self-consistent
  * copies of /root/testdata/sf0.1, default 10) so the heavy operators
  * can be timed at 10× the bench scale — the "would the plan survive a
  * scale-up" question answered by measurement instead of plan reading.
  *
  * Each copy's keys are offset by a copy-sized stride so every copy is a
  * closed join universe (lineitem→orders→customer, events' user ids,
  * documents' doc ids, embeddings' vec ids); nation/region stay shared
  * dims, exactly how a 10× TPC-H corpus grows. Document text gets a
  * copy-salt token appended, so WITHIN-copy near-dup structure is
  * preserved while cross-copy exact-dup collapse is broken for the
  * hash-equality family; cross-copy pairs remain near-dups for the
  * signature family — deliberately, that is the duplication shape a
  * 10×-grown web corpus actually has, and it is what the hot-bucket
  * caps exist for. Embeddings ride unperturbed (cross-copy exact
  * duplicates): SemDeDup's per-cluster election must absorb 10-deep
  * duplicate groups, which is its real job.
  *
  * Usage: runMain graft.tools.ScaleUp [outDir] [copies]
  * (defaults /tmp/testdata-sf1, 10 — idempotent: skips tables whose
  * output already exists).
  */
object ScaleUp {

  private val STRIDE = 100000000L // > any sf0.1 key, keeps ids disjoint

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/testdata-sf1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(appName = "graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")
    try {
      def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")

      /** N copies of `df`, each transformed by `remap(copyIndex)`. */
      def replicate(df: DataFrame)(remap: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until copies).map(c => remap(df, c)).reduce(_ unionAll _)

      def off(c: Int)(col0: org.apache.spark.sql.Column) = col0 + lit(c * STRIDE)

      val tables: Seq[(String, () => DataFrame)] = Seq(
        "lineitem" -> (() => replicate(src("lineitem")) { (df, c) =>
          df.withColumn("l_orderkey", off(c)(col("l_orderkey")))
            .withColumn("l_partkey", off(c)(col("l_partkey")))
            .withColumn("l_suppkey", off(c)(col("l_suppkey")))
        }),
        "orders" -> (() => replicate(src("orders")) { (df, c) =>
          df.withColumn("o_orderkey", off(c)(col("o_orderkey")))
            .withColumn("o_custkey", off(c)(col("o_custkey")))
        }),
        "customer" -> (() => replicate(src("customer")) { (df, c) =>
          df.withColumn("c_custkey", off(c)(col("c_custkey")))
        }),
        "supplier" -> (() => replicate(src("supplier")) { (df, c) =>
          df.withColumn("s_suppkey", off(c)(col("s_suppkey")))
        }),
        "part" -> (() => replicate(src("part")) { (df, c) =>
          df.withColumn("p_partkey", off(c)(col("p_partkey")))
        }),
        "nation" -> (() => src("nation")),
        "region" -> (() => src("region")),
        "events" -> (() => replicate(src("events")) { (df, c) =>
          df.withColumn("event_id", off(c)(col("event_id")))
            .withColumn("user_id", off(c)(col("user_id")))
        }),
        "documents" -> (() => replicate(src("documents")) { (df, c) =>
          val salted =
            if (c == 0) df
            else df.withColumn("text", concat(col("text"), lit(s" copytoken$c")))
          salted.withColumn("doc_id", off(c)(col("doc_id")))
            .withColumn("n_chars", length(col("text")).cast("long"))
        }),
        "embeddings" -> (() => replicate(src("embeddings")) { (df, c) =>
          df.withColumn("vec_id", off(c)(col("vec_id")))
        })
      )

      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      tables.foreach { case (name, build) =>
        val dest = s"$outDir/$name.parquet"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(dest))) {
          println(s"skip $name (exists)")
        } else {
          build().write.mode("overwrite").parquet(dest)
          println(s"wrote $name")
        }
      }
    } finally spark.stop()
  }
}
