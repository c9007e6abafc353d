package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level timing of minhashCandidates at a given SF dir (dev
  * diagnostic — what does the identical-signature collapse cost on a
  * duplicate-light corpus?).
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(appName = "graft-profile-minhash")
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Dedup
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val docs = graft.queries.QueryUtil.t(spark, dir, "documents")
      time("warmup read count")(docs.count())
      for (round <- 1 to 2) {
        spark.sharedState.cacheManager.clearCache()
        time(s"collapsed full (r$round)")(
          Dedup.minhashCandidates(docs, "text", "doc_id").count())
      }
      spark.sharedState.cacheManager.clearCache()
      val sigs = docs.select(col("doc_id").as("id"),
        Dedup.minhashSignature(col("text"), 3, 64).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("sigs materialize")(sigs.count())
      val groups = sigs.filter(col("sig").isNotNull)
        .groupBy(col("sig"))
        .agg(count(lit(1)).as("__gsz"),
          graft.expr.BoundedMinList(col("id"), 1000).as("__ids"))
        .withColumn("__rep", col("__ids").getItem(0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("groups materialize")(groups.count())
      val buckets = groups.select(col("__rep").as("id"),
          explode(Dedup.lshBandHashes(col("sig"), 16, 4)).as("bh"))
        .select(col("id"), col("bh.band").as("band"), col("bh.h").as("bucket"))
      val repPairs = Dedup.bucketPairs(buckets, Seq("band", "bucket"), 1000)
        .join(groups.select(col("__rep").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(groups.select(col("__rep").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .withColumn("est_jaccard",
          size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m)) / lit(64.0))
        .filter(col("est_jaccard") >= 0.5)
        .select("id_a", "id_b", "est_jaccard")
      time("repPairs (cached inputs)")(repPairs.count())
      val mem = groups.filter(col("__gsz").between(2, 1000))
        .select(col("__rep"), explode(col("__ids")).as("id"))
      time("mem (in-row)")(mem.count())
      time("within (in-plan)")(
        groups.filter(col("__gsz").between(2, 1000))
          .withColumn("__d", array_distinct(col("__ids")))
          .select(explode(flatten(transform(col("__d"), (x, i) =>
            transform(slice(col("__d"), i + lit(2), size(col("__d"))),
              y => struct(x.as("id_a"), y.as("id_b")))))).as("__p"))
          .count())
    } finally spark.stop()
  }
}
