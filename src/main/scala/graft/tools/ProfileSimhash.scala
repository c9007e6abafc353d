package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level timing of simhashCandidates at a given SF dir (dev
  * diagnostic — where does the time/memory go at scale-stress SFs?).
  */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(appName = "graft-profile-simhash")
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Dedup
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val docs = graft.queries.QueryUtil.t(spark, dir, "documents")
      time("warmup read count")(docs.count())
      val sigs = Dedup.simhash(docs, "text", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("simhash materialize")(sigs.count())
      val groups = sigs.groupBy(col("simhash"))
        .agg(count(lit(1)).as("__gsz"),
          graft.expr.BoundedMinList(col("id"), 1000).as("__ids"))
        .withColumn("__rep", col("__ids").getItem(0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[profile] groups=${time("groups materialize")(groups.count())}")
      val blockStructs = (0 until 4).map { i =>
        struct(lit(i).as("blk"), shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL).as("v"))
      }
      val blocks = groups.select(col("__rep").as("id"), explode(array(blockStructs: _*)).as("b"))
        .select(col("id"), col("b.blk").as("blk"), col("b.v").as("v"))
      val repPairs = Dedup.bucketPairs(blocks, Seq("blk", "v"), 1000)
        .join(groups.select(col("__rep").as("id_a"), col("simhash").as("sh_a")), Seq("id_a"))
        .join(groups.select(col("__rep").as("id_b"), col("simhash").as("sh_b")), Seq("id_b"))
        .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
      println(s"[profile] repPairs=${time("repPairs (cached inputs)")(repPairs.count())}")
      println("[profile] group depth stats:")
      groups.agg(max(col("__gsz")), avg(col("__gsz")),
        sum(when(col("__gsz") > 1, 1).otherwise(0)),
        sum(when(col("__gsz") > 1000, 1).otherwise(0))).show(false)
      spark.sharedState.cacheManager.clearCache()
      for (round <- 1 to 2) {
        spark.sharedState.cacheManager.clearCache()
        println(s"[profile] pairs=${time(s"collapsed full (r$round)")(
          Dedup.simhashCandidates(docs, "text", "doc_id", maxHamming = 3).count())}")
      }
    } finally spark.stop()
  }
}
