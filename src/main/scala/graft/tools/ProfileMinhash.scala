package graft.tools

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextLib}

/** Scratch profiler for the MinHash-LSH pipeline stages (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(32, 32, "profile-minhash")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val mutated = d.withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", regexp_replace(col("text"), "\\s+\\S+\\s*$", ""))
    val docs = d.unionByName(mutated)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time("0 corpus scan")(docs.write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => docs.count() })
    time("1 shingles only")(docs.select(col("doc_id"), TextLib.shingles(col("text"), 3).as("sh"))
      .write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => 0L })
    time("2 signatures")(docs.select(col("doc_id"), Dedup.minhashSignature(col("text"), 3, 64).as("sig"))
      .write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => 0L })
    val sigs = docs.select(col("doc_id").as("id"), Dedup.minhashSignature(col("text"), 3, 64).as("sig"))
      .withColumn("bh", explode(Dedup.lshBandHashes(col("sig"), 16, 4)))
      .select(col("id"), col("sig"), col("bh.band").as("band"), col("bh.h").as("bucket"))
    time("3 sigs+bands")(sigs.write.format("noop").mode("overwrite").save().asInstanceOf[Unit] match { case _ => 0L })
    time("4 full candidates")(Dedup.minhashCandidates(docs, "text", "doc_id", 3, 64, 16, 0.4).count())

    // BASELINE COMPARISON: the pre-r3 sizes-join → self-join → dedup
    // formulation, timed stage by stage. minhashCandidates itself now runs
    // the one-exchange bucketPairs path (stage 4 above) — keep this block to
    // quantify old-vs-new, not to tune the live code path.
    val sigsP = docs.select(col("doc_id").as("id"), Dedup.minhashSignature(col("text"), 3, 64).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("4a persist sigs")(sigsP.count())
    val buckets = sigsP.select(col("id"), explode(Dedup.lshBandHashes(col("sig"), 16, 4)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("bucket"))
    val bucketSizes = buckets.groupBy("band", "bucket").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= 1000 && col("bsz") > 1)
    time("4b bucket sizes")(bucketSizes.count())
    val inBuckets = buckets.join(bucketSizes, Seq("band", "bucket"))
    val a = inBuckets.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = inBuckets.select(col("band"), col("bucket"), col("id").as("id_b"))
    val rawPairs = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    time("4c raw pairs")(rawPairs.count())
    val dedupPairs = rawPairs.dropDuplicates("id_a", "id_b")
    time("4d dedup pairs")(dedupPairs.count())
    val est = dedupPairs
      .join(sigsP.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigsP.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m)) / lit(64.0))
      .filter(col("est_jaccard") >= 0.4)
    time("4e est+filter")(est.count())
    spark.stop()
  }
}
