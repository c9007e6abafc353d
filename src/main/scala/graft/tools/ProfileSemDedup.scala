package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level timing of the q_semantic_dedup composite at a given SF dir
  * (dev diagnostic — where do the ~10 s at sf0.1 actually go?).
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(appName = "graft-profile-semdedup")
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val e = graft.queries.QueryUtil.t(spark, dir, "embeddings")
      val corpus = e.unionByName(e.withColumn("vec_id", col("vec_id") + 100000L))
      time("warmup read count")(corpus.count())
      time("full query (count)") {
        graft.vec.SemDedup.semanticDupGroups(corpus, "vec_id", "embedding",
          threshold = 0.999, nClusters = 16).count()
      }
      time("full query again")(
        graft.vec.SemDedup.semanticDupGroups(corpus, "vec_id", "embedding",
          threshold = 0.999, nClusters = 16).count())
      val unitBase = graft.vec.VectorOps.l2Normalize(
        corpus.select(col("vec_id").as("__id"), col("embedding").as("__v")), "__v", "__u")
        .filter(col("__id").isNotNull && col("__u").isNotNull && !exists(col("__u"), _.isNull))
        .select("__id", "__u")
      val sample = time("sampleFromUnit") {
        val m = graft.vec.Pq.getClass.getDeclaredMethods
          .find(_.getName == "sampleFromUnit").get
        m.setAccessible(true)
        m.invoke(graft.vec.Pq, unitBase, Int.box(100000), Long.box(42L))
          .asInstanceOf[Array[Array[Double]]]
      }
      time("lloyd") {
        val m = graft.vec.Pq.getClass.getDeclaredMethods.find(_.getName == "lloyd").get
        m.setAccessible(true)
        m.invoke(graft.vec.Pq, sample, Int.box(16), Int.box(20), Long.box(42L))
      }
      time("corpus collect")(corpus.collect().length)
      time("unitBase collect")(unitBase.collect().length)
      time("unitBase limit collect")(unitBase.limit(100001).collect().length)
      time("unitBase limit again")(unitBase.limit(100001).collect().length)
      val noHof = graft.vec.VectorOps.l2Normalize(
        corpus.select(col("vec_id").as("__id"), col("embedding").as("__v")), "__v", "__u")
        .filter(col("__id").isNotNull && col("__u").isNotNull)
        .select("__id", "__u")
      time("no-HOF limit collect")(noHof.limit(100001).collect().length)
    } finally spark.stop()
  }
}
