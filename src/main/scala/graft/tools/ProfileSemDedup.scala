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

      // ---- phase replication of semanticDupGroups (threshold .999, k 16)
      spark.sharedState.cacheManager.clearCache()
      val cents = {
        val m = graft.vec.Pq.getClass.getDeclaredMethods.find(_.getName == "lloyd").get
        m.setAccessible(true)
        m.invoke(graft.vec.Pq, sample, Int.box(16), Int.box(20), Long.box(42L))
          .asInstanceOf[Array[Array[Double]]]
      }
      val centArr = typedlit(cents.map(_.toSeq).toSeq)
      def centAt(i: Int) = element_at(centArr, i + 1)
      def nearest(u: org.apache.spark.sql.Column) = {
        val scored = array(cents.indices.map { i =>
          struct((lit(1.0) - graft.expr.DotProduct(u, centAt(i))).as("d"), lit(i).as("l"))
        }: _*)
        when(graft.expr.DotProduct(u, centAt(0)).isNotNull, array_min(scored).getField("l"))
      }
      val unit0 = unitBase.withColumnRenamed("__id", "id")
        .withColumn("__cl", nearest(col("__u")))
        .filter(col("__cl").isNotNull)
        .withColumn("__cc", graft.expr.DotProduct(col("__u"), element_at(centArr, col("__cl") + 1)))
        .withColumn("__selfdup",
          coalesce(graft.expr.DotProduct(col("__u"), col("__u")) >= lit(0.999), lit(false)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[profile] unit0 rows=${time("unit0 materialize")(unit0.count())}")
      val identGroups = unit0.filter(col("__selfdup"))
        .groupBy(col("__u").as("__gu"))
        .agg(min(col("id")).as("__grep"), count(lit(1)).as("__ggsz"))
        .filter(col("__ggsz") >= 2)
      println(s"[profile] identGroups=${time("identGroups agg")(identGroups.count())}")
      val unit = unit0.join(identGroups, unit0("__u") === identGroups("__gu"), "left")
        .withColumn("__rep", when(col("__selfdup"), coalesce(col("__grep"), col("id"))).otherwise(col("id")))
        .withColumn("__gsz", coalesce(col("__ggsz"), lit(1L)))
        .drop("__gu", "__grep", "__ggsz")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[profile] unit rows=${time("unit join-back materialize")(unit.count())}")
      val reps = unit.filter(col("id") === col("__rep"))
      val pairs = graft.text.Dedup.bucketPairs(
          reps.select(col("id"), col("__cl")), Seq("__cl"), 10000)
        .join(reps.select(col("id").as("id_a"), col("__u").as("__ua")), Seq("id_a"))
        .join(reps.select(col("id").as("id_b"), col("__u").as("__ub")), Seq("id_b"))
        .filter(graft.expr.DotProduct(col("__ua"), col("__ub")) >= 0.999)
        .select("id_a", "id_b")
      println(s"[profile] pairs=${time("rep pairs (cached unit)")(pairs.count())}")
      val repGroups = graft.text.Dedup.clusterCandidates(pairs)
      println(s"[profile] repGroups=${time("connected components")(repGroups.count())}")

      // bench-shaped runs: cleared data cache, warm codegen, noop write
      val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties.getProperty("spark.job.description")).getOrElse("")
          val site = Option(js.properties.getProperty("callSite.short")).getOrElse("")
          jobTimes.put(js.jobId, (js.time, s"$site | ${desc.take(60)}"))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobTimes.get(je.jobId)).foreach { case (t0, d) =>
            println(f"[job] ${je.jobId}%4d ${(je.time - t0) / 1e3}%7.2f s  $d")
          }
          jobTimes.remove(je.jobId)
        }
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = (for (a <- si.completionTime; b <- si.submissionTime) yield (a - b) / 1e3).getOrElse(-1.0)
          val m = si.taskMetrics
          if (dur > 1.0)
            println(f"[stage] ${si.stageId}%4d ${dur}%7.2f s tasks=${si.numTasks}%3d run=${m.executorRunTime / 1e3}%8.1f cpu=${m.executorCpuTime / 1e9}%8.1f gc=${m.jvmGCTime / 1e3}%5.1f  ${si.name.take(60)}")
        }
      }
      for (r <- 1 to 2) {
        spark.sharedState.cacheManager.clearCache()
        if (r == 2) spark.sparkContext.addSparkListener(listener)
        time(s"full query, cleared cache (r$r)") {
          graft.vec.SemDedup.semanticDupGroups(corpus, "vec_id", "embedding",
              threshold = 0.999, nClusters = 16)
            .orderBy("id")
            .write.format("noop").mode("overwrite").save()
        }
        if (r == 2) { Thread.sleep(500); spark.sparkContext.removeSparkListener(listener) }
      }

      // exact lazy replica of the internal chain up to clusterCandidates'
      // limit-collect: NO pre-counts, caches cleared — the real first action
      spark.sharedState.cacheManager.clearCache()
      val unit0L = unitBase.withColumnRenamed("__id", "id")
        .withColumn("__cl", nearest(col("__u")))
        .filter(col("__cl").isNotNull)
        .withColumn("__cc", graft.expr.DotProduct(col("__u"), element_at(centArr, col("__cl") + 1)))
        .withColumn("__selfdup",
          coalesce(graft.expr.DotProduct(col("__u"), col("__u")) >= lit(0.999), lit(false)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val identGroupsL = unit0L.filter(col("__selfdup"))
        .groupBy(col("__u").as("__gu"))
        .agg(min(col("id")).as("__grep"), count(lit(1)).as("__ggsz"))
        .filter(col("__ggsz") >= 2)
      val unitL = unit0L.join(identGroupsL, unit0L("__u") === identGroupsL("__gu"), "left")
        .withColumn("__rep", when(col("__selfdup"), coalesce(col("__grep"), col("id"))).otherwise(col("id")))
        .withColumn("__gsz", coalesce(col("__ggsz"), lit(1L)))
        .drop("__gu", "__grep", "__ggsz")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val repsL = unitL.filter(col("id") === col("__rep"))
      val pairsL = graft.text.Dedup.bucketPairs(
          repsL.select(col("id"), col("__cl")), Seq("__cl"), 10000)
        .join(repsL.select(col("id").as("id_a"), col("__u").as("__ua")), Seq("id_a"))
        .join(repsL.select(col("id").as("id_b"), col("__u").as("__ub")), Seq("id_b"))
        .filter(graft.expr.DotProduct(col("__ua"), col("__ub")) >= 0.999)
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lim = pairsL.limit(2000001)
      println(s"[profile] lazy-chain rows=${time("limit-collect, lazy chain")(lim.collect().length)}")

      // incremental cost of each unit0 pipeline piece (uncached counts)
      spark.sharedState.cacheManager.clearCache()
      time("v1 unitBase count")(unitBase.count())
      val v2 = unitBase.withColumnRenamed("__id", "id").withColumn("__cl", nearest(col("__u")))
      time("v2 +nearest count")(v2.count())
      val v3 = v2.filter(col("__cl").isNotNull)
        .withColumn("__cc", graft.expr.DotProduct(col("__u"), element_at(centArr, col("__cl") + 1)))
        .withColumn("__selfdup",
          coalesce(graft.expr.DotProduct(col("__u"), col("__u")) >= lit(0.999), lit(false)))
      time("v3 +cc/selfdup count")(v3.count())
      time("v4 groupBy __u count")(v3.groupBy(col("__u")).count().count())
      time("v5 repartition on __u count")(v3.repartition(col("__u")).count())

      // the REAL unitFrame (native dropIfAnyNull unitize) vs the tool's
      // l2Normalize+exists replication — same downstream chain
      spark.sharedState.cacheManager.clearCache()
      val uf = {
        val m = graft.vec.Pq.getClass.getDeclaredMethods.find(_.getName == "unitFrame").get
        m.setAccessible(true)
        m.invoke(graft.vec.Pq, corpus, "vec_id", "embedding").asInstanceOf[org.apache.spark.sql.DataFrame]
      }
      println("[profile] dim=" + uf.select(size(col("__u"))).head().getInt(0))
      time("real unitFrame count")(uf.count())
      time("real unitFrame collect")(uf.collect().length)
      val r0 = uf.withColumnRenamed("__id", "id")
        .withColumn("__cl", nearest(col("__u")))
        .filter(col("__cl").isNotNull)
        .withColumn("__cc", graft.expr.DotProduct(col("__u"), element_at(centArr, col("__cl") + 1)))
        .withColumn("__selfdup",
          coalesce(graft.expr.DotProduct(col("__u"), col("__u")) >= lit(0.999), lit(false)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("real unit0 materialize")(r0.count())
      r0.unpersist()
      val r0b = uf.withColumnRenamed("__id", "id")
        .withColumn("__cl", nearest(col("__u")))
        .filter(col("__cl").isNotNull)
        .withColumn("__cc", graft.expr.DotProduct(col("__u"), element_at(centArr, col("__cl") + 1)))
        .withColumn("__selfdup",
          coalesce(graft.expr.DotProduct(col("__u"), col("__u")) >= lit(0.999), lit(false)))
      time("real unit0 NO persist, noop write")(
        r0b.write.format("noop").mode("overwrite").save())
      time("w1 unitize only, noop")(
        corpus.select(graft.expr.UnitizeExpr(col("embedding"), dropIfAnyNull = true).as("__u"))
          .write.format("noop").mode("overwrite").save())
      time("w2 nearest over unitFrame, noop")(
        uf.select(nearest(col("__u")).as("__cl"))
          .write.format("noop").mode("overwrite").save())
      time("w3 one dot over unitFrame, noop")(
        uf.select(graft.expr.DotProduct(col("__u"), centAt(0)).as("__d"))
          .write.format("noop").mode("overwrite").save())
      val w4 = uf.withColumnRenamed("__id", "id").withColumn("__cl", nearest(col("__u")))
        .filter(col("__cl").isNotNull)
      time("w4 +filter, noop")(w4.write.format("noop").mode("overwrite").save())
      val w5 = w4.withColumn("__cc",
        graft.expr.DotProduct(col("__u"), element_at(centArr, col("__cl") + 1)))
      time("w5 +cc, noop")(w5.write.format("noop").mode("overwrite").save())
      val w6 = w5.withColumn("__selfdup",
        coalesce(graft.expr.DotProduct(col("__u"), col("__u")) >= lit(0.999), lit(false)))
      time("w6 +selfdup, noop")(w6.write.format("noop").mode("overwrite").save())
      println("[plan] " + lim.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Sort") || l.contains("InMemory") || l.contains("Exchange") || l.contains("AdaptiveSparkPlan"))
        .take(40).mkString("\n[plan] "))
    } finally spark.stop()
  }
}
