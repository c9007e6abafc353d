package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 5000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum($"v").as("v_sum"), count($"v").as("v_count"))
    val salted = Scale.aggregateSalted(df, Seq("k"), Seq("v" -> "sum", "v" -> "count"), 8)
    assert(salted.orderBy("k").collect().toSeq == plain.orderBy("k").collect().toSeq)
  }

  test("salted join equals plain join and spreads the hot key") {
    val left = (1 to 2000).map(i => (if (i % 2 == 0) "hot" else s"k${i % 20}", i)).toDF("k", "lv")
    val right = Seq(("hot", 100), ("k1", 1), ("k3", 3)).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).agg(sum($"lv" * $"rv")).head().getLong(0)
    val salted = Scale.saltedJoin(left, right, Seq("k"), 8).agg(sum($"lv" * $"rv")).head().getLong(0)
    assert(plain == salted)
  }

  test("excludeKeysBloom with an empty blocklist keeps the corpus intact") {
    // Regression: BloomFilterAggregate yields null for a zero-row input;
    // both filter branches went null → the whole corpus was dropped.
    val corpus = (1L to 100L).map(i => (i, s"doc$i")).toDF("id", "body")
    val emptyBlock = Seq.empty[Long].map(Tuple1(_)).toDF("bad_id")
    assert(Scale.excludeKeysBloom(corpus, "id", emptyBlock, "bad_id").count() == 100)
  }

  test("excludeKeysBloom equals exact anti-join (no false drops, no leaks)") {
    val corpus = (1L to 5000L).map(i => (i, s"doc$i")).toDF("id", "body")
    val block = (1L to 5000L).filter(_ % 7 == 0).map(Tuple1(_)).toDF("bad_id")
    val got = Scale.excludeKeysBloom(corpus, "id", block, "bad_id", fpp = 0.01)
      .select("id").as[Long].collect().toSet
    val expected = corpus.join(block.withColumnRenamed("bad_id", "id"), Seq("id"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.forall(_ % 7 != 0) && got.size == 5000 - 5000 / 7)
  }

  test("ExactPercentile custom aggregate matches built-in percentile") {
    val df = (1 to 999).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(graft.expr.ExactPercentile($"v", 0.5).as("p50g"),
        percentile($"v", lit(0.5)).as("p50b"))
      .collect()
    got.foreach(r => assert(r.getDouble(1) == r.getDouble(2), r.toString))
    // partial-aggregation path (serialize/merge) is exercised across partitions
    val wide = df.repartition(7)
    val one = wide.agg(graft.expr.ExactPercentile($"v", 0.95)).head().getDouble(0)
    val ref = wide.agg(percentile($"v", lit(0.95))).head().getDouble(0)
    assert(one == ref)
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"
    val df = (1 to 300).map(i => (i, s"2024-0${i % 3 + 1}", i * 1.0)).toDF("id", "month", "v")
    graft.sources.Sinks.parquetPartitioned(df, dir, Seq("month"))
    val read = spark.read.parquet(dir).filter($"month" === "2024-02")
    read.collect()
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"), s"no partition pruning:\n$plan")
    assert(read.count() == 100)
  }

  test("parquetSized compacts a tiny result into few files (small-files fix)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sized").toString + "/t"
    // 64 upstream partitions of trivial data: a plain write emits ~64 shards
    val df = spark.range(0, 1000, 1, 64).toDF("id")
    graft.sources.Sinks.parquetSized(df, dir, targetMB = 64)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files <= 4, s"expected AQE rebalance to coalesce 64 shards, got $files files")
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("dynamic partition overwrite rewrites only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dyn").toString + "/t"
    val v1 = Seq((1, "m1", 1.0), (2, "m2", 2.0)).toDF("id", "month", "v")
    graft.sources.Sinks.parquetPartitioned(v1, dir, Seq("month"))
    // backfill m2 only; m1 must survive
    val v2 = Seq((9, "m2", 9.0)).toDF("id", "month", "v")
    graft.sources.Sinks.parquetPartitioned(v2, dir, Seq("month"), dynamicOverwrite = true)
    val out = spark.read.parquet(dir).orderBy("id").select("id").as[Int].collect()
    assert(out.toSeq == Seq(1, 9)) // m1 kept, m2 replaced
  }

  test("bucketed tables join without a shuffle") {
    // warehouse.dir is static — tables land in the default spark-warehouse;
    // clear any stale table + location from earlier runs
    Seq("graft_bucket_a", "graft_bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "bv")
    Scale.writeBucketed(a, "graft_bucket_a", Seq("id"), 8)
    Scale.writeBucketed(b, "graft_bucket_b", Seq("id"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-side path
    try {
      val joined = Scale.bucketedJoin(spark, "graft_bucket_a", "graft_bucket_b", Seq("id"))
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("quotaPerGroup equals the single-window formulation and is repartition-stable") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 3000).map { i =>
      // one hot group (2000 rows) and 50 small ones (20 rows each, under quota)
      (if (i <= 2000) "hot" else s"g${i % 50}", i.toLong)
    }.toDF("grp", "id")
    val got = Scale.quotaPerGroup(df, "grp", "id", quota = 25, preBuckets = 8)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val w = Window.partitionBy($"grp").orderBy(xxhash64($"id", lit(42)).asc, $"id".asc)
    val naive = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 25)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got == naive)
    // groups under quota keep everything
    val small = naive.count(_._1 != "hot")
    assert(small == 1000 && got.count(_._1 == "hot") == 25)
    // pure function of the data, not the partitioning
    val re = Scale.quotaPerGroup(df.repartition(13), "grp", "id", quota = 25, preBuckets = 3)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(re == got)
  }

  test("sampleToBudget keeps ~budget weight per group, all of under-budget groups") {
    val df = (1 to 4000).map { i =>
      // "big" carries ~40k weight, "small" ~1k
      (if (i <= 2000) "big" else "small", i.toLong, if (i <= 2000) 20L else 1L)
    }.toDF("grp", "id", "w")
    val kept = Scale.sampleToBudget(df, "w", "grp", "id", budget = 4000L)
      .select("grp", "id", "w").as[(String, Long, Long)].collect()
    // under-budget group is untouched
    assert(kept.count(_._1 == "small") == 2000)
    // over-budget group lands near frac = 4000/40000 = 10% of its weight
    val bigW = kept.filter(_._1 == "big").map(_._3).sum
    assert(bigW > 2000 && bigW < 6400, s"kept big-group weight $bigW, wanted ~4000")
    // pure function of the key: same kept set under repartitioning
    val re = Scale.sampleToBudget(df.repartition(11), "w", "grp", "id", budget = 4000L)
      .select("id").as[Long].collect().toSet
    assert(re == kept.map(_._2).toSet)
  }

  test("temperatureSample reweights toward n^alpha and never upsamples") {
    // groups: 400 "big" rows, 100 "small" rows
    val df = ((1L to 400L).map(i => (i, "big")) ++ (401L to 500L).map(i => (i, "small")))
      .toDF("id", "grp")
    // alpha=0.5: w = (20, 10), tot = 30; totalRows = 150 →
    // frac_big = 150·20/30/400 = 0.25, frac_small = 150·10/30/100 = 0.5
    val kept = Scale.temperatureSample(df, "grp", "id", alpha = 0.5, totalRows = 150)
      .select("id", "grp").as[(Long, String)].collect()
    val byG = kept.groupBy(_._2).map { case (g, v) => g -> v.length }
    assert(byG("big") > 60 && byG("big") < 140, s"big ≈ 100 expected, got $byG")
    assert(byG("small") > 30 && byG("small") < 70, s"small ≈ 50 expected, got $byG")
    // alpha=1 degenerates to one uniform rate (proportions preserved)
    val prop = Scale.temperatureSample(df, "grp", "id", alpha = 1.0, totalRows = 250)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(prop("big") > 3 * prop("small"), s"alpha=1 must keep proportions: $prop")
    // a group whose target exceeds its size keeps ALL rows (no upsampling)
    val all = Scale.temperatureSample(df, "grp", "id", alpha = 0.0, totalRows = 1000)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(all("small") == 100L, s"under-budget group must keep everything: $all")
    // pure function of the key: stable under repartitioning
    val re = Scale.temperatureSample(df.repartition(13), "grp", "id", alpha = 0.5, totalRows = 150)
      .select("id").as[Long].collect().toSet
    assert(re == kept.map(_._1).toSet)
  }

  test("temperatureSample: NULL groups form their own group (null-safe join)") {
    val df = ((1L to 200L).map(i => (i, Option("web"))) ++ (201L to 400L).map(i => (i, Option.empty[String])))
      .toDF("id", "grp")
    // alpha=1 → one uniform 50% rate; null-group rows must be gated too,
    // not dropped by the broadcast equi-join
    val byG = Scale.temperatureSample(df, "grp", "id", alpha = 1.0, totalRows = 200)
      .groupBy("grp").count().as[(Option[String], Long)].collect().toMap
    assert(byG.contains(None), s"null group vanished: $byG")
    assert(byG(None) > 50 && byG(None) < 150, s"null group ≈ 100 expected: $byG")
  }

  test("temperatureSample: 50k distinct groups analyze and run in bounded time") {
    // VERDICT r4: the old when-chain built a 100k-node Catalyst expression
    // for high-cardinality group columns — analysis-time blowup. The
    // broadcast-join gate must handle mixture recipes at domain cardinality.
    val df = (1L to 100000L).map(i => (i, s"domain_${i % 50000}")).toDF("id", "grp")
    val t0 = System.nanoTime()
    val n = Scale.temperatureSample(df, "grp", "id", alpha = 0.7, totalRows = 20000).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n > 10000 && n < 40000, s"kept $n of 100k, wanted ≈20k")
    assert(secs < 60.0, s"50k-group temperatureSample took ${secs}s — analysis blowup?")
  }

  test("assignSplit is exhaustive, proportional, and append-stable") {
    val df = (1L to 5000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Scale.assignSplit(df, "id", splits)
      .select("id", "split").as[(Long, String)].collect()
    assert(s1.forall(_._2 != null), "weights summing to 1 must label every row")
    val counts = s1.groupBy(_._2).map { case (k, v) => k -> v.length }
    assert(counts("train") > 3800 && counts("train") < 4200, s"got $counts")
    assert(counts("val") > 350 && counts("val") < 650, s"got $counts")
    // growing the corpus never reassigns an existing key (hash-pure)
    val s2 = Scale.assignSplit((1L to 10000L).toDF("id"), "id", splits)
      .filter(col("id") <= 5000).select("id", "split").as[(Long, String)].collect()
    assert(s1.sortBy(_._1).toSeq == s2.sortBy(_._1).toSeq)
    // weights < 1 leave a null-labeled holdout
    val hold = Scale.assignSplit(df, "id", Seq("train" -> 0.5))
      .filter(col("split").isNull).count()
    assert(hold > 2300 && hold < 2700, s"expected ~half held out, got $hold")
  }

  test("chained gate ops stay decorrelated: sampled survivors still split") {
    // temperatureSample then assignSplit on the SAME key and default salts:
    // with a shared gate every survivor of a 50%-downsampled group would sit
    // below the train threshold and val/test would be silently empty
    val df = (1L to 4000L).map(i => (i, "web")).toDF("id", "grp")
    val sampled = Scale.temperatureSample(df, "grp", "id", alpha = 1.0, totalRows = 2000)
    val split = Scale.assignSplit(sampled, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(split.contains("val") && split("val") > 100,
      s"val band starved — gates correlated: $split")
    assert(split.contains("test") && split("test") > 100,
      s"test band starved — gates correlated: $split")
    // and repeatEpochs' fractional gate is independent of assignSplit's
    val rep = Scale.repeatEpochs(df, "grp", "id", Map("web" -> 1.5))
    val repSplit = Scale.assignSplit(rep, "id", Seq("train" -> 0.5, "val" -> 0.5))
      .filter(col("epoch") === 2).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(repSplit.getOrElse("val", 0L) > 600, s"epoch-2 rows must still split: $repSplit")
  }

  test("repeatEpochs repeats per recipe: fractional, zero, and default groups") {
    val df = ((1L to 400L).map(i => (i, "en")) ++ (401L to 500L).map(i => (i, "de")) ++
      (501L to 600L).map(i => (i, "zz"))).toDF("id", "lang")
    val out = Scale.repeatEpochs(df, "lang", "id", Map("en" -> 2.5, "de" -> 0.0))
      .select("id", "lang", "epoch").as[(Long, String, Int)].collect()
    val en = out.filter(_._2 == "en").groupBy(_._1).map(_._2.length)
    assert(en.forall(n => n == 2 || n == 3), "en docs appear 2 or 3 times")
    val enTotal = out.count(_._2 == "en")
    assert(enTotal > 850 && enTotal < 1150, s"~1000 en rows expected, got $enTotal")
    assert(!out.exists(_._2 == "de"), "0 epochs drops the group")
    val zz = out.filter(_._2 == "zz")
    assert(zz.length == 100 && zz.forall(_._3 == 1), "unlisted groups kept once")
    // epoch indices are dense 1..n per key
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }

  test("shardAssign is deterministic, balanced, and densely positioned") {
    val df = (1L to 4000L).toDF("id")
    val a = Scale.shardAssign(df, "id", numShards = 16)
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    // positions within a shard are exactly 1..n with no gaps or dupes
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // uniform hash → no shard more than 2× the mean at this n
    val sizes = a.groupBy(_._2).map(_._2.length)
    assert(sizes.size == 16 && sizes.max < 2 * 4000 / 16, s"skewed shards: $sizes")
    // stable under repartitioning (pure function of the key)
    val b = Scale.shardAssign(df.repartition(7), "id", numShards = 16)
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  /** JVM replica of weightedSample's selection key for the differential. */
  private def esKey(key: String, w: Double, salt: Int = 42): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$key".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val h60 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    math.log((h60.toDouble + 1.0) / math.pow(2.0, 60)) / w
  }

  test("weightedSample: differential vs JVM md5 replica, exclusions, determinism") {
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble)) ++
      Seq((201L, 0.0), (202L, -1.0)) // non-positive weights never select
    val df = rows.toDF("id", "w")
    val out = Scale.weightedSample(df, "w", "id", 20)
      .select($"id", $"w", $"es_key").as[(Long, Double, Double)].collect()
    assert(out.length == 20)
    assert(!out.exists(r => r._1 == 201L || r._1 == 202L))
    // engine keys equal the independent JVM md5+ln replica bit-for-bit
    out.foreach { case (id, w, es) =>
      assert(esKey(id.toString, w) == es, s"es mismatch for id=$id")
    }
    // the kept set IS the global top-20 of the replica's keys
    val expect = (1L to 200L).map(i => i -> esKey(i.toString, (i % 7 + 1).toDouble))
      .sortBy { case (id, es) => (-es, id) }.take(20).map(_._1).toSet
    assert(out.map(_._1).toSet == expect)
    // partitioning-independent
    val again = Scale.weightedSample(df.repartition(11), "w", "id", 20)
      .select($"id").as[Long].collect().toSet
    assert(again == expect)
  }

  test("weightedSample grouped: k per group, contiguous ranks, heavy weight wins") {
    val df = ((1L to 50L).map(i => (i, "g" + (i % 2), 1.0)) :+ (99L, "g0", 1e9))
      .toDF("id", "g", "w")
    val out = Scale.weightedSample(df, "w", "id", 5, groupCols = Seq("g"))
      .select($"g", $"id", $"rank").as[(String, Long, Int)].collect()
    assert(out.count(_._1 == "g0") == 5 && out.count(_._1 == "g1") == 5)
    out.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq == (1 to 5).toSeq, "ranks contiguous per group")
    }
    // ln(u)/1e9 ≈ 0 dominates every unit-weight key (P(miss) ~ e^-1e9·ε)
    assert(out.find(_._2 == 99L).get._3 == 1, "the 1e9-weight row ranks first in its group")
  }

  /** Textbook ITERATIVE water-filling (the loop the closed form replaces):
    * repeatedly cap the smallest-capacity group whose cap fits under the
    * current equal share, then split what remains equally. Differential
    * truth for unimaxAllocation's prefix-sum formulation.
    */
  private def waterfallRef(caps: Seq[(String, Long)], budget: Long): Map[String, Double] = {
    var pool = caps.sortBy { case (g, c) => (c, g) }.toList
    var rem = BigInt(budget)
    val out = scala.collection.mutable.Map[String, Double]()
    while (pool.nonEmpty) {
      val (g, c) = pool.head
      if (BigInt(c) * pool.size <= rem) { out(g) = c.toDouble; rem -= c; pool = pool.tail }
      else {
        val level = rem.toDouble / pool.size // the one double op, same as the operator's
        pool.foreach { case (g2, _) => out(g2) = level }
        pool = Nil
      }
    }
    out.toMap
  }

  test("unimaxAllocation: hand fixture caps the small groups, levels the rest") {
    // weights: a=100, b=200, c=1000; E=2 → caps 200/400/2000; budget 1500
    // waterfall: L=3 level 500 → a caps (200); level 650 → b caps (400);
    // c gets the remaining 900 (0.9 epochs)
    val df = (Seq.fill(10)(("a", 10L)) ++ Seq.fill(10)(("b", 20L)) ++
      Seq.fill(10)(("c", 100L))).toDF("grp", "w")
    val out = Scale.unimaxAllocation(df, "grp", "w", budget = 1500L, maxEpochs = 2.0)
      .orderBy("grp").collect()
    val byG = out.map(r => r.getAs[String]("grp") ->
      (r.getAs[Long]("cap"), r.getAs[Boolean]("capped"),
        r.getAs[Double]("allocation"), r.getAs[Double]("epochs"))).toMap
    assert(byG("a") == ((200L, true, 200.0, 2.0)))
    assert(byG("b") == ((400L, true, 400.0, 2.0)))
    assert(byG("c")._1 == 2000L && !byG("c")._2 && byG("c")._3 == 900.0)
    assert(math.abs(byG("c")._4 - 0.9) < 1e-12)
  }

  test("unimaxAllocation: budget above total capacity caps everything, surplus unspent") {
    val df = Seq(("a", 100L), ("b", 300L)).toDF("grp", "w")
    val out = Scale.unimaxAllocation(df, "grp", "w", budget = 10000L, maxEpochs = 3.0)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Boolean]("capped"))
      assert(r.getAs[Double]("allocation") == r.getAs[Long]("cap").toDouble)
      assert(math.abs(r.getAs[Double]("epochs") - 3.0) < 1e-9)
    }
  }

  test("unimaxAllocation equals the iterative waterfall on random mixtures") {
    // AlgebraPropSpec convention: manual ScalaCheck generators, fixed seeds
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val mixGen = for {
      nGroups <- Gen.choose(2, 8)
      weights <- Gen.listOfN(nGroups, Gen.choose(1L, 5000L))
      budgetFrac <- Gen.choose(0.05, 3.0)
      epochs <- Gen.oneOf(0.5, 1.0, 2.0, 3.5)
    } yield (weights, budgetFrac, epochs)
    (1 to 10).foreach { seed =>
      val (weights, bf, e) = mixGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val rows = weights.zipWithIndex.map { case (w, i) => (s"g$i", w) }
      val budget = math.max(1L, (bf * weights.sum).toLong)
      val df = rows.toDF("grp", "w")
      val got = Scale.unimaxAllocation(df, "grp", "w", budget, e).collect()
        .map(r => r.getAs[String]("grp") -> r.getAs[Double]("allocation")).toMap
      val caps = rows.map { case (g, w) => g -> math.floor(w * e + 1e-6).toLong }
      val want = waterfallRef(caps, budget)
      assert(got.keySet == want.keySet, s"seed $seed")
      got.foreach { case (g, a) =>
        assert(a == want(g), s"seed $seed group $g: got $a want ${want(g)}")
      }
      // invariants: never over cap, never over budget (modulo the one
      // double division), epochs bounded by maxEpochs
      val capOf = caps.toMap
      got.foreach { case (g, a) => assert(a <= capOf(g) + 1e-6, s"seed $seed $g over cap") }
      assert(got.values.sum <= budget + 1e-6 * got.size, s"seed $seed over budget")
    }
  }

  test("unimaxAllocation: zero- and all-null-weight groups cap at 0 and steal nothing") {
    // round-10 review catches, both probe-confirmed pre-fix: a zero-weight
    // group DIVIDE_BY_ZEROed the epochs division under ANSI, and an
    // all-null-weight group got capped=NULL → the uncapped branch → a full
    // level share stolen from real groups
    val df = Seq(("a", Some(20L)), ("a", Some(20L)), ("z", Some(0L)),
      ("n", None: Option[Long]), ("n", None: Option[Long])).toDF("grp", "w")
    val out = Scale.unimaxAllocation(df, "grp", "w", budget = 30L, maxEpochs = 2.0).collect()
    val byG = out.map(r => r.getAs[String]("grp") ->
      ((r.getAs[Long]("cap"), r.getAs[Double]("allocation"), r.getAs[Double]("epochs")))).toMap
    assert(byG("z") == ((0L, 0.0, 0.0)), s"zero-weight group: ${byG("z")}")
    assert(byG("n") == ((0L, 0.0, 0.0)), s"all-null-weight group: ${byG("n")}")
    assert(byG("a")._2 == 30.0, s"the real group absorbs the whole budget: ${byG("a")}")
    // and the sampler emits nothing for the empty groups
    val sampled = Scale.unimaxSample(df.withColumn("id", monotonically_increasing_id()),
        "grp", "w", "id", budget = 30L, maxEpochs = 2.0)
      .select("grp").as[String].collect()
    assert(sampled.forall(_ == "a"), s"only the real group materializes: ${sampled.toSeq}")
  }

  test("unimaxApply on a persisted allocation equals the fused unimaxSample") {
    // the fit/apply split (DSIR/CCNet pattern): allocate once, persist,
    // apply to any later frame — must reproduce the fused path exactly
    // (epochs round-trip bit-exact through parquet)
    val df = ((1L to 50L).map(i => (i, "a", 2L)) ++ (101L to 200L).map(i => (i, "b", 10L)))
      .toDF("id", "grp", "w")
    val fused = Scale.unimaxSample(df, "grp", "w", "id", budget = 700L, maxEpochs = 2.0)
      .select($"id", $"grp", $"epoch").as[(Long, String, Int)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ux_alloc").toString
    Scale.unimaxAllocation(df, "grp", "w", budget = 700L, maxEpochs = 2.0)
      .write.mode("overwrite").parquet(dir)
    val applied = Scale.unimaxApply(df, spark.read.parquet(dir), "grp", "id")
      .select($"id", $"grp", $"epoch").as[(Long, String, Int)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(applied == fused, "apply(frozen allocation) ≡ fused sample")
    // a group missing from the allocation is dropped, not defaulted
    val foreign = Seq((999L, "zz", 1L)).toDF("id", "grp", "w")
    assert(Scale.unimaxApply(foreign, spark.read.parquet(dir), "grp", "id").count() == 0)
  }

  test("unimaxAllocation: equal caps cap together — allocation is tie-order independent") {
    // if cap_a == cap_b, a's capping test (c·k ≤ rem) is EXACTLY b's test
    // after a caps ((c·(k−1) ≤ rem−c)), so equal caps always decide the
    // same way and the waterfall never depends on how ties sort (this is
    // why null-group sort-order differences between engines cannot change
    // the result). Fixture: two equal small caps right at the boundary.
    val df = Seq(("a", 100L), ("b", 100L), ("c", 1000L)).toDF("grp", "w")
    // caps 100/100/1000 at E=1; budget 240: level 80 → neither a nor b caps
    val low = Scale.unimaxAllocation(df, "grp", "w", budget = 240L, maxEpochs = 1.0)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Boolean]("capped")).toMap
    assert(!low("a") && !low("b"), s"equal caps above the level both stay uncapped: $low")
    // budget 360: level 120 → a caps (100·3 ≤ 360), then b (100·2 ≤ 260)
    val high = Scale.unimaxAllocation(df, "grp", "w", budget = 360L, maxEpochs = 1.0)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Boolean]("capped"), r.getAs[Double]("allocation"))).toMap
    assert(high("a") == ((true, 100.0)) && high("b") == ((true, 100.0)), s"both cap: $high")
    assert(high("c") == ((false, 160.0)), s"c levels at the remainder: $high")
  }

  test("unimaxSample repeats each group per its allocation epochs, deterministically") {
    // a: 50 keys × w=2 (cap 200 = full 2 epochs), b: 100 keys × w=10;
    // budget 700 → a caps at 200, b gets 500 = 0.5 epochs
    val df = ((1L to 50L).map(i => (i, "a", 2L)) ++ (101L to 200L).map(i => (i, "b", 10L)))
      .toDF("id", "grp", "w")
    val out = Scale.unimaxSample(df, "grp", "w", "id", budget = 700L, maxEpochs = 2.0)
      .select($"id", $"grp", $"epoch").as[(Long, String, Int)].collect()
    val aRows = out.filter(_._2 == "a")
    assert(aRows.length == 100, "every a-key exactly twice (2.0 epochs)")
    aRows.groupBy(_._1).values.foreach(c => assert(c.map(_._3).sorted.toSeq == Seq(1, 2)))
    val bRows = out.filter(_._2 == "b")
    // 0.5 epochs → the stable ~half of keys under the gate, each epoch=1
    assert(bRows.forall(_._3 == 1))
    assert(bRows.length > 20 && bRows.length < 80, s"got ${bRows.length} b-rows")
    // pure function of the key: repartitioning changes nothing
    val again = Scale.unimaxSample(df.repartition(13), "grp", "w", "id",
        budget = 700L, maxEpochs = 2.0)
      .select($"id", $"grp", $"epoch").as[(Long, String, Int)].collect()
    assert(again.sortBy(r => (r._1, r._3)).toSeq == out.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("assignSplitLeakageSafe: cluster members share a split; singletons match plain assignSplit (round 12)") {
    // 3000 singleton docs + duplicate families of sizes 2..4 labeled by a
    // component-min cluster frame (the clusterCandidates output shape)
    val singles = (1L to 3000L).map(i => (i, -1L))
    val fams = (0 until 300).flatMap { f =>
      val base = 10000L + f * 10
      val size = 2 + f % 3
      (0 until size).map(m => (base + m, base)) // (id, cluster_id)
    }
    val df = (singles.map(_._1) ++ fams.map(_._1)).toDF("id")
    val clusters = fams.toDF("id", "cluster_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Scale.assignSplitLeakageSafe(df, "id", clusters, splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    // leakage property: every family member shares the family's split
    fams.groupBy(_._2).foreach { case (_, members) =>
      val got = members.map(m => out(m._1)).distinct
      assert(got.length == 1, s"family split must be uniform, got $got")
    }
    // singleton property: identical to plain assignSplit on the own id
    val plain = Scale.assignSplit((1L to 3000L).toDF("id"), "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert((1L to 3000L).forall(i => out(i) == plain(i)))
    // proportions over clusters stay near the weights
    val fTrain = out.values.count(_ == "train").toDouble / out.size
    assert(fTrain > 0.74 && fTrain < 0.86, s"train fraction $fTrain")
    // leakage demonstration: plain id-splitting scatters at least one family
    val naive = Scale.assignSplit(df, "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val scattered = fams.groupBy(_._2).exists { case (_, ms) =>
      ms.map(m => naive(m._1)).distinct.length > 1 }
    assert(scattered, "the fixture should demonstrate the leakage hole being closed")
  }
}
