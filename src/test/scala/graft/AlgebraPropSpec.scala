package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{OpCompiler, OpSpec}
import graft.ops.Relational

/** ScalaCheck op-algebra properties (SURVEY §5): laws the compiled op chains
  * must satisfy on arbitrary data, independent of any oracle. Generators are
  * driven manually (fixed seeds, 8 samples per law) — the scalatest+scalacheck
  * bridge artifact isn't in the offline cache, and determinism across rounds
  * is a feature here anyway.
  */
class AlgebraPropSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    id <- Gen.choose(0, 1000)
    grp <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.choose(-100.0, 100.0)
  } yield (id, grp, v)

  private val dataGen = Gen.listOfN(60, rowGen)

  private def samples: Seq[List[(Int, String, Double)]] =
    (1 to 8).map(i => dataGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("filter ∘ select ≡ select ∘ filter (when filter cols survive projection)") {
    samples.foreach { rows =>
      val df = rows.toDF("id", "grp", "v")
      val a = OpCompiler.compile(Seq(
        OpSpec.FilterCondition("v > 0"), OpSpec.Select(Seq("id", "v"))))(df)
      val b = OpCompiler.compile(Seq(
        OpSpec.Select(Seq("id", "v")), OpSpec.FilterCondition("v > 0")))(df)
      assert(a.orderBy("id", "v").collect().toSeq == b.orderBy("id", "v").collect().toSeq)
    }
  }

  test("two filters compose conjunctively in either order") {
    samples.foreach { rows =>
      val df = rows.toDF("id", "grp", "v")
      val a = Relational.filterCondition(Relational.filterCondition(df, "v > -50"), "id < 500")
      val b = Relational.filterCondition(Relational.filterCondition(df, "id < 500"), "v > -50")
      val c = Relational.filterCondition(df, "v > -50 AND id < 500")
      assert(a.count() == b.count() && b.count() == c.count())
    }
  }

  test("deduplicate is idempotent and bounded by group count") {
    samples.foreach { rows =>
      val df = rows.toDF("id", "grp", "v")
      val once = Relational.deduplicate(df, subset = Seq("grp"), orderBy = Seq("id", "v"))
      val twice = Relational.deduplicate(once, subset = Seq("grp"), orderBy = Seq("id", "v"))
      assert(once.count() == twice.count())
      assert(once.count() <= 4) // ≤ #distinct grp values
      assert(once.orderBy("grp").collect().toSeq == twice.orderBy("grp").collect().toSeq)
    }
  }

  test("melt preserves cell count; grouped agg is partitioning-invariant") {
    samples.foreach { rows =>
      val df = rows.toDF("id", "grp", "v").withColumn("v2", $"v" * 2)
      val melted = Relational.melt(df, Seq("id", "grp"), Seq("v", "v2"))
      assert(melted.count() == df.count() * 2)
      val agg1 = Relational.aggregate(df, Seq("grp"), Seq("v" -> "count"))
      val agg2 = Relational.aggregate(df.repartition(7), Seq("grp"), Seq("v" -> "count"))
      assert(agg1.orderBy("grp").collect().toSeq == agg2.orderBy("grp").collect().toSeq)
    }
  }

  test("union-all count adds; semi+anti partition the left side") {
    samples.foreach { rows =>
      val df = rows.toDF("id", "grp", "v")
      val hi = df.filter($"v" >= 0); val lo = df.filter($"v" < 0)
      assert(hi.count() + lo.count() == df.count())
      val right = df.filter($"grp" === "a").select($"id".as("rid")).distinct()
      val semi = Relational.join(df, right, condition = "id = rid", joinType = "left_semi")
      val anti = Relational.join(df, right, condition = "id = rid", joinType = "left_anti")
      assert(semi.count() + anti.count() == df.count())
    }
  }

  test("redactPii is idempotent; repetitionRatio stays within [0, 1]") {
    import org.apache.spark.sql.functions._
    val texts = Seq(
      "plain prose without identifiers",
      "mail a@b.co or c.d@e.org, dial 555-123-4567, ping 8.8.8.8",
      "<EMAIL> already redacted stays fixed",
      "x " * 200, // extreme repetition
      ""
    ).zipWithIndex.map(_.swap).toDF("id", "t")
    val once = texts.select(col("id"), graft.text.TextLib.redactPii(col("t")).as("r1"))
    val twice = once.select(col("id"), graft.text.TextLib.redactPii(col("r1")).as("r2"), col("r1"))
    twice.collect().foreach(r => assert(r.getString(1) == r.getString(2), s"not idempotent: ${r.getString(2)}"))
    val ratios = texts.select(graft.text.TextLib.repetitionRatio(col("t"), 3)).collect().map(_.getDouble(0))
    ratios.foreach(x => assert(x >= 0.0 && x <= 1.0, s"ratio out of range: $x"))
  }

  test("paragraphDedup is idempotent; winnow fingerprints nest in gram sets") {
    import org.apache.spark.sql.functions._
    val boiler = "subscribe to the newsletter and follow our channels"
    val docs = (1L to 40L).map { i =>
      val body = (0 until 6).map(j => s"w${(i * 5 + j) % 23} token$j content").mkString(" ")
      (i, s"$body\n\n$boiler")
    }.toDF("doc_id", "text")
    val once = graft.text.Dedup.paragraphDedup(docs, "text", "doc_id")
    val twice = graft.text.Dedup.paragraphDedup(once, "text", "doc_id")
    val a = once.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val b = twice.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "a deduped corpus must be a fixed point")
    // winnow ⊆ gram-hash set (minima come from the gram hashes themselves)
    val rows = docs.select(
        graft.text.TextLib.winnowFingerprint(col("text"), 3, 4).as("fp"),
        graft.expr.WordGramHashes(col("text"), 3).as("g")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toSet.subsetOf(r.getSeq[Long](1).toSet))
    }
  }

  test("quota/budget/shard laws: subset, caps, idempotence, partition-invariance") {
    samples.take(4).foreach { rows =>
      // unique keys materialized BEFORE Spark (monotonically_increasing_id
      // would re-evaluate differently after repartition)
      val df = rows.zipWithIndex
        .map { case ((_, grp, v), i) => (i.toLong, grp, v) }
        .toDF("id", "grp", "v")
      val all = df.select("id").as[Long].collect().toSet

      val q = graft.ops.Scale.quotaPerGroup(df, "grp", "id", quota = 5, preBuckets = 3)
      val qRows = q.select("grp", "id").as[(String, Long)].collect()
      assert(qRows.map(_._2).toSet.subsetOf(all))                     // subset law
      assert(qRows.groupBy(_._1).values.forall(_.length <= 5))        // cap law
      val qq = graft.ops.Scale.quotaPerGroup(q, "grp", "id", quota = 5, preBuckets = 3)
      assert(qq.select("grp", "id").as[(String, Long)].collect().toSet ==
        qRows.toSet)                                                  // idempotence

      val b = graft.ops.Scale.sampleToBudget(df.withColumn("w",
          org.apache.spark.sql.functions.abs($"v") + 1.0), "w", "grp", "id", budget = 50L)
      assert(b.select("id").as[Long].collect().toSet.subsetOf(all))   // subset law

      val s1 = graft.ops.Scale.shardAssign(df, "id", numShards = 4)
        .select("id", "shard", "pos").as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
      val s2 = graft.ops.Scale.shardAssign(df.repartition(9), "id", numShards = 4)
        .select("id", "shard", "pos").as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
      assert(s1 == s2)                                                // partition-invariance
      assert(s1.map(_._1).toSet == all)                               // total function
    }
  }

  test("tokenDivergence laws: identity is zero, KL non-negative, JS symmetric and ≤ ln 2") {
    val a = Seq((1L, "alpha beta beta gamma"), (2L, "alpha delta")).toDF("id", "t")
    val b = Seq((1L, "epsilon zeta zeta"), (2L, "eta theta iota kappa")).toDF("id", "t")
    val self = graft.text.TextLib.tokenDivergence(a, "t", a, "t")
      .head()
    assert(self.getDouble(0) == 0.0 && self.getDouble(1) == 0.0 && self.getDouble(2) == 0.0)
    val ab = graft.text.TextLib.tokenDivergence(a, "t", b, "t").head()
    val ba = graft.text.TextLib.tokenDivergence(b, "t", a, "t").head()
    assert(ab.getDouble(0) > 0 && ab.getDouble(1) > 0)
    // swap symmetry within FP tolerance — the two runs sum identical terms
    // in different shuffle orders, so last-ulp differences are legitimate
    assert(math.abs(ab.getDouble(0) - ba.getDouble(1)) < 1e-12)
    assert(math.abs(ab.getDouble(1) - ba.getDouble(0)) < 1e-12)
    assert(math.abs(ab.getDouble(2) - ba.getDouble(2)) < 1e-12) // JS symmetric
    assert(ab.getDouble(2) > 0 && ab.getDouble(2) <= math.log(2.0) + 1e-12)
  }

  test("rrfFuse is list-order invariant and score-monotone in rank") {
    samples.take(4).foreach { rows =>
      // two ranked lists derived from the sample: ids ranked by v and by id
      val df = rows.toDF("id", "grp", "v").dropDuplicates("id").limit(30)
      val byV = df.withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"v".desc, $"id"))).select(
        org.apache.spark.sql.functions.lit(1L).as("qid"), $"id", $"rank")
      val byId = df.withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"id"))).select(
        org.apache.spark.sql.functions.lit(1L).as("qid"), $"id", $"rank")
      val ab = graft.text.Search.rrfFuse(Seq(byV, byId), "qid", "id", k = 10)
        .orderBy("rank").collect().map(r => (r.getInt(1), r.getDouble(2)))
      val ba = graft.text.Search.rrfFuse(Seq(byId, byV), "qid", "id", k = 10)
        .orderBy("rank").collect().map(r => (r.getInt(1), r.getDouble(2)))
      assert(ab.toSeq == ba.toSeq, "fusion must not depend on list order")
      // rrf_score non-increasing down the fused ranking
      ab.map(_._2).sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    }
  }

  test("sessionize: ids contiguous from 1 per key, non-decreasing in event time") {
    samples.take(3).foreach { rows =>
      val df = rows.map { case (id, grp, v) =>
        (grp, new java.sql.Timestamp(1700000000000L + (math.abs(v) * 1e7).toLong + id))
      }.toDF("u", "ts")
      val out = graft.functions.TimeSeriesLib.sessionize(df, "ts", 30L, Seq("u"))
        .select($"u", $"ts", $"session_id").orderBy("u", "ts")
        .as[(String, java.sql.Timestamp, Long)].collect()
      out.groupBy(_._1).foreach { case (_, evs) =>
        val sids = evs.sortBy(_._2.getTime).map(_._3)
        assert(sids.head == 1L, "first session of each key is 1")
        sids.sliding(2).foreach {
          case Array(a, b) => assert(b == a || b == a + 1, s"session ids must step by ≤1: $a -> $b")
          case _ =>
        }
      }
    }
  }

  test("approx aggregates track exact within tolerance") {
    samples.take(3).foreach { rows =>
      val df = rows.toDF("id", "grp", "v")
      val exact = df.agg(org.apache.spark.sql.functions.countDistinct($"id")).head().getLong(0)
      val approx = df.agg(org.apache.spark.sql.functions.approx_count_distinct($"id")).head().getLong(0)
      assert(math.abs(approx - exact).toDouble / math.max(exact, 1) < 0.1)
      val p50e = df.agg(org.apache.spark.sql.functions.percentile($"v", org.apache.spark.sql.functions.lit(0.5))).head().getDouble(0)
      val p50a = df.agg(org.apache.spark.sql.functions.percentile_approx($"v",
        org.apache.spark.sql.functions.lit(0.5), org.apache.spark.sql.functions.lit(10000))).head().getDouble(0)
      assert(math.abs(p50e - p50a) < 10.0)
    }
  }
}
