package graft

import org.apache.spark.sql.functions._
import graft.text.Dsir

/** DSIR importance resampling (text/Dsir.scala). The string-feature
  * variant is oracle-gated (q_dsir_weights); this spec pins (a) the
  * SEMANTICS the oracle can't state — target-like raw docs must outweigh
  * target-unlike ones, (b) the hashed scale variant against a driver-side
  * replay that reuses only the WordGramHashes kernel (itself parity-gated
  * in ExprParitySweepSpec/TextExprsSpec) for the hashing, (c) the
  * resampling composition, and (d) the null/empty contracts.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (100L, "alpha beta gamma delta alpha beta"),
    (101L, "alpha gamma epsilon beta alpha"),
    (102L, "beta delta alpha gamma gamma")
  ).toDF("doc_id", "text")

  private def raw = Seq(
    (1L, "alpha beta gamma delta epsilon"),            // target-like
    (2L, "zeta eta theta iota kappa"),                 // disjoint from target
    (3L, "alpha beta alpha beta alpha beta"),          // very target-like
    (4L, ""),                                          // no features
    (5L, null.asInstanceOf[String])                    // null text
  ).toDF("doc_id", "text")

  test("target-like docs outweigh target-unlike ones; zero-feature docs are neutral") {
    val out = Dsir.logWeights(raw, target, "text", "doc_id")
      .select("doc_id", "log_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), s"raw rows must all come back: ${out.keySet}")
    assert(out(1L) > out(2L), s"target-like (${out(1L)}) must outweigh disjoint (${out(2L)})")
    assert(out(3L) > out(2L))
    assert(out(2L) < 0.0, "a fully target-disjoint doc must score below the neutral ratio")
    assert(out(4L) == 0.0 && out(5L) == 0.0, s"zero-feature docs report the neutral 0.0: $out")
  }

  test("string-variant weights equal a from-scratch driver replay") {
    // independent replay: Scala tokenization + multiset counts + smoothing,
    // no shared code with the operator beyond the tokenization SPEC
    def toks(t: String): Seq[String] =
      Option(t).map(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq).getOrElse(Nil)
    def feats(t: String): Seq[String] = {
      val w = toks(t)
      w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val tgtRows = target.select("text").as[String].collect()
    val rawRows = raw.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val tc = tgtRows.flatMap(feats).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rc = rawRows.flatMap(r => feats(r._2)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = (tc.keySet ++ rc.keySet)
    val (nT, nR, v) = (tc.values.sum.toDouble, rc.values.sum.toDouble, vocab.size.toDouble)
    def lw(f: String): Double =
      math.log((tc.getOrElse(f, 0L) + 1.0) / (nT + v)) - math.log((rc.getOrElse(f, 0L) + 1.0) / (nR + v))
    val want = rawRows.map { case (id, t) => id -> feats(t).map(lw).sum }.toMap
    val got = Dsir.logWeights(raw, target, "text", "doc_id")
      .select("doc_id", "log_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 1e-9, s"doc $id: engine=${got(id)} replay=$w")
  }

  test("hashed scale variant equals a driver replay over the kernel's own hashes") {
    val buckets = 1 << 16
    // collect the positional gram hashes the kernel produces (the hashing
    // itself is parity-gated elsewhere), then replay counts/smoothing with
    // V = bucket space in plain Scala
    def hashes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Long])] =
      df.filter(col("doc_id").isNotNull).select(col("doc_id"),
          flatten(array(Seq(1, 2).map(n =>
            coalesce(graft.expr.WordGramHashes(col("text"), n),
              array().cast("array<bigint>"))): _*)).as("h"))
        .as[(Long, Seq[Long])].collect().toSeq
    def bucketsOf(h: Seq[Long]): Seq[Long] = h.map(x => java.lang.Math.floorMod(x, buckets.toLong))
    val tb = hashes(target).flatMap(r => bucketsOf(r._2))
    val rb = hashes(raw).map(r => r._1 -> bucketsOf(r._2))
    val tc = tb.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rc = rb.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (nT, nR, v) = (tb.length.toDouble, rb.map(_._2.length).sum.toDouble, buckets.toDouble)
    def lw(b: Long): Double =
      math.log((tc.getOrElse(b, 0L) + 1.0) / (nT + v)) - math.log((rc.getOrElse(b, 0L) + 1.0) / (nR + v))
    val want = rb.map { case (id, bs) => id -> bs.map(lw).sum }.toMap
    val got = Dsir.logWeightsHashed(raw, target, "text", "doc_id", buckets = buckets)
      .select("doc_id", "log_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 1e-9, s"doc $id: engine=${got(id)} replay=$w")
    // and the semantics survive hashing
    assert(got(1L) > got(2L) && got(3L) > got(2L))
  }

  test("DsirWeights save/load: the frozen model round-trips bit-exactly (round 10)") {
    val buckets = 1 << 12
    val model = Dsir.fitHashed(raw, target, "text", buckets = buckets)
    val path = java.nio.file.Files.createTempDirectory("graft_dsir_model").toString
    Dsir.saveModel(spark, model, path)
    val loaded = Dsir.loadModel(spark, path)
    assert(loaded.buckets == model.buckets)
    assert(java.util.Arrays.equals(loaded.weights, model.weights),
      "weight table must round-trip bit-exactly through parquet")
    val a = Dsir.applyHashed(raw, "text", model)
      .select("doc_id", "log_weight").collect().map(_.toString).sorted.toSeq
    val b = Dsir.applyHashed(raw, "text", loaded)
      .select("doc_id", "log_weight").collect().map(_.toString).sorted.toSeq
    assert(a == b, "loaded-model apply must equal in-memory-model apply exactly")
  }

  test("fitHashed + applyHashed: the fitted kernel gates a STREAM, values match the batch fit") {
    // the point of the train-then-apply split: the fit's count aggregations
    // cannot run per micro-batch, but the collected B-bounded table scores
    // any frame as a pure map — including a streaming one. Fit on the batch
    // fixture, apply to the SAME rows arriving as a stream, compare to the
    // fused batch formulation.
    val buckets = 1 << 12
    val model = graft.text.Dsir.fitHashed(raw, target, "text", buckets = buckets)
    val batch = graft.text.Dsir.logWeightsHashed(raw, target, "text", "doc_id", buckets = buckets)
      .select("doc_id", "log_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // batch apply agrees with the fused aggregate (the q_dsir_hashed_law claim)
    val applied = graft.text.Dsir.applyHashed(raw, "text", model)
      .select("doc_id", "log_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, w) <- batch)
      assert(math.abs(applied(id) - w) < 1e-9, s"doc $id: apply=${applied(id)} agg=$w")
    // streaming apply: same rows through a MemoryStream → memory sink
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)]
    val q = graft.text.Dsir.applyHashed(
        in.toDF().toDF("doc_id", "text"), "text", model)
      .writeStream.format("memory").queryName("dsir_stream").outputMode("append").start()
    try {
      in.addData(raw.select("doc_id", "text").as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, log_weight FROM dsir_stream")
        .as[(Long, Double)].collect().toMap
      assert(streamed.keySet == batch.keySet)
      for ((id, w) <- batch)
        assert(math.abs(streamed(id) - w) < 1e-9, s"stream doc $id: ${streamed(id)} vs $w")
    } finally q.stop()
  }

  test("select: resampling prefers target-like docs, k bounds the output, plan is sane") {
    // DSIR semantics: the importance ratio rewards features COMMON in
    // target but RARE in raw — so the preference only dominates when the
    // target model is concentrated (ct >> cr for the shared features) and
    // the target-like docs are a raw minority. (Two earlier versions of
    // this fixture got the normalization backwards: a raw corpus rich in
    // target-like text drives those features' raw probabilities UP and the
    // ratio down — the paper's intended behavior.) Here ct=50 vs cr=5 per
    // shared feature gives per-doc log weights ≈ +14 vs −6 for disjoint
    // docs — an e^20 weight ratio, so the A-ES sample is deterministic.
    val bigTarget = (1 to 50).map(i => (1000L + i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val bigRaw = ((1 to 5).map(i => (i.toLong, "alpha beta gamma delta " + s"x$i")) ++
      (6 to 40).map(i => (i.toLong, s"z$i y$i w$i v$i u$i"))).toDF("doc_id", "text")
    val picked = Dsir.select(bigRaw, bigTarget, "text", "doc_id", k = 10)
    assertNoCartesian(picked)
    val ids = picked.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 10, s"k=10 rows expected, got ${ids.size}")
    val targetLike = ids.count(_ <= 5L)
    assert(targetLike == 5,
      s"all 5 target-like docs must be sampled (their exp-weights dominate the " +
        s"35 disjoint docs): $targetLike/5 picked, ids=$ids")
  }
}
