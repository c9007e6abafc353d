package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale
import graft.text.{Bpe, Dedup, TextLib}

/** End-to-end composition of the curation surface — the op chain a real
  * training-data pipeline runs, in one flow. Composition is where defects
  * hide (column collisions, null propagation, order assumptions), so this
  * spec asserts cross-op invariants rather than per-op values.
  */
class CurationFlowSpec extends SparkSpec {
  import spark.implicits._

  test("dedup → quality → LM score → quota → BPE encode → pack → shard composes") {
    val base = (1L to 200L).map { i =>
      val words = (0 until (5 + (i % 20)).toInt)
        .map(j => s"word${(i * 7 + j * 3) % 40}").mkString(" ")
      (i, s"src${i % 4}", words)
    }
    // plant exact duplicates (id+1000 re-crawls) and a null-text doc
    val rows = base ++ base.take(30).map { case (i, s, t) => (i + 1000L, s, t) } :+
      ((2000L, "src0", null.asInstanceOf[String]))
    val docs = rows.toDF("doc_id", "source", "text")

    val deduped = Dedup.exact(docs, "text", "doc_id")
    assert(deduped.filter($"doc_id" > 1000 && $"doc_id" < 2000).count() == 0,
      "re-crawled duplicates must lose to the original ids")
    assert(deduped.filter($"doc_id" === 2000L).count() == 1, "null text passes dedup")

    val scored = TextLib.unigramScore(
      TextLib.qualityScore(deduped, "text"), "text", "doc_id")
    assert(scored.columns.contains("quality_score") && scored.columns.contains("lm_logprob"))

    val quota = Scale.quotaPerGroup(scored, "source", "doc_id", quota = 30)
    val bySource = quota.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource.values.forall(_ <= 30), s"quota violated: $bySource")

    val model = Bpe.trainMerges(quota.filter($"text".isNotNull), "text", numMerges = 20)
    assert(model.merges.nonEmpty)
    val enc = Bpe.encode(quota, "text", "doc_id", model)
    val lens = enc.select("doc_id", "bpe_len").as[(Long, Int)].collect().toMap
    assert(lens.filter(_._1 != 2000L).values.forall(_ > 0), "real docs must encode")
    // the null-text doc may or may not survive the hash quota — assert its
    // encode behavior on the pre-quota frame so the check can't go vacuous
    val nullEnc = Bpe.encode(scored.filter($"doc_id" === 2000L), "text", "doc_id", model)
      .select("bpe_len").as[Int].head()
    assert(nullEnc == 0, "null text encodes to empty")

    // packDocuments recomputes n_tokens from text — must REPLACE the
    // lm-score n_tokens, not collide with it
    val packed = TextLib.packDocuments(enc, "text", budgetTokens = 64,
      partitionCols = Seq("source"), orderCols = Seq("doc_id"))
    assert(packed.columns.count(_ == "n_tokens") == 1)

    val sharded = Scale.shardAssign(packed, "doc_id", numShards = 4)
    val out = sharded.select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(out.length == packed.count())
    assert(out.map(_._2).distinct.sorted.toSeq.forall(s => s >= 0 && s < 4))
    out.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length).toSeq, "pos must be dense per shard")
    }
  }

  test("perplexityBuckets: exact per-lang ntile — balanced, ordered, null-safe (round 9)") {
    // the dedicated rank-based operator (vs the quantile-threshold
    // composition below): buckets are EXACTLY balanced (±1 per group, no
    // tie-absorption), head scores >= tail scores within each group, and
    // unscoreable docs never shift a boundary
    val docs = ((1L to 31L).map { i =>
      (i, "en", (0 until 10).map(j => s"en${(i * 3 + j) % 11}").mkString(" "))
    } ++ (101L to 123L).map { i =>
      (i, "de", (0 until 10).map(j => s"de${(i * 5 + j) % 13}").mkString(" "))
    } ++ Seq((300L, "en", ""), (301L, "de", null.asInstanceOf[String])))
      .toDF("doc_id", "lang", "text")
    val out = graft.text.TextLib.perplexityBuckets(docs, "text", "doc_id",
        groupCols = Seq("lang"), nBuckets = 3)
      .select("doc_id", "lang", "lm_logprob", "ppl_bucket").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
    // token-free docs: null bucket, and the SCORED population still splits
    // into exact tertiles (31 → 11/10/10, 23 → 8/8/7)
    assert(out.filter(r => r._1 >= 300L).forall(_._4 == -1), "unscoreable docs must get a null bucket")
    for ((lang, n) <- Seq("en" -> 31, "de" -> 23)) {
      val g = out.filter(r => r._2 == lang && r._4 > 0)
      assert(g.length == n)
      val sizes = g.groupBy(_._4).view.mapValues(_.length).toMap
      assert(sizes.keySet == Set(1, 2, 3) && sizes.values.max - sizes.values.min <= 1,
        s"$lang ntile must balance exactly: $sizes")
      // ordering: every head (1) score >= every tail (3) score
      val head = g.filter(_._4 == 1).map(_._3)
      val tail = g.filter(_._4 == 3).map(_._3)
      assert(head.min >= tail.max - 1e-12, s"$lang head/tail inverted: ${head.min} < ${tail.max}")
    }
  }

  test("pplFit/pplApply: frozen floors ≡ batch ntile (mod boundary ties); the gate runs on a STREAM (round 10)") {
    import org.apache.spark.sql.expressions.Window
    val docs = ((1L to 31L).map { i =>
      (i, "en", (0 until 10).map(j => s"en${(i * 3 + j) % 11}").mkString(" "))
    } ++ (101L to 123L).map { i =>
      (i, "de", (0 until 10).map(j => s"de${(i * 5 + j) % 13}").mkString(" "))
    } ++ Seq((300L, "en", ""), (301L, "de", null.asInstanceOf[String])))
      .toDF("doc_id", "lang", "text")
    val model = graft.text.TextLib.pplFit(docs, "text", "doc_id", Seq("lang"), nBuckets = 3)
    // apply ≡ ntile modulo the documented tie policy (the q_ppl_fit_apply_law
    // claim, asserted here on a hostile fixture with heavy 6dp score ties)
    val applied = graft.text.TextLib.pplApply(docs, "text", model)
      .select($"doc_id", $"lang", round($"lm_logprob" + lit(1e-9), 6).as("r"),
        $"ppl_bucket".as("ba"))
    val ntiled = graft.text.TextLib.perplexityBuckets(docs, "text", "doc_id",
        groupCols = Seq("lang"), nBuckets = 3)
      .select($"doc_id", $"ppl_bucket".as("bn"))
    val w = Window.partitionBy($"lang", $"r")
    val j = applied.alias("__a").join(ntiled.alias("__n"), Seq("doc_id"))
      .withColumn("mb", min($"bn").over(w))
    assert(j.filter(!($"ba" <=> $"bn" || $"ba" <=> $"mb")).count() == 0,
      "apply must equal ntile except head-most assignment on boundary ties")
    assert(j.filter($"ba" <=> $"bn").count() >= 40, "ties must not dominate the fixture")
    // unscoreable docs and unfitted groups get a null bucket; a NEW doc in
    // a fitted group gates WITHOUT a refit
    val newDocs = Seq(
      (400L, "en", (0 until 10).map(j => s"en${j % 11}").mkString(" ")),
      (401L, "fr", "bonjour le monde entier"),
      (402L, "en", null.asInstanceOf[String])).toDF("doc_id", "lang", "text")
    val nb = graft.text.TextLib.pplApply(newDocs, "text", model)
      .select("doc_id", "ppl_bucket").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(nb(400L) >= 1 && nb(400L) <= 3, "known-group doc must bucket against frozen floors")
    assert(nb(401L) == -1, "unfitted group must get a null bucket")
    assert(nb(402L) == -1, "token-free doc must get a null bucket")
    // the streaming ingest gate: same rows through a MemoryStream → the
    // pure-map kernel + stream-static broadcast bounds join, vs batch apply
    val batchBuckets = graft.text.TextLib.pplApply(docs, "text", model)
      .select("doc_id", "ppl_bucket").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String, String)]
    val q = graft.text.TextLib.pplApply(
        in.toDF().toDF("doc_id", "lang", "text"), "text", model)
      .select("doc_id", "ppl_bucket")
      .writeStream.format("memory").queryName("ppl_stream").outputMode("append").start()
    try {
      in.addData(docs.as[(Long, String, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, ppl_bucket FROM ppl_stream").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
      assert(streamed == batchBuckets, "stream gate must equal batch apply")
    } finally q.stop()
  }

  test("langIdFit/langIdApply: trigram model separates real languages; stream ≡ batch; save/load bit-exact (round 11)") {
    // discriminative power is proven HERE on real sentences: the synthetic
    // documents corpus shares ONE vocabulary across its lang labels (like
    // the isotropic embeddings for ANN recall), so q_lang_id_model can only
    // gate the fit/apply ARITHMETIC, not separation
    val fitDocs = Seq(
      (1L, "en", "the cat is on the table and it was not happy with this situation at all"),
      (2L, "en", "there is a house in the town where the children play with their friends"),
      (3L, "de", "der Hund ist nicht mit der Katze auf den Tisch und das Haus ist schoen"),
      (4L, "de", "die Kinder spielen in dem Garten und sie haben einen schoenen Tag zusammen"),
      (5L, "fr", "le chat est dans la maison et il est pour les enfants de la ville"),
      (6L, "fr", "les amis jouent dans le jardin avec leurs enfants pendant la journee"),
      (7L, "es", "el gato es una mascota que vive en la casa con los ninos del pueblo"),
      (8L, "es", "los amigos juegan en el jardin con sus hijos durante todo el dia")
    ).toDF("doc_id", "lang", "text")
    val model = graft.text.TextLib.langIdFit(fitDocs, "text", "lang", n = 3, tableSize = 5000)
    assert(model.langs == Seq("de", "en", "es", "fr"))
    val held = Seq(
      (11L, "en", "the dog was in the house with the cat and the children"),
      (12L, "de", "der Garten und das Haus sind schoen und die Kinder spielen"),
      (13L, "fr", "le jardin de la maison est pour les enfants et leurs amis"),
      (14L, "es", "la casa del pueblo es para los ninos y sus amigos"),
      (15L, "xx", ""),
      (16L, "xx", null.asInstanceOf[String])
    ).toDF("doc_id", "lang", "text")
    val out = graft.text.TextLib.langIdApply(held, "text", model)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(11L) == "en" && out(12L) == "de" && out(13L) == "fr" && out(14L) == "es",
      s"held-out sentences must classify correctly: $out")
    assert(out(15L) == "und" && out(16L) == "und", "no-evidence docs predict und")
    // the pure-map gate runs on a STREAM and equals batch apply
    val batch = graft.text.TextLib.langIdApply(held, "text", model)
      .select("doc_id", "lang_pred", "lang_score").collect().map(_.toString).sorted.toSeq
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String, String)]
    val q = graft.text.TextLib.langIdApply(
        in.toDF().toDF("doc_id", "lang", "text"), "text", model)
      .select("doc_id", "lang_pred", "lang_score")
      .writeStream.format("memory").queryName("langid_stream").outputMode("append").start()
    try {
      in.addData(held.as[(Long, String, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, lang_pred, lang_score FROM langid_stream")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch, "stream gate must equal batch apply")
    } finally q.stop()
    // save/load: lp doubles round-trip exactly through parquet
    val path = java.nio.file.Files.createTempDirectory("graft_langid_model").toString
    graft.text.TextLib.saveLangIdModel(spark, model, path)
    val loaded = graft.text.TextLib.loadLangIdModel(spark, path)
    assert(loaded.n == model.n && loaded.langs == model.langs)
    val b = graft.text.TextLib.langIdApply(held, "text", loaded)
      .select("doc_id", "lang_pred", "lang_score").collect().map(_.toString).sorted.toSeq
    assert(b == batch, "loaded-model apply must equal in-memory-model apply exactly")
  }

  test("PplModel save/load: the frozen gate round-trips bit-exactly (round 10)") {
    val docs = ((1L to 40L).map { i =>
      (i, if (i % 2 == 0) "en" else "de", (0 until 8).map(j => s"w${(i * 3 + j) % 13}").mkString(" "))
    } :+ ((99L, "en", null.asInstanceOf[String]))).toDF("doc_id", "lang", "text")
    val model = graft.text.TextLib.pplFit(docs, "text", "doc_id", Seq("lang"), nBuckets = 3)
    val path = java.nio.file.Files.createTempDirectory("graft_ppl_model").toString
    graft.text.TextLib.savePplModel(spark, model, path)
    val loaded = graft.text.TextLib.loadPplModel(spark, path)
    assert(loaded.nBuckets == model.nBuckets && loaded.groupCols == model.groupCols)
    assert(loaded.lm.lp.size == model.lm.lp.size && loaded.lm.floorLp == model.lm.floorLp)
    // lp doubles and floors round-trip exactly through parquet → apply is
    // bit-identical (the whole point: ingest jobs load, never refit)
    val a = graft.text.TextLib.pplApply(docs, "text", model)
      .select("doc_id", "lm_logprob", "ppl_bucket").collect().map(_.toString).sorted.toSeq
    val b = graft.text.TextLib.pplApply(docs, "text", loaded)
      .select("doc_id", "lm_logprob", "ppl_bucket").collect().map(_.toString).sorted.toSeq
    assert(a == b, "loaded-model apply must equal in-memory-model apply exactly")
  }

  test("CCNet-style gate composes: LM score → per-lang perplexity buckets") {
    // two languages with distinct vocabularies; a few gibberish docs per
    // language must land in the tail bucket of THEIR language
    val docs = ((1L to 60L).map { i =>
      val t = (0 until 12).map(j => s"en${(i + j) % 9}").mkString(" ")
      (i, "en", t)
    } ++ (61L to 120L).map { i =>
      val t = (0 until 12).map(j => s"de${(i + j) % 9}").mkString(" ")
      (i, "de", t)
    } ++ Seq((200L, "en", "zzq wwx vvk jjy qqz xxw kkv yyj zqz wxw"),
             (201L, "de", "qzq xwx vkv jyj zqz wxw kvk yjy qqq xxx")))
      .toDF("doc_id", "lang", "text")
    val scored = graft.text.TextLib.unigramScore(docs, "text", "doc_id")
    val bucketed = graft.functions.FeatureLib.binQuantileGrouped(
      scored, "lm_logprob", 3, Seq("lang"),
      outCol = "ppl_bucket", labels = Seq("tail", "middle", "head"))
    val rows = bucketed.select("doc_id", "lang", "ppl_bucket")
      .as[(Long, String, String)].collect()
    // rare-token docs score lowest within their own language → tail
    assert(rows.find(_._1 == 200L).get._3 == "tail")
    assert(rows.find(_._1 == 201L).get._3 == "tail")
    // tertiles are roughly balanced per language
    Seq("en", "de").foreach { l =>
      val c = rows.filter(_._2 == l).groupBy(_._3).map { case (k, v) => k -> v.length }
      assert(c.keySet == Set("tail", "middle", "head"), s"$l: $c")
      assert(c.values.min >= 10, s"$l buckets badly unbalanced: $c")
    }
    // the gate a pipeline actually applies: drop the tail. With heavily
    // tied scores (9 distinct values per lang here) the tail absorbs every
    // doc AT the cut point — so it can exceed a third; the gate still
    // keeps a meaningful fraction and drops the planted gibberish
    val kept = bucketed.filter($"ppl_bucket" =!= "tail")
    assert(kept.count() < docs.count() && kept.count() >= docs.count() / 3)
    assert(kept.filter($"doc_id".isin(200L, 201L)).count() == 0)
  }

  test("embedding-side funnel composes: URL dedup → semantic dedup → PQ index") {
    // a re-crawled corpus: 120 docs, each with a URL (40 pages re-crawled
    // under tracking-param variants) and an embedding (3 semantic groups
    // re-embedded with tiny jitter across crawls)
    val rnd = new scala.util.Random(5)
    val dirs = Array.fill(3)(Array.fill(16)(rnd.nextGaussian()))
    val rows = (0L until 120L).map { i =>
      val page = i % 40
      val url = if (i < 40) s"https://Site.com/page/$page"
                else s"https://site.com:443/page/$page?utm_source=recrawl$i"
      val d = dirs((page % 3).toInt)
      val emb = d.map(x => (x + rnd.nextGaussian() * 0.01).toFloat).toSeq
      (i, url, emb)
    }
    val docs = rows.toDF("doc_id", "url", "embedding")

    // URL dedup first: 3 crawls of 40 pages → 40 survivors (min doc_id)
    val urlDeduped = graft.text.UrlLib.dedupByUrl(docs, "url", "doc_id")
    assert(urlDeduped.count() == 40, "three crawls of the same 40 canonical URLs")
    assert(urlDeduped.agg(max("doc_id")).as[Long].head() < 40L, "first crawl wins")

    // semantic dedup on what's left. SemDeDup pairs only WITHIN a k-means
    // cell (the paper's design), so a group straddling a cell boundary may
    // keep one survivor per cell — assert the real invariants, not an
    // exact count: the funnel shrinks hard, every semantic group keeps at
    // least one representative, and no two SAME-group survivors sit at
    // cos ≥ threshold unless a cell boundary separates them
    val semDeduped = graft.vec.SemDedup.semanticDedup(urlDeduped, "doc_id", "embedding",
      threshold = 0.98, nClusters = 4, keep = "min_id")
    val survivors = semDeduped.select("doc_id").as[Long].collect().toSet
    assert(survivors.size >= 3 && survivors.size <= 8,
      s"40 near-dup docs in 3 semantic groups must collapse to a handful, got ${survivors.size}")
    (0 until 3).foreach { g =>
      assert(survivors.exists(id => id % 40 % 3 == g), s"semantic group $g lost entirely")
    }

    // PQ index over the survivors — codes must be non-null for every row
    val model = graft.vec.Pq.train(semDeduped, "embedding", "doc_id", m = 4, nbits = 3)
    val indexed = graft.vec.Pq.encode(semDeduped, "embedding", model)
    assert(indexed.filter($"pq_code".isNull).count() == 0)
    assert(indexed.columns.toSet ==
      Set("doc_id", "url", "embedding", "pq_code"), "no helper-column leaks")
  }
}
