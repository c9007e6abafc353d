package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextLib}
import graft.vec.Similarity
import graft.quality.QualityMetrics

/** Degenerate-input robustness: Spark 4 runs ANSI mode by default, where an
  * unguarded 0-division is a job-killing exception — and the inputs most
  * likely to hit it (empty docs, zero vectors, constant columns, empty
  * partitions) are exactly what data-quality tooling exists to process.
  */
class DirtyDataSpec extends SparkSpec {
  import spark.implicits._

  test("qualityFeatures/qualityScore survive empty and whitespace-only docs") {
    val docs = Seq((1L, "a real document with several words"), (2L, ""), (3L, "   \t "))
      .toDF("doc_id", "text")
    val f = TextLib.qualityFeatures(docs, "text").orderBy("doc_id").collect()
    assert(f.length == 3)
    assert(f(1).isNullAt(f(1).fieldIndex("punct_ratio"))) // 0 chars → null ratio, not a crash
    assert(f(2).isNullAt(f(2).fieldIndex("mean_word_len"))) // 0 tokens → null
    val s = TextLib.qualityScore(docs, "text").orderBy("doc_id").collect()
    assert(s.length == 3 && !s(1).isNullAt(s(1).fieldIndex("quality_score")))
  }

  test("gopherRules and dedupLines survive degenerate and non-ASCII inputs") {
    val docs = Seq(
      (1L, ""), (2L, "   \t "), (3L, null: String),
      (4L, "你好世界 " * 30),                       // CJK, no [a-z] words
      (5L, "emoji 🎉🎉 line\nemoji 🎉🎉 line\nok"), // non-BMP chars + a dup line
      (6L, "x" * 50000),                             // one pathological token
      (7L, "\n\n\n\n")                               // newlines only
    ).toDF("doc_id", "text")
    val g = TextLib.gopherRules(docs, "text").orderBy("doc_id").collect()
    assert(g.length == 7)
    g.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("gopher_keep")), s"keep must never be null: $r")
      assert(!r.isNullAt(r.fieldIndex("gopher_fail_reasons")))
    }
    assert(g.count(_.getAs[Boolean]("gopher_keep")) == 0,
      "every degenerate doc fails at least one rule")
    val d = TextLib.dedupLines(docs, "text").orderBy("doc_id").collect()
    assert(d.length == 7)
    assert(d(2).isNullAt(d(2).fieldIndex("text")), "null text passes through")
    assert(d(4).getAs[String]("text") == "emoji 🎉🎉 line\nok",
      "non-BMP duplicate lines dedup by exact equality")
    assert(d(6).getAs[String]("text") == "\n\n\n\n" &&
      d(6).getAs[Int]("n_removed_lines") == 0,
      "blank-only docs are untouched (exempt lines)")
  }

  test("c4Rules: line rules, sentence floor, page rules — each pinned per class (round 11)") {
    val keepable = "This is a proper sentence.\nAnother one lands here too!\n" +
      "A third question arrives now?\nFourth sentence is quite fine.\nFifth one closes \"well.\""
    val rows = Seq(
      (1L, keepable),                                        // 5 lines, 5 sentences → keep
      (2L, keepable + "\nno terminal punctuation here\nok."),// extra junk line dropped; "ok." 1 word dropped
      (3L, "Only two sentences today.\nAnd here is number two."), // under the floor
      (4L, keepable + "\nSome javascript framework sentence."),   // js line dropped, page still keeps
      (5L, keepable.replace("Another", "lorem ipsum")),      // page rule
      (6L, keepable + " {"),                                 // brace page rule... inside last line
      (7L, keepable.replace("third", "grumbo")),             // badword page rule
      (8L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextLib.c4Rules(rows, "text", minWordsPerLine = 3, minSentences = 5,
        badwords = Seq("grumbo"))
      .select("doc_id", "c4_n_lines_kept", "c4_n_sentences", "c4_keep")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.get(3)).map(_.asInstanceOf[Boolean]))).sortBy(_._1)
    assert(out(0) == ((1L, Some(5), Some(5), Some(true))), s"doc1 ${out(0)}")
    assert(out(1) == ((2L, Some(5), Some(5), Some(true))), s"doc2 ${out(1)}")
    assert(out(2) == ((3L, Some(2), Some(2), Some(false))), s"doc3 ${out(2)}")
    assert(out(3) == ((4L, Some(5), Some(5), Some(true))), s"doc4 ${out(3)}")
    assert(out(4)._4 == Some(false), s"lorem ipsum page must drop: ${out(4)}")
    assert(out(5)._4 == Some(false), s"brace page must drop: ${out(5)}")
    assert(out(6)._4 == Some(false), s"badword page must drop: ${out(6)}")
    assert(out(7) == ((8L, None, None, None)), s"null text: ${out(7)}")
  }

  test("fixMojibake repairs mis-decoded UTF-8, never touches clean text, idempotent after a fix (round 11)") {
    val rows = Seq(
      (1L, "cafÃ© au lait"),              // café mis-decoded as latin-1
      (2L, "donâ€™t stop"),              // don’t via cp1252 punctuation
      (3L, "plain ascii text"),
      (4L, "legit euro € price"),        // clean cp1252-specific char: must not change
      (5L, "你好 world"),                // CJK clean
      (6L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = rows
      .withColumn("fixed", TextLib.fixMojibake(col("t")))
      .withColumn("refix", TextLib.fixMojibake(col("fixed")))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3))))
    assert(out(0)._3.contains("café au lait"), s"latin-1 layer: ${out(0)}")
    assert(out(1)._3.contains("don’t stop"), s"cp1252 layer: ${out(1)}")
    assert(out(2)._3 == out(2)._2 && out(3)._3 == out(3)._2 && out(4)._3 == out(4)._2,
      s"clean rows must pass through untouched: ${out.toSeq}")
    assert(out(5)._3.isEmpty, "null stays null")
    out.foreach(r => assert(r._4 == r._3, s"idempotent after fix: $r"))
    // round-trip law on arbitrary non-ASCII: plant one mis-decode layer
    // engine-side, the repair must restore the original exactly
    val plant = rows.filter(col("t").isNotNull && !col("t").rlike("^[\\x00-\\x7F]*$"))
      .withColumn("m", decode(encode(col("t"), "UTF-8"), "ISO-8859-1"))
      .withColumn("back", TextLib.fixMojibake(col("m")))
    assert(plant.filter(col("back") =!= col("t")).count() == 0,
      s"round-trip: ${plant.select("t", "m", "back").collect().toSeq}")
  }

  test("dedupLines is idempotent on random line soups") {
    // after a pass, every surviving non-exempt line IS its first occurrence,
    // so a second pass removes nothing — the fixpoint law, on seeded
    // generated docs whose lines draw from a small pool (forcing dups)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val docGen = Gen.listOfN(12, Gen.oneOf("alpha", "beta", "", "gamma gamma", "alpha"))
      .map(_.mkString("\n"))
    val docs = (1 to 30).map(i =>
      (i.toLong, docGen.apply(Gen.Parameters.default, Seed(i.toLong)).get))
    val df = docs.toDF("doc_id", "text")
    val once = TextLib.dedupLines(df, "text")
    val twice = TextLib.dedupLines(once.drop("n_removed_lines"), "text")
    assert(twice.filter(col("n_removed_lines") =!= 0).count() == 0,
      "second pass removes nothing")
    val a = once.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = twice.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b, "text is a fixpoint after one pass")
  }

  test("exact dedup: null-text docs pass through instead of collapsing to one survivor") {
    val docs = Seq((1L, "same text"), (2L, "same text"),
      (3L, null: String), (4L, null: String), (5L, null: String))
      .toDF("doc_id", "text")
    val kept = graft.text.Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L), "null texts are not duplicates of each other")
    val dupMap = graft.text.Dedup.exactDupMap(docs, "text", "doc_id").collect()
    assert(dupMap.length == 1 && dupMap(0).getLong(0) == 1L,
      "null texts must not be reported as a duplicate group")
  }

  test("exact dedup: null text AND null id — every such row still passes through") {
    // the sentinel key concats the id; concat null-propagates, so a null id
    // must fall back to a per-row key or all these rows regroup under the
    // null window partition and collapse to one
    val docs = Seq((Some(1L), "kept"), (None, null: String), (None, null: String),
        (None, null: String))
      .toDF("doc_id", "text")
    val kept = graft.text.Dedup.exact(docs, "text", "doc_id")
    assert(kept.count() == 4, "null-text/null-id rows are not duplicates of each other")
  }

  test("guardrails reject silently-wrong parameterizations") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { // 4-block simhash covers radius <= 3 only
      graft.text.Dedup.simhashCandidates(docs, "text", "doc_id", maxHamming = 4)
    }
    intercept[IllegalArgumentException] { // negative overlap skips text silently
      TextLib.chunkDocuments(docs, "text", chunkSize = 100, overlap = -10)
    }
    intercept[IllegalArgumentException] { // type-strict bloom probe needs matching dtypes
      graft.ops.Scale.excludeKeysBloom(
        docs.select($"doc_id".cast("string").as("doc_id"), $"text"),
        "doc_id", docs.select($"doc_id".as("bad_id")), "bad_id")
    }
  }

  test("binUniform: constant columns bin to 0, null inputs keep a null bin") {
    val df = Seq((1, Some(5.0)), (2, Some(5.0)), (3, None: Option[Double])).toDF("id", "v")
    val out = graft.functions.FeatureLib.binUniform(df, "v", 4).orderBy("id").collect()
    assert(out(0).getInt(out(0).fieldIndex("v_bin")) == 0) // min==max: no ANSI crash
    assert(out(1).getInt(out(1).fieldIndex("v_bin")) == 0)
    assert(out(2).isNullAt(out(2).fieldIndex("v_bin")), "null input must not land in bin 0")
  }

  test("ratioFeature inf policy: null operands stay null") {
    val df = Seq((1, Some(2.0), Some(0.0)), (2, None: Option[Double], Some(0.0)),
      (3, Some(-1.0), Some(0.0)), (4, Some(4.0), None: Option[Double]))
      .toDF("id", "num", "den")
    val out = graft.functions.FeatureLib.ratioFeature(df, "r", "num", "den", "inf")
      .orderBy("id").collect()
    assert(out(0).getDouble(out(0).fieldIndex("r")).isPosInfinity)
    assert(out(1).isNullAt(out(1).fieldIndex("r")), "null/0 must not fabricate -Inf")
    assert(out(2).getDouble(out(2).fieldIndex("r")).isNegInfinity)
    assert(out(3).isNullAt(out(3).fieldIndex("r")))
  }

  test("flagOutliers: null readings flag false under every method") {
    val rows = Seq((1, Some(1.0)), (2, Some(2.0)), (3, Some(100.0)), (4, None: Option[Double]),
      (5, Some(1.5)), (6, Some(2.5)), (7, Some(1.8)), (8, Some(2.2)))
    val df = rows.toDF("id", "v")
    Seq("zscore", "iqr").foreach { m =>
      val out = graft.functions.TimeSeriesLib.flagOutliers(df, "v", m, threshold = 1.5)
        .filter($"id" === 4).collect()
      assert(!out(0).isNullAt(out(0).fieldIndex("v_outlier")), s"$m: null flag splits filters")
      assert(!out(0).getBoolean(out(0).fieldIndex("v_outlier")), s"$m: null reading must flag false")
    }
    val roll = graft.functions.TimeSeriesLib.flagOutliers(df, "v", "rolling_zscore",
      threshold = 1.5, orderCol = "id", k = 4).filter($"id" === 4).collect()
    assert(!roll(0).isNullAt(roll(0).fieldIndex("v_outlier")) &&
      !roll(0).getBoolean(roll(0).fieldIndex("v_outlier")))
  }

  test("smoothEwm: a null order key yields a null EWM instead of killing the job") {
    val df = Seq((Some(1L), Some(1.0)), (Some(2L), Some(3.0)), (None: Option[Long], Some(9.0)))
      .toDF("ord", "v")
    val out = graft.functions.TimeSeriesLib.smoothEwm(df, "v", 0.5, "ord", Nil).collect()
    assert(out.length == 3)
    val nullOrd = out.find(_.isNullAt(0)).get
    assert(nullOrd.isNullAt(nullOrd.fieldIndex("v_ewm")))
    // fractional order keys are rejected loudly, not silently truncated
    intercept[IllegalArgumentException] {
      graft.functions.TimeSeriesLib.smoothEwm(
        Seq((1.2, 1.0), (1.9, 2.0)).toDF("ord", "v"), "v", 0.5, "ord", Nil)
    }
  }

  test("crossTab survives data-derived column names with dots") {
    val df = Seq(("a", "1.5"), ("a", "2.5"), ("b", "1.5")).toDF("grp", "cat")
    Seq("index", "columns", "all").foreach { norm =>
      val out = graft.functions.PivotLib.crossTab(df, "grp", "cat", norm)
      assert(out.columns.contains("1.5"), s"$norm lost the dotted column")
      assert(out.count() == 2)
    }
  }

  test("resampleWithGrid keeps aggregates for null-key groups") {
    val df = Seq(
      (Some("s1"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (Some("s1"), java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 2.0),
      (None: Option[String], java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7.0))
      .toDF("sensor", "ts", "v")
    val out = graft.functions.TimeSeriesLib.resampleWithGrid(df, "ts", "1 hour",
      Seq("v" -> "sum"), keys = Seq("sensor"))
    val nullRow = out.filter($"sensor".isNull).collect()
    assert(nullRow.length == 1, "null-key group must keep its single grid row")
    assert(nullRow(0).getDouble(nullRow(0).fieldIndex("v_sum")) == 7.0,
      "null-key aggregates must survive the grid join")
  }

  test("profiling ratios survive empty inputs (Unique / columnStats / qualityScore)") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val u = graft.quality.ExpectationSuite.Unique("id")
    val r = empty.agg(u.ratio.as("r")).collect()(0)
    assert(r.isNullAt(0), "0/0 unique ratio must be null, not DIVIDE_BY_ZERO")
    assert(graft.quality.SchemaInference.columnStats(empty).collect().forall(_.isNullAt(4)))
    val qs = graft.quality.SchemaInference.qualityScore(empty).collect()(0)
    assert(qs.isNullAt(0) || qs.getDouble(0).isNaN == false)
  }

  test("textBasicStats: empty/whitespace-only docs give null avg word length") {
    val docs = Seq((1L, "two words"), (2L, ""), (3L, " \t\n "), (4L, "\tabc"))
      .toDF("doc_id", "text")
    val f = graft.functions.FeatureLib.textBasicStats(docs, "text").orderBy("doc_id").collect()
    assert(f(0).getInt(f(0).fieldIndex("text_word_count")) == 2)
    assert(f(0).getDouble(f(0).fieldIndex("text_avg_word_length")) == 4.0)
    // 0 tokens → null (not NaN, not ANSI DIVIDE_BY_ZERO)
    Seq(1, 2).foreach { i =>
      assert(f(i).getInt(f(i).fieldIndex("text_word_count")) == 0)
      assert(f(i).isNullAt(f(i).fieldIndex("text_avg_word_length")))
    }
    // leading tab: run-count spec says ONE token, not a phantom empty one
    assert(f(3).getInt(f(3).fieldIndex("text_word_count")) == 1)
    assert(f(3).getDouble(f(3).fieldIndex("text_avg_word_length")) == 3.0)
  }

  test("similarity tiers tolerate zero-norm vectors") {
    val corpus = ((1L to 20L).map(i => (i, Seq.fill(8)(i.toFloat))) :+ (99L, Seq.fill(8)(0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
    val brute = Similarity.bruteTopK(corpus, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
      .collect()
    assert(brute.length == 5 && !brute.map(_.getLong(1)).contains(99L)) // zero vector drops out
    val lsh = Similarity.lshTopK(corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, dim = 8, bands = 4, bitsPerBand = 4)
    assert(lsh.count() >= 0) // must not throw
  }

  test("outlier/completeness metrics survive constant columns and empty frames") {
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val rate = QualityMetrics.outlierRateZscore(const, "v").collect()(0).getDouble(0)
    assert(rate == 0.0)
    val empty = spark.emptyDataFrame.withColumn("c", lit(1))
    val row = QualityMetrics.report(empty, Seq(QualityMetrics.completeness("c"))).collect()(0)
    assert(row.isNullAt(0)) // "no data arrived" reports null, not a crash
  }

  test("chunkDocuments keeps null-text documents visible") {
    val docs = Seq((1L, Some("abcdefghij" * 30)), (2L, None: Option[String])).toDF("doc_id", "text")
    val out = TextLib.chunkDocuments(docs, "text", chunkSize = 100, overlap = 10)
    assert(out.filter(col("doc_id") === 2L).count() == 1) // not silently dropped
    val r = out.filter(col("doc_id") === 2L).collect()(0)
    assert(r.isNullAt(r.fieldIndex("chunk_text")))
  }

  test("shingles keep control chars glued to tokens (oracle tokenization parity)") {
    val withCtl = Seq((1L, "\u0001the cat sat on the mat")).toDF("id", "t")
    val sh = withCtl.select(explode(TextLib.shingles(col("t"), 3)).as("s"))
      .as[String].collect().toSet
    assert(sh.contains("\u0001the cat sat"), s"got $sh")
    assert(!sh.contains("the cat sat"))
  }

  test("redactPii masks emails, phones, IPs and leaves prose untouched") {
    val rows = Seq(
      "mail me at jane_d+spam@sub.example.co.uk please",
      "call (555) 123-4567 or +44-555-123-4567",
      "host 10.0.255.3 responded",
      "version 1.2 of chapter 3.4.5 stays intact" // dots/digits that are NOT an IP
    ).zipWithIndex.map(_.swap).toDF("id", "t")
    val out = rows.select(TextLib.redactPii(col("t")).as("r")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> please")
    assert(out(1) == "call <PHONE> or <PHONE>")
    assert(out(2) == "host <IP> responded")
    assert(out(3) == "version 1.2 of chapter 3.4.5 stays intact")
  }

  test("repetitionRatio: 0 for all-distinct, rises toward 1 for repeated text") {
    val rows = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, Seq.fill(10)("spam ham eggs").mkString(" ")),
      (3L, "ab")
    ).toDF("id", "t")
    val out = rows.select(col("id"), TextLib.repetitionRatio(col("t"), 3).as("r"))
      .orderBy("id").as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    assert(out(2L) > 0.8, s"repeated text scored ${out(2L)}")
    assert(out(3L) == 0.0) // fewer than n words → defined as 0
  }

  test("exact dedup and near-dedup pass through empty-text corpora") {
    val docs = Seq((1L, ""), (2L, ""), (3L, "real content here with words"))
      .toDF("doc_id", "text")
    val exact = Dedup.exact(docs, "text", "doc_id").select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 3L)) // the two empties collapse to the min id
  }

  test("unigramScore matches the hand-computed model, floors OOV, nulls token-free docs") {
    val docs = Seq(
      (1L, "a a b"),          // two in-vocab tokens + b
      (2L, "a c"),            // c is out-of-vocab at vocabSize=2
      (3L, ""),               // token-free → n_tokens 0, null score
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    // corpus tf: a=3, b=1, c=1, T=5; vocabSize=2 keeps a then b (tie on tf
    // broken by token asc), so c takes the -ln(T) floor
    val got = TextLib.unigramScore(docs, "text", "doc_id", vocabSize = 2)
      .select("doc_id", "n_tokens", "lm_logprob")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val T = 5.0
    val lpA = math.log(3.0 / T); val lpB = math.log(1.0 / T); val floor = -math.log(T)
    assert(got(1L)._1 == 3 && math.abs(got(1L)._2 - (lpA + lpA + lpB) / 3) < 1e-12)
    assert(got(2L)._1 == 2 && math.abs(got(2L)._2 - (lpA + floor) / 2) < 1e-12)
    assert(got(3L) == ((0L, Double.NaN)) || got(3L)._1 == 0 && got(3L)._2.isNaN)
    assert(got(4L)._1 == 0 && got(4L)._2.isNaN)
    // a separate reference corpus trains the model: score against it, not df
    val ref = Seq((10L, "x x x x")).toDF("doc_id", "text")
    val vs = TextLib.unigramScore(docs.filter($"doc_id" === 1), "text", "doc_id",
        corpus = ref, corpusTextCol = "text", vocabSize = 10)
      .select("lm_logprob").collect()(0).getDouble(0)
    // every token of doc 1 is OOV vs the x-corpus: floor = -ln(4)
    assert(math.abs(vs - -math.log(4.0)) < 1e-12)
    // composes after ops that already emit n_tokens (token_counts, pack):
    // the pre-existing column is replaced, not ambiguous
    val withN = docs.withColumn("n_tokens", lit(999L))
    val re = TextLib.unigramScore(withN, "text", "doc_id", vocabSize = 2)
      .select("doc_id", "n_tokens").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re(1L) == 3 && re(3L) == 0)
  }

  test("bigramScore: every Stupid-Backoff branch fires on the hand-computed model") {
    val docs = Seq(
      (1L, "a a b"),  // seen bigrams (a,a), (a,b)
      (2L, "a c"),    // (a,c): cur OOV → floor backoff
      (3L, ""),       // token-free → n_tokens 0, null score
      (4L, null.asInstanceOf[String]),
      (5L, "b a")     // (b,a) falls off the bigramSize=2 cap → vocab backoff
    ).toDF("doc_id", "text")
    // corpus tf: a=4, b=2, c=1, T=7; vocabSize=2 keeps {a, b}. Bigram counts
    // all 1; the cap's (btf desc, prev asc, cur asc) tie-break keeps
    // (a,a), (a,b) and drops (b,a) — so doc 5 exercises backoff-to-vocab.
    val got = TextLib.bigramScore(docs, "text", "doc_id", vocabSize = 2, bigramSize = 2)
      .select("doc_id", "n_tokens", "lm2_logprob")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val T = 7.0
    val p1a = math.log(4.0 / T) // position-1 unigram, in vocab
    assert(got(1L)._1 == 3 &&
      math.abs(got(1L)._2 - (p1a + math.log(1.0 / 4.0) + math.log(1.0 / 4.0)) / 3) < 1e-12)
    assert(got(2L)._1 == 2 &&
      math.abs(got(2L)._2 - (p1a + math.log(0.4 / T)) / 2) < 1e-12)
    assert(got(3L)._1 == 0 && got(3L)._2.isNaN)
    assert(got(4L)._1 == 0 && got(4L)._2.isNaN)
    assert(got(5L)._1 == 2 &&
      math.abs(got(5L)._2 - (math.log(2.0 / T) + math.log(0.4 * (4.0 / T))) / 2) < 1e-12)
    // separate reference corpus: every token of "z z" is OOV vs it; both
    // positions take a floor (pos 1: -ln(4); pos 2: ln(0.4/4))
    val ref = Seq((10L, "x x x x")).toDF("doc_id", "text")
    val vs = TextLib.bigramScore(docs.filter($"doc_id" === 1).withColumn("text", lit("z z")),
        "text", "doc_id", corpus = ref, corpusTextCol = "text", vocabSize = 10)
      .select("lm2_logprob").collect()(0).getDouble(0)
    assert(math.abs(vs - (-math.log(4.0) + math.log(0.4 / 4.0)) / 2) < 1e-12)
  }

  test("batch-3 operators survive empty and degenerate inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.paragraphDedup(empty, "text", "doc_id").count() == 0)
    assert(Dedup.duplicateSpans(empty, "text", "doc_id").count() == 0)
    assert(Dedup.snapshotDiff(empty, empty, "doc_id", "text").count() == 0)
    val emptyG = Seq.empty[(Long, String)].toDF("id", "grp")
    assert(graft.ops.Scale.temperatureSample(emptyG, "grp", "id", 0.5, 100).count() == 0)
    assert(graft.ops.Scale.assignSplit(emptyG, "id", Seq("train" -> 1.0)).count() == 0)
    assert(graft.ops.Scale.repeatEpochs(emptyG, "grp", "id", Map("x" -> 2.0)).count() == 0)

    // a fully-duplicated corpus: one survivor paragraph total
    val clones = (1L to 20L).map(i => (i, "the same paragraph each time")).toDF("doc_id", "text")
    val pd = Dedup.paragraphDedup(clones, "text", "doc_id")
      .select("doc_id", "n_paras_kept").as[(Long, Int)].collect().toMap
    assert(pd(1L) == 1 && (2L to 20L).forall(pd(_) == 0))
    // duplicateSpans: every gram duplicated → every doc fully covered
    val ds = Dedup.duplicateSpans(clones, "text", "doc_id", k = 3, minCount = 2)
      .select("dup_ratio").as[Double].collect()
    assert(ds.forall(_ == 1.0))

    // constant column: all quantile cuts equal → everything bins to 0
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val bins = graft.functions.FeatureLib.binQuantileGrouped(const, "v", 4, Seq("g"))
      .select("v_qbin").as[Int].collect()
    assert(bins.forall(_ == 0))

    // single-group temperatureSample ≈ plain rate; tiny group keeps all
    val one = (1L to 10L).map(i => (i, "only")).toDF("id", "grp")
    assert(graft.ops.Scale.temperatureSample(one, "grp", "id", 1.0, 1000).count() == 10)

    // quality classifier: a constant pseudo-label signal (strict cuts
    // label nothing) must fail LOUDLY naming the cause — a constant model
    // would silently keep/delete the whole corpus downstream
    val constSig = (1L to 50L).map(i => (i, 7.0, 0.1)).toDF("id", "lm", "f")
    val labeled = graft.quality.QualityClassifier.pseudoLabelByQuantile(constSig, "lm")
    val err = intercept[IllegalArgumentException] {
      graft.quality.QualityClassifier.train(labeled, "quality_label", Seq("f"))
    }
    assert(err.getMessage.contains("both classes"), err.getMessage)
    // empty input fails the same guarded way, not with a raw MLlib error
    val emptyLab = Seq.empty[(Long, java.lang.Integer, Double)].toDF("id", "quality_label", "f")
    val err2 = intercept[IllegalArgumentException] {
      graft.quality.QualityClassifier.train(emptyLab, "quality_label", Seq("f"))
    }
    assert(err2.getMessage.contains("both classes"), err2.getMessage)

    // save/load (round 10): the frozen classifier scores identically —
    // train once against a curated reference, gate every later snapshot
    val sig = (1L to 60L).map(i => (i, i.toDouble, i.toDouble / 60.0)).toDF("id", "lm", "f")
    val lab = graft.quality.QualityClassifier.pseudoLabelByQuantile(sig, "lm")
    val m = graft.quality.QualityClassifier.train(lab, "quality_label", Seq("f"))
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_model").toString
    graft.quality.QualityClassifier.saveModel(spark, m, dir)
    val loaded = graft.quality.QualityClassifier.loadModel(spark, dir)
    assert(loaded.features == m.features)
    val a = graft.quality.QualityClassifier.score(sig, m)
      .select("id", "quality_prob").collect().map(_.toString).sorted.toSeq
    val b = graft.quality.QualityClassifier.score(sig, loaded)
      .select("id", "quality_prob").collect().map(_.toString).sorted.toSeq
    assert(a == b, "loaded classifier must score identically to the in-memory model")
  }

  test("lengthHistogram bins integer-exactly and routes null/non-positive to bin -1") {
    val df = Seq[java.lang.Long](null, 0L, -5L, 1L, 2L, 3L, 4L, 7L, 8L, 1024L, 1025L)
      .toDF("n")
    val got = TextLib.lengthHistogram(df, "n")
      .select("len_bin", "n_rows", "len_lo", "len_hi", "len_min", "len_max")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
         if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(-1) == ((3L, -1L, -1L, -5L, 0L)))     // null, 0, -5
    assert(got(0)  == ((1L, 1L, 1L, 1L, 1L)))        // [1,1]: just 1
    assert(got(1)  == ((2L, 2L, 3L, 2L, 3L)))        // [2,3]: 2,3
    assert(got(2)  == ((2L, 4L, 7L, 4L, 7L)))        // [4,7]: 4,7 — 8 must NOT leak in
    assert(got(3)  == ((1L, 8L, 15L, 8L, 8L)))       // exact power of two lands high side
    assert(got(10) == ((2L, 1024L, 2047L, 1024L, 1025L)))
    // shares sum to 1 over all bins
    val share = TextLib.lengthHistogram(df, "n").agg(sum("share")).head().getDouble(0)
    assert(math.abs(share - 1.0) < 1e-12)
  }
}
