package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextLib}
import graft.vec.Similarity

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer internals"),
    (4L, "THE QUICK BROWN   FOX jumps over the lazy dog again and again today"), // exact dup of 1 modulo case/ws
    (5L, "another unrelated document mentioning parquet and shuffles")
  ).toDF("doc_id", "text")

  test("duplicateSpans == maximal-shared-span ExactSubstr truth (differential, VERDICT r8 #7)") {
    // Independent truth: enumerate the longest common token extension of
    // EVERY pair of corpus locations (the suffix-array semantics, done the
    // brute O(n²·len) way — fine at spec scale), keep extensions >= k, and
    // union the covered positions. duplicateSpans must report exactly this
    // coverage (dup_tokens), its maximal runs (n_spans), and the longest
    // run (max_span_tokens) — proving the scaladoc theorem that the
    // repeated-k-window union IS the maximal-shared-span union, on hostile
    // geometry: arbitrary offsets, a period-1 self-repeat, two spans with
    // a 1-token gap, spans at doc start/end, and the one documented miss
    // class (a shared span of k-1 tokens → invisible, quantified below).
    val k = 5
    def fill(tag: String, n: Int): Vector[String] = (1 to n).map(i => s"${tag}x$i").toVector
    val s8 = (1 to 8).map(i => s"s$i").toVector   // shared by docs 1, 2, 7
    val t5 = (1 to 5).map(i => s"t$i").toVector   // shared by docs 4, 5 (= k)
    val u6 = (1 to 6).map(i => s"u$i").toVector   // shared by docs 4, 5
    val v4 = (1 to 4).map(i => s"v$i").toVector   // shared by docs 6, 7 — BELOW the floor
    val corpus: Map[Long, Vector[String]] = Map(
      1L -> (fill("a1", 3) ++ s8 ++ fill("a2", 4)),
      2L -> (fill("b1", 6) ++ s8 ++ fill("b2", 2)),          // same span, different offset
      3L -> Vector.fill(9)("spam"),                          // self-overlapping repeat
      4L -> (fill("c1", 2) ++ t5 ++ Vector("cgap") ++ u6 ++ fill("c2", 3)), // 1-token gap between spans
      5L -> (u6 ++ fill("d1", 4) ++ t5),                     // spans at doc START and END
      6L -> (fill("e1", 5) ++ v4 ++ fill("e2", 5)),          // only a k-1 shared span: zero coverage
      7L -> (fill("f1", 3) ++ v4 ++ fill("f2", 2) ++ s8),    // sub-floor span + real span at doc end
      8L -> fill("g1", 12))                                  // clean
    // ---- truth ----
    val locs = for ((id, ts) <- corpus.toSeq; p <- ts.indices) yield (id, p)
    val covered = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Int]]()
    corpus.keys.foreach(id => covered(id) = scala.collection.mutable.Set[Int]())
    for ((d1, p1) <- locs; (d2, p2) <- locs if (d1, p1) != (d2, p2)) {
      var len = 0
      val (w1, w2) = (corpus(d1), corpus(d2))
      while (p1 + len < w1.size && p2 + len < w2.size && w1(p1 + len) == w2(p2 + len)) len += 1
      if (len >= k) { covered(d1) ++= (p1 until p1 + len); covered(d2) ++= (p2 until p2 + len) }
    }
    def runs(s: Set[Int]): Seq[Int] = { // lengths of maximal consecutive runs
      val sorted = s.toSeq.sorted
      if (sorted.isEmpty) Seq.empty
      else sorted.tail.foldLeft(List((sorted.head, 1))) { case ((st, n) :: rest, p) =>
        if (p == st + n) (st, n + 1) :: rest else (p, 1) :: (st, n) :: rest
      }.map(_._2).reverse
    }
    // the miss class is real in the truth itself: v4 IS shared between 6 and
    // 7 as text, but no >= k extension exists through it
    assert(covered(6L).isEmpty, "k-1 shared span must be invisible at threshold k (the documented floor)")
    assert(covered(3L) == (0 until 9).toSet, "self-repeat must cover the whole doc")
    // ---- engine ----
    val df = corpus.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, "text", "doc_id", k = k, minCount = 2)
      .select("doc_id", "n_spans", "dup_tokens", "max_span_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (id <- corpus.keys.toSeq.sorted) {
      val rl = runs(covered(id).toSet)
      val want = (rl.size.toLong, rl.sum.toLong, (if (rl.isEmpty) 0 else rl.max).toLong)
      assert(out(id) == want, s"doc $id: engine=${out(id)} truth(spans,dup,max)=$want")
    }
  }

  test("cutDuplicateSpans: keep-first cut — canonical copy survives verbatim, later copies are cut") {
    val k = 5
    val corpus = Seq(
      // doc 1 < doc 2 share an 8-token span: 1 is canonical, 2 loses it
      (1L, "p1 p2 s1 s2 s3 s4 s5 s6 s7 s8 p3"),
      (2L, "q1 q2 q3 s1 s2 s3 s4 s5 s6 s7 s8 q4 q5"),
      // doc 3: within-doc self-repeat — FIRST occurrence is canonical
      (3L, "a b c d e XX a b c d e"),
      // doc 4 is ENTIRELY a later copy of doc 1's span → fully cut
      (4L, "s1 s2 s3 s4 s5 s6 s7 s8"),
      (5L, "unique tokens only here nothing shared at all"),
      (6L, "shrt"),                           // under k tokens: no grams
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = graft.text.Dedup.cutDuplicateSpans(corpus, "text", "doc_id", k = k, minCount = 2)
      .select("doc_id", "text", "n_tokens", "n_removed_tokens", "n_kept_tokens")
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // canonical doc: nothing removed, text re-emitted as normalized tokens
    assert(out(1L) == ("p1 p2 s1 s2 s3 s4 s5 s6 s7 s8 p3", 11L, 0L, 11L), s"doc1: ${out(1L)}")
    // later copy: exactly the 8 span tokens cut, fillers survive in order
    assert(out(2L) == ("q1 q2 q3 q4 q5", 13L, 8L, 5L), s"doc2: ${out(2L)}")
    // self-repeat: first occurrence kept (its window is canonical), second cut;
    // the separator token is uncovered and survives (lowercased)
    assert(out(3L) == ("a b c d e xx", 11L, 5L, 6L), s"doc3: ${out(3L)}")
    // a document that IS a later copy is cut to empty
    assert(out(4L) == ("", 8L, 8L, 0L), s"doc4: ${out(4L)}")
    assert(out(5L)._3 == 0L && out(5L)._2 == 8L, s"unique doc untouched: ${out(5L)}")
    assert(out(6L) == ("shrt", 1L, 0L, 1L), s"sub-k doc untouched: ${out(6L)}")
    assert(out(7L) == ((null, 0L, 0L, 0L)), s"null text passes through: ${out(7L)}")
    // corpus-level guarantee: every flagged gram's text survives SOMEWHERE
    // (the canonical copy) — s1..s8 and a..e remain findable
    assert(out(1L)._1.contains("s1 s2 s3 s4 s5 s6 s7 s8") && out(3L)._1.startsWith("a b c d e"))
  }

  test("exact dedup collapses case/whitespace variants, keeps min id") {
    val out = Dedup.exact(docs, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L, 5L)) // 4 collapsed into 1
  }

  test("exactDupMap reports survivor -> member") {
    val m = Dedup.exactDupMap(docs, "text", "doc_id")
      .select("survivor", "member").as[(Long, Long)].collect()
    assert(m.toSeq == Seq((1L, 4L)))
  }

  test("minhash candidates find the near-dup pair, not unrelated docs") {
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.3)
    val pairs = cands.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L))) // near/exact dups surface
    assert(!pairs.contains((3L, 5L))) // unrelated never a candidate above threshold
    assertNoCartesian(cands)
  }

  test("minhash est_jaccard is exact 1.0 for identical normalized text") {
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id",
      shingleN = 2, numHashes = 32, bands = 8, threshold = 0.9)
    val j14 = cands.filter($"id_a" === 1 && $"id_b" === 4).select("est_jaccard").as[Double].collect()
    assert(j14.toSeq == Seq(1.0))
  }

  test("identical-signature collapse: a deep exact-duplicate family expands to all pairs at est 1.0") {
    // 40 byte-identical copies collapse to one representative for banding,
    // then expand back — the pair space must come back complete, every
    // pair at the identical-signature estimate (exactly 1.0), and the
    // near-dup must pair with EVERY member at the rep pair's estimate
    val fam = (1L to 40L).map(i => (i, "the quick brown fox jumps over the lazy dog every single day"))
    val deep = (fam ++ Seq(
      (100L, "the quick brown fox jumps over the lazy dog every single night"), // near-dup of the family
      (200L, "unrelated text about catalyst tungsten and parquet row groups"))).toDF("doc_id", "text")
    val out = Dedup.minhashCandidates(deep, "text", "doc_id",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5, maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val famPairs = out.filter { case (a, b, _) => a <= 40 && b <= 40 }
    assert(famPairs.length == 40 * 39 / 2, s"family must expand to all pairs, got ${famPairs.length}")
    assert(famPairs.forall(_._3 == 1.0), "identical signatures must estimate exactly 1.0")
    val nearPairs = out.filter { case (_, b, _) => b == 100L }
    if (nearPairs.nonEmpty) { // whether the near-dup is a candidate depends on banding luck...
      assert(nearPairs.length == 40, "a rep-level near-dup pair must expand to every member")
      assert(nearPairs.map(_._3).distinct.length == 1, "expanded pairs must share the rep pair's estimate")
    }
    assert(!out.exists { case (a, b, _) => a == 200L || b == 200L }, "unrelated doc must not pair")
  }

  test("collapse cap parity: a family deeper than maxBucketSize stays dropped") {
    // pre-collapse the 40-member family inflated every one of its band
    // buckets past the cap (bucket >= family), so the family emitted no
    // pairs; post-collapse the within-group expansion is gated on the same
    // cap, so it must STILL emit none
    val fam = (1L to 40L).map(i => (i, "the quick brown fox jumps over the lazy dog every single day"))
    val deep = (fam :+ (200L, "unrelated text about catalyst tungsten and parquet row groups")).toDF("doc_id", "text")
    val out = Dedup.minhashCandidates(deep, "text", "doc_id",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5, maxBucketSize = 10)
    assert(out.filter($"id_a" <= 40 && $"id_b" <= 40).count() == 0,
      "a family past the bucket cap must not emit within-group pairs")
  }

  test("simhash identical-value collapse expands a deep family at hamming 0") {
    val fam = (1L to 30L).map(i => (i, "the quick brown fox jumps over the lazy dog every single day"))
    val deep = (fam :+ (200L, "unrelated text about catalyst tungsten and parquet row groups")).toDF("doc_id", "text")
    val out = Dedup.simhashCandidates(deep, "text", "doc_id", maxHamming = 3, maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val famPairs = out.filter { case (a, b, _) => a <= 30 && b <= 30 }
    assert(famPairs.length == 30 * 29 / 2, s"family must expand to all pairs, got ${famPairs.length}")
    assert(famPairs.forall(_._3 == 0), "identical simhash values must report hamming 0")
  }

  test("simhash of identical normalized text is identical; hamming candidates surface it") {
    val sh = Dedup.simhash(docs, "text", "doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    val cands = Dedup.simhashCandidates(docs, "text", "doc_id", maxHamming = 3)
    val pairs = cands.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assertNoCartesian(cands)
  }

  test("ngram jaccard: identical docs score 1.0, near-dups high, others absent") {
    val out = Dedup.ngramJaccardPairs(docs, "text", "doc_id", shingleN = 2, threshold = 0.3)
    val m = out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 4L)) == 1.0)
    assert(m((1L, 2L)) > 0.5 && m((1L, 2L)) < 1.0)
    assert(!m.contains((3L, 5L)))
    assertNoCartesian(out)
  }

  test("ngramContainmentPairs: subset duplicate scores 1.0 where Jaccard misses it") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (1 to 8).map(i => s"w$i").mkString(" ")       // strict prefix of `long`
    val docs = Seq((1L, long), (2L, quote), (3L, "zz yy xx ww vv")).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
        shingleN = 2, threshold = 0.8, maxDocFreq = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    // quote (7 bigrams) fully inside long (39 bigrams): c(2⊂1)=1.0, reverse 7/39
    assert(cont((1L, 2L))._2 == 1.0, "quote is fully contained in its source")
    assert(math.abs(cont((1L, 2L))._1 - math.rint(7.0 / 39 * 1e4) / 1e4) < 1e-12)
    assert(!cont.keys.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc never pairs")
    // the symmetric measure on the same data misses the pair entirely
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id", shingleN = 2, threshold = 0.8)
    assert(jac.count() == 0, "Jaccard at the same threshold misses the subset duplicate")
    assertNoCartesian(Dedup.ngramContainmentPairs(docs, "text", "doc_id", 2, 0.8, 500))
  }

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute top-k ranks by cosine with deterministic ties") {
    val out = Similarity.bruteTopK(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" === 1), "vec_id", "embedding", k = 2)
      .select("neighbor_id", "cos").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(2L, 3L)) // 2 closest, then first orthogonal by id
    assert(math.abs(out.head._2 - 0.993884) < 1e-5)
  }

  test("self-similarity is 1.0 when not excluded") {
    val out = Similarity.bruteTopK(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" === 1), "vec_id", "embedding", k = 1, excludeSelf = false)
      .select("neighbor_id", "cos").as[(Long, Double)].head()
    assert(out == ((1L, 1.0)))
  }

  test("LSH top-k finds the true nearest neighbor for clustered vectors") {
    val out = Similarity.lshTopK(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" === 1), "vec_id", "embedding",
      k = 1, dim = 4, bands = 4, bitsPerBand = 2)
      .select("neighbor_id").as[Long].collect()
    assert(out.headOption.contains(2L)) // same-bucket neighbor is the true NN
    assertNoCartesian(Similarity.lshTopK(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" === 1), "vec_id", "embedding", k = 1, dim = 4))
  }

  test("embedding near-dup pairs: identical vectors -> cos 1.0") {
    val doubled = vecs.unionByName(vecs.withColumn("vec_id", $"vec_id" + 100L))
    val out = Similarity.embeddingNearDupPairs(doubled, "vec_id", "embedding",
      threshold = 0.999, dim = 4)
    val pairs = out.select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 101L && p._3 == 1.0))
    assertNoCartesian(out)
  }

  test("bucket-pair expansion equals the self-join formulation on random corpora") {
    // Regression guard for the r3 one-shuffle candidate generator: the set
    // of (id_a, id_b, est_jaccard) must be identical to the textbook
    // bucket self-join, including the maxBucketSize cap.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val docs = (1L to 120L).map { i =>
      val base = Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, if (i % 3 == 0) base + " tail" else base)
    }.toDF("doc_id", "text")
    val got = graft.text.Dedup.minhashCandidates(docs, "text", "doc_id",
        shingleN = 2, numHashes = 16, bands = 4, threshold = 0.3, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive reference: explode bands, cap via groupBy sizes, self-join
    val sigs = docs.select(col("doc_id").as("id"),
      graft.text.Dedup.minhashSignature(col("text"), 2, 16).as("sig"))
    val bk = sigs.withColumn("bh", explode(graft.text.Dedup.lshBandHashes(col("sig"), 4, 4)))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("bucket"))
    val sizes = bk.groupBy("band", "bucket").count().filter(col("count") > 1 && col("count") <= 50)
    val inB = bk.join(sizes, Seq("band", "bucket"))
    val ref = inB.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(inB.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("ej", size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m)) / lit(16.0))
      .filter(col("ej") >= 0.3)
      .select(col("id_a"), col("id_b"), round(col("ej"), 4).as("ej"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == ref, s"bucketPairs diverged: only-new=${got -- ref}, only-ref=${ref -- got}")
    assert(got.nonEmpty)
  }

  test("langId picks the marker language on real sentences") {
    val samples = Seq(
      (1L, "the cat is on the table and it was not happy with this"),
      (2L, "der Hund ist nicht mit der Katze auf den Tisch"),
      (3L, "le chat est dans la maison et il est pour les enfants"),
      (4L, "el gato es una mascota que vive en la casa con los ninos")
    ).toDF("doc_id", "text")
    val out = TextLib.langId(samples, "text").select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en"); assert(out(2L) == "de")
    assert(out(3L) == "fr"); assert(out(4L) == "es")
  }

  test("incremental dedup screens a new batch against a reference corpus only") {
    val ref = docs
    val newBatch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"), // dup of ref 1
      (101L, "entirely novel text about columnar shuffle readers")
    ).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidatesAgainst(newBatch, ref, "text", "doc_id",
      shingleN = 2, threshold = 0.8)
    val pairs = cands.select("new_id", "ref_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 1L)))          // duplicate flagged against corpus
    assert(!pairs.exists(_._1 == 101L))         // novel doc clean
    assert(pairs.forall(p => p._1 >= 100L && p._2 < 100L)) // only new x ref pairs
    assertNoCartesian(cands)
  }

  test("clusterCandidates: connected components elect min-id survivors") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.clusterCandidates(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L && labels(7L) == 1L)
    assert(labels(10L) == 10L && labels(11L) == 10L)
  }

  test("softDedupWeights: group sizes over normalized text, 1/n weights, nulls weigh 1.0") {
    val frame = Seq(
      (1L, "the SAME   text here"),
      (2L, "the same text here"),          // dup of 1 modulo case/ws
      (3L, "the same text here"),          // dup of 1 and 2
      (4L, "something else entirely"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextLib.softDedupWeights(frame, "text")
      .select("doc_id", "dup_count", "soft_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 0.333333), (2L, 3L, 0.333333), (3L, 3L, 0.333333),
      (4L, 1L, 1.0), (5L, 1L, 1.0)), s"weights wrong: ${out.toSeq}")
  }

  test("repetitionSignals: the four Gopher A1.1 fractions, hand-computed") {
    val frame = Seq(
      (1L, "aa bb aa bb aa bb"),                // top bigram "aa bb"×3, no dup 5-grams
      (2L, "x\ny\nx\n x "),                     // third line dups the first; " x " does not
      (3L, null.asInstanceOf[String]),          // no evidence anywhere
      (4L, "one two three"),                    // < 5 tokens → dup_ngram null
      (5L, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5")     // the 5-gram repeats once
    ).toDF("doc_id", "text")
    val out = TextLib.repetitionSignals(frame, "text", "doc_id", topN = 2, dupN = 5)
      .select("doc_id", "dup_line_frac", "dup_line_char_frac",
        "top_ngram_char_frac", "dup_ngram_char_frac")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).sortBy(_._1)
    assert(out(0) == ((1L, Some(0.0), Some(0.0), Some(0.882353), Some(0.0))),
      s"doc 1: ${out(0)}")  // 3×5 chars of "aa bb" / 17
    assert(out(1) == ((2L, Some(0.25), Some(0.166667), Some(0.428571), None)),
      s"doc 2: ${out(1)}")  // 1 of 4 lines dup; 1 of 6 chars; top "x x" 3/7; <5 toks
    assert(out(2) == ((3L, None, None, None, None)), s"doc 3: ${out(2)}")
    assert(out(3)._5.isEmpty && out(3)._4.nonEmpty, s"doc 4: ${out(3)}")
    assert(out(4) == ((5L, Some(0.0), Some(0.0), Some(0.344828), Some(0.965517))),
      s"doc 5: ${out(4)}")  // top "r1 r2" 2×5/29; dup 2×14/29
  }

  test("keepBestByCluster elects the highest quality per cluster, ties to min id; null/NaN lose") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)).toDF("id", "cluster_id")
    val frame = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9),           // cluster 1: 2 and 3 tie at 0.9 → 2 wins
      (10L, Double.NaN), (11L, 0.1),             // NaN must lose to a real 0.1
      (20L, 0.5), (21L, 0.7),                    // plain argmax
      (99L, 0.0)                                 // unclustered: passes through
    ).toDF("doc_id", "quality")
    val out = Dedup.keepBestByCluster(frame, "doc_id", "quality", clusters)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 11L, 21L, 99L))
    // null quality loses too
    val withNull = Seq((10L, None: Option[Double]), (11L, Some(0.1))).toDF("doc_id", "quality")
    val out2 = Dedup.keepBestByCluster(withNull, "doc_id", "quality",
        Seq((10L, 10L), (11L, 10L)).toDF("id", "cluster_id"))
      .select("doc_id").as[Long].collect()
    assert(out2.toSeq == Seq(11L))
  }

  test("nearDedupKeepBest: constant quality reduces to nearDedup; higher-quality dup wins otherwise") {
    val qDocs = docs.withColumn("quality",
      when(col("doc_id") === 4L, 5.0).otherwise(1.0))
    // doc 4 is the exact dup of doc 1 (case/ws) — with quality 5 it must
    // be the survivor of that cluster instead of min-id 1
    val best = Dedup.nearDedupKeepBest(qDocs, "text", "doc_id", "quality",
        shingleN = 2, numHashes = 64, bands = 16, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(best.contains(4L) && !best.contains(1L), s"quality-5 copy must win: $best")
    // the keepfirst ≡ keepbest law under constant quality
    val const = Dedup.nearDedupKeepBest(docs.withColumn("quality", lit(1.0)),
        "text", "doc_id", "quality", shingleN = 2, numHashes = 64, bands = 16, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    val kf = Dedup.nearDedup(docs, "text", "doc_id",
        shingleN = 2, numHashes = 64, bands = 16, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(const == kf, s"constant-quality keepbest $const != keepfirst $kf")
  }

  test("clusterCandidates: a 30-hop duplicate chain fully merges within maxIter=10") {
    // plain 1-hop min-label needs 30 rounds for this graph; pointer jumping
    // must close it inside the default bound — the VERDICT r4 silent
    // under-merge scenario
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // maxLocalEdges = 0 forces the DISTRIBUTED loop — the small-graph
    // union-find path would solve any spec-sized graph trivially
    val labels = Dedup.clusterCandidates(pairs, maxIter = 10, maxLocalEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 31)
    assert(labels.values.forall(_ == 0L), s"under-merged: ${labels.filter(_._2 != 0L)}")
  }

  test("clusterCandidates: non-convergence is LOUD, never a silent under-merge") {
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.clusterCandidates(pairs, maxIter = 1, maxLocalEdges = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("clusterCandidates: local union-find and distributed loop agree exactly") {
    // mixed shapes: chain, star, triangle + bridge, singleton edge, and
    // reversed/duplicate pairs — labels must be identical on both paths
    val raw = (0L until 12L).map(i => (i, i + 1)) ++
      Seq((50L, 20L), (50L, 21L), (50L, 22L), (30L, 31L), (31L, 32L), (32L, 30L),
        (32L, 33L), (40L, 41L), (41L, 40L), (40L, 41L))
    val pairs = raw.toDF("id_a", "id_b")
    def run(cutoff: Long) = Dedup.clusterCandidates(pairs, maxLocalEdges = cutoff)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run(1000000L)
    val dist = run(0L)
    assert(local == dist, s"local=$local dist=$dist")
    assert(local(33L) == 30L && local(22L) == 20L && local(41L) == 40L && local(12L) == 0L)
  }

  test("golden-gated queries are run-to-run deterministic (golden methodology guard)") {
    // the sf0.01 goldens in /root/repo/goldens pin these queries' output;
    // that is only sound if the queries are pure functions of the data —
    // two fresh runs must agree exactly (partitioning-independence was
    // additionally diffed across core counts before committing goldens)
    val names = Seq("q_fingerprint", "q_winnow", "q_dedup_simhash", "q_bpe_merges",
      "q_dedup_minhash", "q_near_dedup", "q_dedup_clusters", "q_embed_neardup", "q_ann_lsh",
      "q_deflate_ratio", "q_pq_encode", "q_semantic_dedup")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val a = qs(n)(spark, sfDir).collect().map(_.toString).sorted.toSeq
      val b = qs(n)(spark, sfDir).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$n is not run-to-run deterministic — golden gate unsound")
    }
  }

  test("vocabulary: df filter, deterministic ordering") {
    val d = Seq((1L, "spark spark table"), (2L, "spark row"), (3L, "table row row"))
      .toDF("doc_id", "text")
    val v = graft.text.TextLib.vocabulary(d, "text", minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.toSeq == Seq(("row", 3L, 2L), ("spark", 3L, 2L), ("table", 2L, 2L)))
  }

  test("stratified sample is seeded-deterministic and per-stratum") {
    val d = (1 to 2000).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val fr = Map[Any, Double]("a" -> 0.5, "b" -> 0.0)
    val s1 = graft.ops.Relational.stratifiedSample(d, "s", fr).select("id").as[Int].collect().toSeq
    val s2 = graft.ops.Relational.stratifiedSample(d, "s", fr).select("id").as[Int].collect().toSeq
    assert(s1 == s2 && s1.nonEmpty)
    assert(s1.forall(_ % 2 == 0)) // stratum b excluded
  }

  test("native expressions callable from SQL after registration") {
    graft.expr.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("gf_docs")
    val row = spark.sql(
      """SELECT size(graft_word_shingles(text, 2)) AS n_sh,
        |       size(graft_minhash_sig(graft_word_shingles(text, 2), 16)) AS n_sig
        |FROM gf_docs WHERE doc_id = 1""".stripMargin).head()
    assert(row.getInt(0) > 5 && row.getInt(1) == 16)
    val p = spark.sql("SELECT graft_exact_percentile(CAST(doc_id AS DOUBLE), 0.5) FROM gf_docs")
      .head().getDouble(0)
    assert(p == 3.0)
  }

  test("fingerprint is stable under case/whitespace noise") {
    val fp = docs.select($"doc_id", TextLib.fingerprint($"text", 2).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(3L))
  }

  test("dedupAgainstCorpus equals exact anti-join on normalized text; nulls pass") {
    val snapshot = Seq(
      (1L, "The quick brown fox"),
      (2L, "pack my box with five dozen jugs"),
      (3L, "some other accepted document")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the  QUICK brown fox "),      // normalized dup of snapshot 1 → dropped
      (11L, "a genuinely new document"),    // kept
      (12L, null.asInstanceOf[String]),     // null text passes through
      (13L, "PACK my box with five dozen jugs"), // dup of snapshot 2 → dropped
      (14L, "some other accepted documents")     // near-dup but NOT exact → kept
    ).toDF("doc_id", "text")
    val got = Dedup.dedupAgainstCorpus(batch, "text", snapshot, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 12L, 14L))
    // high-fpp bloom still yields exact results (suspects re-checked exactly)
    val sloppy = Dedup.dedupAgainstCorpus(batch, "text", snapshot, "text", fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(sloppy == got)
  }

  test("paragraphDedup keeps first occurrence, reassembles in order") {
    val d = Seq(
      (1L, "unique one\n\nBOILER"),
      (2L, "unique two\n\nBOILER"),
      (3L, "unique one\n\nsomething else"),
      (4L, null.asInstanceOf[String]),
      (5L, "unique one") // every paragraph already seen → empty survivor
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, "text", "doc_id")
      .select("doc_id", "text", "n_paras", "n_paras_kept")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "unique one\n\nBOILER", 2, 2))) // first sighting keeps all
    assert(out(1) == ((2L, "unique two", 2, 1)))           // boilerplate removed
    assert(out(2) == ((3L, "something else", 2, 1)))       // leading dup para removed
    assert(out(3) == ((4L, null, 0, 0)))                   // null text passes through
    assert(out(4) == ((5L, "", 1, 0)))                     // fully-duplicated doc → empty
  }

  test("paragraphDedup minChars exempts short paragraphs from dedup") {
    val d = Seq(
      (1L, "Intro\n\na long enough paragraph of real content here"),
      (2L, "Intro\n\nanother long enough paragraph of real content")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, "text", "doc_id", minChars = 10)
      .select("doc_id", "n_paras_kept").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 2, 2L -> 2)) // "Intro" repeats but is exempt (< 10 chars)
  }

  test("duplicateSpans finds a shared passage with exact span bounds") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two alpha beta gamma delta epsilon zeta nine ten"),
      (3L, "completely unrelated words with no shared runs at all")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(d, "text", "doc_id", k = 3, minCount = 2)
      .select("doc_id", "n_tokens", "n_grams", "n_dup_grams", "n_spans", "dup_tokens", "max_span_tokens")
      .as[(Long, Int, Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    // shared run = "alpha beta gamma delta epsilon zeta" (6 tokens → 4 shared 3-grams)
    assert(out(0) == ((1L, 8, 6, 4L, 1L, 6L, 6L)))   // span covers tokens 1..6
    assert(out(1) == ((2L, 10, 8, 4L, 1L, 6L, 6L)))  // span covers tokens 3..8
    assert(out(2) == ((3L, 9, 7, 0L, 0L, 0L, 0L)))   // nothing flagged
    assertNoCartesian(Dedup.duplicateSpans(d, "text", "doc_id", k = 3, minCount = 2))
  }

  test("null-id rows pass through paragraphDedup/duplicateSpans untouched") {
    val d = Seq(
      (java.lang.Long.valueOf(1L), "shared para\n\nunique a"),
      (java.lang.Long.valueOf(2L), "shared para\n\nunique b"),
      (null.asInstanceOf[java.lang.Long], "shared para\n\nunique c")
    ).toDF("doc_id", "text")
    val pd = Dedup.paragraphDedup(d, "text", "doc_id").collect()
    val pdNull = pd.find(_.isNullAt(0)).get
    assert(pdNull.getAs[String]("text") == "shared para\n\nunique c") // untouched
    assert(pdNull.getAs[Int]("n_paras_kept") == 2)
    assert(pd.find(_.getLong(0) == 2L).get.getAs[String]("text") == "unique b") // dedup still ran
    val ds = Dedup.duplicateSpans(d, "text", "doc_id", k = 2, minCount = 2).collect()
    val dsNull = ds.find(_.isNullAt(0)).get
    assert(dsNull.isNullAt(dsNull.fieldIndex("n_spans")), "null id → null stats, not 0")
    assert(dsNull.getAs[Int]("n_tokens") == 4) // row-local stats still fill
    assert(ds.find(_.getLong(0) == 1L).get.getAs[Long]("n_spans") == 1L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged incl. nulls") {
    val oldDf = Seq((1L, "alpha"), (2L, "beta"), (3L, null.asInstanceOf[String]),
      (4L, "delta"), (6L, "zeta")).toDF("doc_id", "text")
    val newDf = Seq((1L, "ALPHA  "), (2L, "rewritten"), (3L, null.asInstanceOf[String]),
      (5L, "epsilon"), (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(oldDf, newDf, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", // case/whitespace noise is not a change
      2L -> "changed",
      3L -> "unchanged", // null -> null
      4L -> "removed",
      5L -> "added",
      6L -> "changed"))  // text -> null IS a change
  }

  test("winnowFingerprint: shared-run guarantee, noise stability, size bound") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = Seq(
      (1L, s"intro words here $shared closing remarks"),
      (2L, s"совершенно other start $shared and a different tail entirely"),
      (3L, "nothing in common with those documents at all not one single run"),
      (4L, s"INTRO   words HERE $shared closing remarks"), // case/ws noise of 1
      (5L, "tiny doc"),                                    // < k tokens → empty set
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val k = 5; val w = 4
    val fp = d.select(col("doc_id"), graft.text.TextLib.winnowFingerprint(col("text"), k, w).as("fp"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    // 12-token shared run >= w+k-1=8 → at least one common fingerprint
    assert((fp(1L).get.toSet & fp(2L).get.toSet).nonEmpty, "shared run must share a fingerprint")
    assert((fp(3L).get.toSet & fp(1L).get.toSet).isEmpty, "unrelated docs share nothing")
    assert(fp(1L).get == fp(4L).get, "case/whitespace noise must not move fingerprints")
    assert(fp(5L).get.isEmpty, "sub-k docs have no grams")
    assert(fp(6L).isEmpty, "null text → null fingerprints")
    // size bound: |fp| <= #windows <= #grams
    val n1 = "intro words here".split(" ").length + shared.split(" ").length + 2
    assert(fp(1L).get.length <= n1 - k + 1)
  }

  test("pruneNeardupBloomVersions ignores foreign/malformed v= entries (round 14)") {
    // ADVICE r13: a non-numeric "v=" directory (somebody's backup, a
    // copy-paste artifact) used to throw NumberFormatException inside the
    // streaming batch and fail ingest — it is not a version and must be
    // skipped like any other non-version file, and never deleted
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_foreign").toString
    for (v <- 0 to 2) {
      val d = new java.io.File(s"$dir/v=$v"); d.mkdirs()
      new java.io.File(d, "_SUCCESS").createNewFile()
    }
    val foreign = new java.io.File(s"$dir/v=backup"); foreign.mkdirs()
    new java.io.File(foreign, "_SUCCESS").createNewFile()
    new java.io.File(s"$dir/v=2.old").mkdirs() // malformed AND incomplete
    val pruned = Dedup.pruneNeardupBloomVersions(spark, dir, keep = 2)
    assert(pruned == Seq(0L), s"pruned: $pruned")
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(left == Set("v=1", "v=2", "v=backup", "v=2.old"), s"left: $left")
  }

  test("duplicateSpans merges overlapping windows, splits distant ones") {
    // two shared passages in one doc separated by > k unique tokens → 2 spans
    val shared1 = "red orange yellow green"
    val shared2 = "lion tiger bear wolf"
    val d = Seq(
      (1L, s"$shared1 u1 u2 u3 u4 u5 $shared2"),
      (2L, s"x1 $shared1 x2 x3 x4 x5 x6 $shared2 x7")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(d, "text", "doc_id", k = 3, minCount = 2)
      .select("doc_id", "n_spans", "dup_tokens").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2L, 8L))) // two 4-token spans
    assert(out(1) == ((2L, 2L, 8L)))
  }
}
