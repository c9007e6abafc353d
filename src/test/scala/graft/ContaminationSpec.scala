package graft

import org.apache.spark.sql.functions._
import graft.text.Contamination

/** Benchmark decontamination on a hand-computable corpus: overlap counts,
  * case-insensitivity (shingles are over normalized text), the clean-doc
  * invariant, and the no-Cartesian scale gate.
  */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def evalDf = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"),
    (200L, "one two three four five six")
  ).toDF("doc_id", "text")

  private def trainDf = Seq(
    (1L, "intro alpha beta gamma delta epsilon zeta outro"), // both eval-100 shingles
    (2L, "ALPHA BETA Gamma delta epsilon unrelated tail words"), // one, via normalization
    (3L, "zzz yyy xxx www vvv uuu"), // clean
    (4L, "prefix one two three four five six alpha beta gamma delta epsilon") // hits both eval docs
  ).toDF("doc_id", "text")

  test("contaminationStats counts distinct overlapping 5-grams and eval docs") {
    val stats = Contamination.contaminationStats(trainDf, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5)
    val m = stats.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map(1L -> ((2L, 1L)), 2L -> ((1L, 1L)), 4L -> ((3L, 2L))),
      s"unexpected stats: $m")
  }

  test("decontaminate drops only docs at/above minOverlap") {
    val kept = Contamination.decontaminate(trainDf, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5, minOverlap = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
    // minOverlap = 1: any shared 5-gram contaminates
    val strict = Contamination.decontaminate(trainDf, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5, minOverlap = 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(strict == Seq(3L))
  }

  test("packDocuments: offsets are running sums per shard, bins respect the budget rule") {
    val docs = Seq(
      (1L, "en", "one two three"),        // 3 tokens, offset 0,  bin 0
      (2L, "en", "four five"),            // 2 tokens, offset 3,  bin 0
      (3L, "en", "six seven eight nine"), // 4 tokens, offset 5,  bin 1 (5 >= budget 5... floor(5/5)=1)
      (4L, "de", "eins zwei")             // own shard: offset 0, bin 0
    ).toDF("doc_id", "lang", "text")
    val out = graft.text.TextLib.packDocuments(docs, "text", 5,
      partitionCols = Seq("lang"), orderCols = Seq("doc_id"))
      .select("doc_id", "n_tokens", "pack_offset", "pack_id")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out == Map(
      1L -> ((3, 0L, 0)), 2L -> ((2, 3L, 0)), 3L -> ((4, 5L, 1)), 4L -> ((2, 0L, 0))))
    // a doc straddling the boundary stays in the bin its offset starts in
    intercept[IllegalArgumentException] {
      graft.text.TextLib.packDocuments(docs, "text", 5, Nil, Seq("doc_id"))
    }
    // materialization: one row per (shard, pack), texts joined in offset
    // order — survives repartitioning (sorted reassembly, not collect_list)
    val packed = graft.text.TextLib.packDocuments(docs, "text", 5,
      partitionCols = Seq("lang"), orderCols = Seq("doc_id"))
    val mat = graft.text.TextLib.materializePacks(packed.repartition(7), "text",
        partitionCols = Seq("lang"), sep = " | ")
      .select("lang", "pack_id", "n_docs", "pack_tokens", "pack_text")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(mat(("en", 0)) == ((2L, 5L, "one two three | four five")))
    assert(mat(("en", 1)) == ((1L, 4L, "six seven eight nine")))
    assert(mat(("de", 0)) == ((1L, 2L, "eins zwei")))
  }

  test("sampleByHash is deterministic, repartition-stable, and ~fraction-sized") {
    val df = spark.range(10000).toDF("id")
    val a = graft.ops.Scale.sampleByHash(df, "id", 0.3).select("id").as[Long].collect().toSet
    val b = graft.ops.Scale.sampleByHash(df.repartition(7), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b, "hash gate must not depend on partitioning")
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.03, s"kept ${a.size} of 10000 at fraction 0.3")
    // nested fractions: the kept set at 0.1 is a subset of the kept set at 0.3
    val c = graft.ops.Scale.sampleByHash(df, "id", 0.1).select("id").as[Long].collect().toSet
    assert(c.subsetOf(a), "hash gates must nest: lower fraction ⊂ higher fraction")
  }

  test("mixtureSample tags lineage and decorrelates sources") {
    val web = spark.range(2000).toDF("id")
    val code = spark.range(2000).toDF("id")
    val mix = graft.ops.Scale.mixtureSample(
      Seq(("web", web, 0.5), ("code", code, 0.1)), "id")
    val bySource = mix.groupBy("mixture_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bySource("web") / 2000.0 - 0.5) < 0.05)
    assert(math.abs(bySource("code") / 2000.0 - 0.1) < 0.03)
    // same id space, different salts: if the gates shared a salt, the 10%
    // set would nest inside the 50% set — decorrelated salts break that
    val webIds = mix.filter($"mixture_source" === "web").select("id").as[Long].collect().toSet
    val codeIds = mix.filter($"mixture_source" === "code").select("id").as[Long].collect().toSet
    assert(codeIds.nonEmpty && webIds.nonEmpty)
    assert(!codeIds.subsetOf(webIds), "per-source salts must decorrelate the gates")
  }

  test("semanticContamination: max-cos argmax, tie-break, degenerate vectors, threshold") {
    val ev = Seq(
      (100L, Array(1.0f, 0.0f)),
      (200L, Array(0.0f, 1.0f)),
      (300L, Array(2.0f, 0.0f)) // same DIRECTION as 100 → cosine ties with it
    ).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(3.0f, 0.0f)),   // cos 1.0 vs eval 100 AND 300 → tie → min eval id 100
      (2L, Array(1.0f, 1.0f)),   // cos ~0.7071 vs both axes → argmax ties → 100
      (3L, Array(-1.0f, 0.0f)),  // best is eval 200 at cos 0.0 (vs -1.0 on the x axis)
      (4L, Array(0.0f, 0.0f))    // zero vector → every cosine null → null max_cos, false
    ).toDF("vec_id", "embedding")
    val full = Contamination.semanticContamination(
        train, "vec_id", "embedding", ev, "vec_id", "embedding", threshold = 0.9)
    // train columns are PRESERVED (a filter-and-continue pipeline needs them)
    assert(full.columns.toSeq ==
      Seq("vec_id", "embedding", "max_cos", "nearest_eval_id", "contaminated"))
    val out = full
      .select("vec_id", "max_cos", "nearest_eval_id", "contaminated")
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out(1L) == ((1.0, 100L, true)))
    assert(out(2L)._2 == 100L && math.abs(out(2L)._1 - 0.707107) < 1e-9 && !out(2L)._3)
    assert(out(3L) == ((0.0, 200L, false)))
    assert(out(4L)._1.isNaN && out(4L)._2 == -1L && !out(4L)._3)
    // threshold is inclusive at the rounded 6dp value
    val atEdge = Contamination.semanticContamination(
        train.filter($"vec_id" === 2L), "vec_id", "embedding",
        ev, "vec_id", "embedding", threshold = 0.707107)
      .select("contaminated").collect()(0).getBoolean(0)
    assert(atEdge)
  }

  test("cutContaminatedSpans: eval text is cut from train, clean text survives verbatim") {
    val ev = Seq(
      (900L, "what is the capital of assyria in the late bronze age"),
      (901L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val train = Seq(
      // benchmark question quoted mid-document → exactly those tokens cut
      (1L, "intro words here what is the capital of assyria in the late bronze age and some closing thoughts"),
      (2L, "完全 unrelated clean document with enough tokens to matter"),
      // partial overlap UNDER n tokens (4 < 5) → invisible, untouched
      (3L, "askers wonder what is the capital maybe"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Contamination.cutContaminatedSpans(train, "text", "doc_id", ev, "text", n = 5)
      .select("doc_id", "text", "n_tokens", "n_removed_tokens", "n_kept_tokens")
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 11 eval tokens cut, the 3+4 filler tokens survive in order
    assert(out(1L) == ("intro words here and some closing thoughts", 18L, 11L), s"doc1: ${out(1L)}")
    assert(!out(1L)._1.contains("assyria"), "no eval token may survive in the cut span")
    assert(out(2L)._3 == 0L, s"clean doc untouched: ${out(2L)}")
    assert(out(3L)._3 == 0L, s"sub-n overlap is invisible (threshold semantics): ${out(3L)}")
    assert(out(4L) == ((null, 0L, 0L)), s"null text passes through: ${out(4L)}")
  }

  test("semanticContamination kernel == the crossJoin plan it replaced, hostile inputs included") {
    // the MaxCosAgainst kernel claims bit-equality with the old plan-level
    // formulation (crossJoin → cosinePreNorm → round 6 → min(struct)) —
    // replay that plan inline and compare on a corpus with every hostile
    // shape: NaN elements, zero vectors, null elements, mismatched dims,
    // duplicate eval directions (rounded ties), and near-tie values
    import graft.vec.Similarity
    val rnd = new scala.util.Random(17)
    def vec(d: Int): Array[Float] = Array.fill(d)(rnd.nextGaussian().toFloat)
    val ev = ((0 until 40).map(i => (100L + i, vec(8))) ++ Seq(
      (900L, vec(8).map(_ * 0.0f)),                    // zero eval vector
      (901L, vec(5)),                                   // off-dim eval
      (902L, Array(1f, 2f, Float.NaN, 0f, 0f, 0f, 0f, 0f)), // NaN eval element
      (903L, vec(8)))).toDF("eid", "embedding")
    val evTies = ev.unionByName(                         // exact direction duplicates → ties
      ev.filter(col("eid") === 103L).select((col("eid") + 800L).as("eid"),
        transform(col("embedding"), x => x * 2.0f).as("embedding")))
    val tr = ((0 until 60).map(i => (i.toLong, vec(8))) ++ Seq(
      (800L, vec(8).map(_ * 0.0f)),                    // zero train vector
      (801L, vec(5)),                                   // matches only the off-dim eval row
      (802L, Array(0.5f, Float.NaN, 1f, 0f, 0f, 0f, 0f, 0f)), // NaN train element
      (803L, null.asInstanceOf[Array[Float]])           // null train vector
      )).toDF("vec_id", "embedding")
    // inline replay of the pre-kernel plan, verbatim
    def joinPlan(threshold: Double) = {
      val evB = broadcast(evTies.filter(col("eid").isNotNull)
        .select(col("eid").as("__eid"), col("embedding").as("__ev"))
        .withColumn("__en", Similarity.l2Norm(col("__ev"))))
      val scored = tr.select(col("vec_id"), col("embedding").as("__tv"))
        .withColumn("__tn", Similarity.l2Norm(col("__tv")))
        .crossJoin(evB)
        .filter(size(col("__tv")) === size(col("__ev")) &&
          (col("__tn") * col("__en")) =!= lit(0.0))
        .withColumn("__cos", round(
          Similarity.cosinePreNorm(col("__tv"), col("__tn"), col("__ev"), col("__en")), 6))
        .groupBy(col("vec_id"))
        .agg(min(struct((-col("__cos")).as("nc"), col("__eid").as("i"))).as("__m"))
        .select(col("vec_id"), (-col("__m.nc")).as("max_cos"), col("__m.i").as("nearest_eval_id"))
      tr.join(scored, Seq("vec_id"), "left")
        .withColumn("contaminated", coalesce(col("max_cos") >= lit(threshold), lit(false)))
        .select("vec_id", "max_cos", "nearest_eval_id", "contaminated")
    }
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) "null" else r.getDouble(1).toString, // NaN-safe compare via string
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3)))).toMap
    for (threshold <- Seq(0.3, 0.95)) {
      val kernel = canon(Contamination.semanticContamination(
          tr, "vec_id", "embedding", evTies, "eid", "embedding", threshold)
        .select("vec_id", "max_cos", "nearest_eval_id", "contaminated"))
      val replay = canon(joinPlan(threshold))
      assert(kernel.keySet == replay.keySet)
      for (id <- kernel.keySet)
        assert(kernel(id) == replay(id), s"row $id: kernel=${kernel(id)} join=${replay(id)}")
    }
  }

  test("semanticContamination pre-screen == brute: flags, flagged values, clean nulls") {
    // adversarial geometry for the IVF-cell bound: random directions, exact
    // duplicates of eval rows in train (cos 1.0 + argmax ties), antipodal
    // vectors, zero vectors, a null eval id, and a mixed-dimension row on
    // each side; several cell counts, including more cells than eval rows
    val rnd = new scala.util.Random(11)
    def vec(d: Int): Array[Float] = Array.fill(d)((rnd.nextGaussian()).toFloat)
    val evRows = (0 until 25).map(i => (100L + i, vec(8))) ++ Seq(
      (900L, Array.fill(8)(0.0f)),          // zero eval vector: never scoreable
      (901L, vec(5)))                        // off-dimension eval row → residual cell
    val ev = (evRows.map { case (i, v) => (java.lang.Long.valueOf(i), v) } :+
      ((null.asInstanceOf[java.lang.Long], vec(8)))).toDF("vec_id", "embedding")
    val trRows = (0 until 40).map(i => (i.toLong, vec(8))) ++
      evRows.take(6).map { case (i, v) => (1000L + i, v.map(x => x * 2.5f)) } ++ // exact directions → ties
      Seq((800L, Array.fill(8)(0.0f)),       // zero train vector
          (801L, vec(5)),                    // train row matching the off-dim eval row's dim
          (802L, evRows.head._2.map(-_)),    // antipodal
          // NaN train elements (ADVICE r8): the centroid cosine is NaN, which
          // clamp() used to map to 1.0 → θ=0 → a FINITE bound that could
          // prune every cell — while brute flags the row (NaN >= threshold
          // under Spark ordering). The fix pins the bound at NaN (unprunable);
          // these rows must come back flagged with max_cos NaN and the same
          // tie-broken nearest id as brute.
          (803L, Array(0.5f, Float.NaN, 1f, 0f, 0f, 0f, 0f, 0f)),
          (804L, Array.fill(8)(Float.NaN)))
    val tr = trRows.toDF("vec_id", "embedding")
    for (threshold <- Seq(0.3, 0.8); cells <- Seq(2, 4, 64)) {
      def run(c: Int) = Contamination.semanticContamination(
          tr, "vec_id", "embedding", ev, "vec_id", "embedding", threshold, prescreenCells = c)
        .select("vec_id", "max_cos", "nearest_eval_id", "contaminated")
        .collect().map(r => r.getLong(0) -> ((
          if (r.isNullAt(1)) null else r.getDouble(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          r.getBoolean(3)))).toMap
      val brute = run(0); val scr = run(cells)
      assert(brute.keySet == scr.keySet)
      // the NaN rows must actually exercise the unprunable branch: brute
      // flags them (NaN >= threshold), so a pruned screened row would fail
      // the per-row comparison below rather than vacuously agree
      for (id <- Seq(803L, 804L))
        assert(brute(id)._3, s"NaN train row $id must be flagged by the brute path")
      val flagged = brute.count(_._2._3)
      assert(flagged > 0 && flagged < brute.size,
        s"threshold $threshold must split the corpus: $flagged/${brute.size} flagged")
      for ((id, (bCos, bId, bFlag)) <- brute) {
        val (sCos, sId, sFlag) = scr(id)
        assert(sFlag == bFlag, s"flag mismatch at $id (cells=$cells, thr=$threshold)")
        // NaN-safe: Scala == unboxes boxed doubles (NaN != NaN); total-order
        // compare treats the NaN max_cos of the new NaN-train rows as equal
        def deq(a: Any, b: Any): Boolean = (a, b) match {
          case (x: Double, y: Double) => java.lang.Double.compare(x, y) == 0
          case _ => a == b
        }
        if (bFlag) assert(deq(sCos, bCos) && sId == bId,
          s"flagged value mismatch at $id: brute=($bCos,$bId) screened=($sCos,$sId)")
        else assert(sCos == null && sId == null,
          s"clean row $id must report nulls under the screened contract, got ($sCos,$sId)")
      }
    }
  }

  test("semanticContamination pre-screen on CLUSTERED eval: pruning engages, output still brute") {
    // the geometry the screen is FOR: tight eval clusters (paraphrase
    // families) → small θ ranges per cell → a train vector far from every
    // cluster prunes ALL cells (zero surviving members — the left-join-null
    // path) while near-cluster vectors keep only their cluster's cell.
    // Isotropic gaussian suites (the bench fixture) provably cannot prune:
    // measured 0% at every in-range threshold, which is why the headliner
    // keeps the brute plan.
    val rnd = new scala.util.Random(5)
    def axis(i: Int, jitter: Double): Array[Float] = {
      val v = Array.fill(8)(rnd.nextGaussian() * jitter)
      v(i) += 1.0
      v.map(_.toFloat)
    }
    val ev = (0 until 30).map(j => (100L + j, axis(j % 3, 0.02))).toDF("vec_id", "embedding")
    val tr = ((0 until 10).map(j => (j.toLong, axis(j % 3, 0.05))) ++   // near a cluster
      (0 until 10).map(j => (50L + j, axis(5 + j % 3, 0.05)))           // far from all clusters
      ).toDF("vec_id", "embedding")
    def run(c: Int) = Contamination.semanticContamination(
        tr, "vec_id", "embedding", ev, "vec_id", "embedding", threshold = 0.9, prescreenCells = c)
      .select("vec_id", "max_cos", "nearest_eval_id", "contaminated")
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        r.getBoolean(3)))).toMap
    val brute = run(0); val scr = run(4)
    assert(brute.count(_._2._3) == 10 && scr.count(_._2._3) == 10,
      "every near-cluster vector must flag at 0.9; every far one must not")
    for ((id, (bCos, bId, bFlag)) <- brute) {
      val (sCos, sId, sFlag) = scr(id)
      assert(sFlag == bFlag, s"flag mismatch at $id")
      if (bFlag) assert(sCos == bCos && sId == bId, s"value mismatch at $id")
      else assert(sCos == null && sId == null, s"clean row $id must be null")
    }
  }

  test("semanticContamination: string eval ids work; nearest id keeps its type") {
    // eval suites are routinely keyed by string ids ("mmlu_00123"); the
    // argmin tie-break must use the id's native ordering, not a long cast
    // (which under ANSI would crash the job)
    val ev = Seq(
      ("mmlu_002", Array(1.0f, 0.0f)),
      ("mmlu_001", Array(2.0f, 0.0f)), // same direction → cosine tie
      (null.asInstanceOf[String], Array(0.0f, 1.0f)) // null id rows are dropped
    ).toDF("eid", "embedding")
    val train = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Contamination.semanticContamination(
        train, "vec_id", "embedding", ev, "eid", "embedding", threshold = 0.9)
      .select("vec_id", "max_cos", "nearest_eval_id", "contaminated")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((1.0, "mmlu_001", true))) // tie → lexicographically smallest id
    // the y-axis eval row had a null id and was dropped: train row 2's best
    // surviving cosine is 0.0 against the x-axis pair
    assert(out(2L)._1 == 0.0 && !out(2L)._3)
  }

  test("exactKeepBest keeps the max-quality member; null quality loses; null text passes") {
    import graft.text.Dedup
    val docs = Seq(
      (1L, "same doc", 0.2),  // dup group: 2 wins on quality
      (2L, "Same  DOC", 0.9), // normalization collapses case/whitespace
      (3L, "same doc", 0.9),  // ties with 2 on quality → min id 2 survives
      (4L, "other", Double.NaN),
      (5L, "solo", 0.1)
    ).toDF("doc_id", "text", "q")
      // NaN stands in for null quality below (Seq of Option is noisier)
      .withColumn("q", when(isnan(col("q")), lit(null).cast("double")).otherwise(col("q")))
    val kept = Dedup.exactKeepBest(docs, "text", "doc_id", "q")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L), s"got $kept")
    // null-quality member loses to any scored member of its group
    val mixed = Seq((10L, "d", null.asInstanceOf[java.lang.Double]),
      (11L, "d", java.lang.Double.valueOf(0.01))).toDF("doc_id", "text", "q")
    assert(Dedup.exactKeepBest(mixed, "text", "doc_id", "q")
      .select("doc_id").as[Long].collect().toSeq == Seq(11L))
    // null texts all pass through (per-row sentinel, no shared null group)
    val nulls = Seq((20L, null.asInstanceOf[String], 1.0),
      (21L, null.asInstanceOf[String], 2.0)).toDF("doc_id", "text", "q")
    assert(Dedup.exactKeepBest(nulls, "text", "doc_id", "q").count() == 2)
    // NaN quality must LOSE to any real score: Spark sorts NaN above +Inf,
    // so an unmapped NaN would win the desc ordering and elect the
    // degenerate copy — both null and NaN map to -Infinity instead
    val nan = Seq((30L, "d", java.lang.Double.valueOf(Double.NaN)),
      (31L, "d", java.lang.Double.valueOf(0.9)),
      (32L, "e", java.lang.Double.valueOf(Double.NaN)),
      (33L, "e", null.asInstanceOf[java.lang.Double])).toDF("doc_id", "text", "q")
    assert(Dedup.exactKeepBest(nan, "text", "doc_id", "q")
      .select("doc_id").as[Long].collect().toSet == Set(31L, 32L))
  }

  test("eval suite never collides with itself and the plan is join-bucketed") {
    // a clean corpus passes through untouched
    val clean = trainDf.filter(col("doc_id") === 3L)
    val out = Contamination.decontaminate(clean, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5)
    assert(out.count() == 1L)
    assertNoCartesian(Contamination.contaminationStats(trainDf, "text", "doc_id",
      evalDf, "text", "doc_id", n = 5))
  }
}
