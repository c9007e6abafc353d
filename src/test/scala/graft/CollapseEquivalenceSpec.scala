package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** The identical-signature collapse inside minhash/simhash candidate
  * generation is an OPTIMIZATION, not a semantics change: with the bucket
  * caps out of play (cap >= corpus size on both paths) the collapsed plan
  * must produce EXACTLY the pair set of the uncollapsed formulation it
  * replaced. This suite replays the pre-collapse plans inline (per-doc
  * banding, per-id signature lookups, pair-level estimate + filter) and
  * pins set equality over (id_a, id_b, estimate) on seeded random
  * duplicate-heavy corpora — families of exact copies, near-duplicates,
  * unique docs, empty and null texts.
  *
  * Deliberately NOT covered: cap-edge behavior, which is a documented
  * recall-only divergence (caps count distinct signatures post-collapse,
  * and null-signature docs no longer inflate buckets) — see the
  * minhashCandidates scaladoc and the cap-parity test in
  * DedupSimilaritySpec.
  */
class CollapseEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val NoCap = 1000000

  /** Seeded random corpus: unique docs + exact-copy families (depth 2-5)
    * + near-duplicates (one appended token) + degenerate rows.
    */
  private def corpus(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    def doc(): String =
      Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until n).map(i => (i.toLong, doc()))
    val copies = base.take(n / 4).flatMap { case (id, t) =>
      (1 to 1 + rnd.nextInt(4)).map(k => (id + 1000L * k, t))
    }
    val nears = base.slice(n / 4, n / 3).map { case (id, t) =>
      (id + 50000L, t + " zulu")
    }
    val degenerate = Seq((90000L, null: String), (90001L, ""), (90002L, ""))
    (base ++ copies ++ nears ++ degenerate).toDF("doc_id", "text")
  }

  /** The pre-collapse minhash plan, verbatim: every doc bands
    * individually, signatures re-join per id, estimate per pair.
    */
  private def uncollapsedMinhash(df: DataFrame, shingleN: Int, numHashes: Int,
                                 bands: Int, threshold: Double): DataFrame = {
    val rpb = numHashes / bands
    val sigs = df.select(col("doc_id").as("id"),
      Dedup.minhashSignature(col("text"), shingleN, numHashes).as("sig"))
    val buckets = sigs.select(col("id"),
        explode(Dedup.lshBandHashes(col("sig"), bands, rpb)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("bucket"))
    Dedup.bucketPairs(buckets, Seq("band", "bucket"), NoCap)
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** The pre-collapse simhash plan, verbatim. */
  private def uncollapsedSimhash(df: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = Dedup.simhash(df, "text", "doc_id")
    val blockStructs = (0 until 4).map { i =>
      struct(lit(i).as("blk"), shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL).as("v"))
    }
    val blocks = sigs.select(col("id"), explode(array(blockStructs: _*)).as("b"))
      .select(col("id"), col("b.blk").as("blk"), col("b.v").as("v"))
    Dedup.bucketPairs(blocks, Seq("blk", "v"), NoCap)
      .join(sigs.select(col("id").as("id_a"), col("simhash").as("sh_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("simhash").as("sh_b")), Seq("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  test("minhash: collapsed == uncollapsed pair set on random duplicate-heavy corpora") {
    for (seed <- Seq(7, 23, 101)) {
      val df = corpus(seed, 48).cache()
      // forceCollapse pins the collapsed plan — these corpora are
      // duplicate-heavy so the probe would pick it anyway, but the spec's
      // claim is about the PLAN, not the router
      val collapsed = Dedup.minhashCandidates(df, "text", "doc_id",
          shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5, maxBucketSize = NoCap,
          forceCollapse = Some(true))
        .as[(Long, Long, Double)].collect().toSet
      val reference = uncollapsedMinhash(df, 3, 32, 8, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(collapsed == reference,
        s"seed $seed: collapsed minus ref = ${(collapsed -- reference).take(5)}; " +
          s"ref minus collapsed = ${(reference -- collapsed).take(5)}")
      assert(collapsed.nonEmpty, s"seed $seed: corpus must actually exercise pairs")
      df.unpersist()
    }
  }

  test("minhash default plan == both pinned plans, on heavy AND light corpora") {
    // heavy: the random corpus carries exact-copy families (~40% dup mass);
    // light: unique docs only (drop the copy/near blocks by id range)
    val heavy = corpus(7, 48).cache()
    val light = corpus(7, 48).filter(col("doc_id") < 1000L).cache()
    def pairs(df: org.apache.spark.sql.DataFrame, force: Option[Boolean]) =
      Dedup.minhashCandidates(df, "text", "doc_id", 3, 32, 8, 0.5, NoCap, force)
        .as[(Long, Long, Double)].collect().toSet
    for (df <- Seq(heavy, light)) {
      val default = pairs(df, None)
      assert(default == pairs(df, Some(true)) && default == pairs(df, Some(false)))
    }
    heavy.unpersist(); light.unpersist()
  }

  test("nearDedup/keepBest: text-level exact collapse == member-level cluster pipeline (round 13)") {
    // the cluster-stage collapse (nearDupClusters): identical texts enter
    // banding once and expand onto their rep's component — survivor sets
    // must equal the old member-level pipeline's (candidates → components
    // → election) on the same duplicate-heavy corpora, for BOTH elections
    for (seed <- Seq(7, 23, 101)) {
      val df = corpus(seed, 48).withColumn("q", (col("doc_id") * 37 % 101).cast("double")).cache()
      val newMin = Dedup.nearDedup(df, "text", "doc_id", 3, 32, 8, 0.5, NoCap)
        .select("doc_id").as[Long].collect().toSet
      val oldClusters = Dedup.clusterCandidates(
        Dedup.minhashCandidates(df, "text", "doc_id", 3, 32, 8, 0.5, NoCap)
          .select("id_a", "id_b"))
      val oldMin = df.join(
          oldClusters.filter(col("id") =!= col("cluster_id")).select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
      assert(newMin == oldMin,
        s"seed $seed: min-id survivors diverged:\n new-old=${newMin -- oldMin}\n old-new=${oldMin -- newMin}")
      val newBest = Dedup.nearDedupKeepBest(df, "text", "doc_id", "q", 3, 32, 8, 0.5, NoCap)
        .select("doc_id").as[Long].collect().toSet
      val oldBest = Dedup.keepBestByCluster(df, "doc_id", "q", oldClusters)
        .select("doc_id").as[Long].collect().toSet
      assert(newBest == oldBest, s"seed $seed: keep-best survivors diverged")
      df.unpersist()
    }
  }

  test("nearDedup: capped corpus — text-collapse equals member-level pipeline with the cap in play (round 14)") {
    // ADVICE r13: the round-13 text-level collapse was UNgated — a
    // deeper-than-cap identical family was force-collapsed into a clique
    // the member-level pipeline never emitted (its identical-signature
    // bucket is past the cap there: no within-pairs, members kept absent
    // cross pairs). The collapse now routes past-cap groups through at
    // member level, where minhashCandidates' signature collapse applies
    // the documented cap semantics. Equivalence at a BINDING cap, plus an
    // explicit deep-family corpus.
    val cap = 3
    for (seed <- Seq(7, 23)) {
      // corpus families run 2-5 deep: cap 3 binds for the deeper ones
      val df = corpus(seed, 48).withColumn("q", (col("doc_id") * 37 % 101).cast("double")).cache()
      val newMin = Dedup.nearDedup(df, "text", "doc_id", 3, 32, 8, 0.5, cap)
        .select("doc_id").as[Long].collect().toSet
      val oldClusters = Dedup.clusterCandidates(
        Dedup.minhashCandidates(df, "text", "doc_id", 3, 32, 8, 0.5, cap)
          .select("id_a", "id_b"))
      val oldMin = df.join(
          oldClusters.filter(col("id") =!= col("cluster_id")).select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
      assert(newMin == oldMin,
        s"seed $seed cap $cap: survivors diverged:\n new-old=${newMin -- oldMin}\n old-new=${oldMin -- newMin}")
      val newBest = Dedup.nearDedupKeepBest(df, "text", "doc_id", "q", 3, 32, 8, 0.5, cap)
        .select("doc_id").as[Long].collect().toSet
      val oldBest = Dedup.keepBestByCluster(df, "doc_id", "q", oldClusters)
        .select("doc_id").as[Long].collect().toSet
      assert(newBest == oldBest, s"seed $seed cap $cap: keep-best survivors diverged")
      df.unpersist()
    }
    // explicit deep family: 7 byte-identical docs, cap 3, nothing else
    // similar — the member-level pipeline emits NO pairs (the family's
    // bucket is past the cap in every band), so every copy survives; the
    // ungated round-13 collapse would have kept exactly one
    val family = ((1L to 7L).map(i => (i, "golf hotel india juliet kilo lima mike november")) ++
      Seq((100L, "alpha bravo charlie delta echo foxtrot quebec romeo"),
          (101L, "sierra tango oscar papa zulu whiskey xray yankee")))
      .toDF("doc_id", "text")
    val survivors = Dedup.nearDedup(family, "text", "doc_id", 3, 32, 8, 0.5, 3)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == (1L to 7L).toSet ++ Set(100L, 101L),
      s"past-cap identical family must pass through uncollapsed: $survivors")
  }

  test("nearDedup: threshold > 1 keeps everything — the collapse may not invent pairs (round 14)") {
    // degenerate threshold: est <= 1.0 everywhere, so the member-level
    // pipeline emits nothing; identical-text groups must NOT collapse
    val df = corpus(7, 24)
    val kept = Dedup.nearDedup(df, "text", "doc_id", 3, 32, 8, 1.5, NoCap)
      .select("doc_id").as[Long].collect().toSet
    val all = df.select("doc_id").as[Long].collect().toSet
    assert(kept == all, s"threshold > 1 dropped ${all -- kept}")
  }

  test("minhash: threshold > 1 is empty on both paths (within-branch gate)") {
    val df = corpus(7, 24)
    assert(Dedup.minhashCandidates(df, "text", "doc_id",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 1.5, maxBucketSize = NoCap).count() == 0)
    assert(uncollapsedMinhash(df, 3, 32, 8, 1.5).count() == 0)
  }

  test("simhash: collapsed == uncollapsed pair set on random duplicate-heavy corpora") {
    for (seed <- Seq(7, 23, 101)) {
      val df = corpus(seed, 48).cache()
      val collapsed = Dedup.simhashCandidates(df, "text", "doc_id",
          maxHamming = 3, maxBucketSize = NoCap)
        .as[(Long, Long, Int)].collect().toSet
      val reference = uncollapsedSimhash(df, 3).as[(Long, Long, Int)].collect().toSet
      assert(collapsed == reference,
        s"seed $seed: collapsed minus ref = ${(collapsed -- reference).take(5)}; " +
          s"ref minus collapsed = ${(reference -- collapsed).take(5)}")
      assert(collapsed.nonEmpty, s"seed $seed: corpus must actually exercise pairs")
      df.unpersist()
    }
  }
}
