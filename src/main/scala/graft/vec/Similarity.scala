package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * beyond-reference ANN surface. Three tiers:
  *
  *   1. `bruteTopK` — exact cosine top-k: broadcast the (small) query set,
  *      score every corpus row, per-query top-k via window. One corpus scan,
  *      no shuffle of the corpus itself. The correctness baseline.
  *   2. `lshTopK` — random-hyperplane LSH: bucket corpus and queries by
  *      sign-bit bands; only same-bucket pairs are scored. No cross join
  *      anywhere in the plan.
  *   3. `ivfTopK` — IVF: k-means coarse centroids (trained once), probe the
  *      `nprobe` nearest lists per query. The 100 TB path: corpus shuffled
  *      once by centroid id, queries routed to lists.
  */
object Similarity {

  /** Dot product of two numeric-array columns — native expression
    * (graft.expr.DotProduct); the HOF `aggregate(zip_with(...))` shape is
    * interpreted per element in Spark 4.1.
    */
  def dot(a: Column, b: Column): Column = graft.expr.DotProduct(a, b)

  def l2Norm(a: Column): Column = graft.expr.L2NormExpr(a)

  /** Cosine similarity; null (not DIVIDE_BY_ZERO — ANSI mode is on) when
    * either vector has zero norm (padding / failed-encode vectors). Null
    * scores sort last under the desc top-k windows and fail threshold
    * filters, so degenerate vectors drop out instead of killing the job.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  /** [[cosine]] with the norms pre-hoisted: bit-identical when na/nb are
    * l2Norm(a)/l2Norm(b) (the division and the na*nb order are the same
    * expressions). Under a pair join the plain form recomputes BOTH norms
    * once per PAIR; hoisting computes each once per ROW above the join —
    * at 784M pairs (the sf≈10 contamination stress) that is 2/3 of the
    * arithmetic.
    */
  def cosinePreNorm(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / nullif(na * nb, lit(0.0))

  /** Rank tail shared by every ANN operator: the k best candidates per
    * query under (score desc|asc, neighbor_id asc) — Spark null placement
    * included — via the bounded [[graft.expr.BoundedTopK]] aggregate.
    * The previous `row_number().over(Window.partitionBy(query_id))` tail
    * shuffled the FULL candidate relation and sorted each query's whole
    * candidate stream in one task to keep k≈10 rows; the aggregate keeps
    * an O(k) heap per query with map-side partials, so the exchange
    * carries ≤ k rows per query per task. Same top-k set (the total order
    * makes it partitioning-independent), byte-identical outputs.
    */
  private[graft] def topKPerQuery(scored: DataFrame, scoreCol: String, k: Int,
                                scoreDesc: Boolean = true): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.expr.BoundedTopK(col(scoreCol), col("neighbor_id"), k, scoreDesc).as("__top"))
      .select(col("query_id"), explode(col("__top")).as("__t"))
      .select(col("query_id"), col("__t.id").as("neighbor_id"), col("__t.score").as(scoreCol))

  /** Exact cosine top-k. `queries` must be broadcast-small (the driver
    * enforces nothing; the plan hints broadcast). Output:
    * (query_id, neighbor_id, cos) — k rows per query, deterministic ties
    * (cos desc, neighbor id asc).
    */
  def bruteTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, excludeSelf: Boolean = true
  ): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .withColumn("__qn", l2Norm(col("__qv"))))
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .withColumn("__cn", l2Norm(col("__cv"))) // norm once per row, not per pair
      .crossJoin(q) // broadcast nested loop over the small query set — NOT corpus×corpus
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cos", round(cosinePreNorm(col("__cv"), col("__cn"), col("__qv"), col("__qn")), 6))
    topKPerQuery(scored, "cos", k)
  }

  /** Deterministic random hyperplanes: `nbits × dim` doubles seeded from
    * (seed, bit, dim index) — reproducible across runs and engines.
    */
  private[graft] def hyperplanes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature under the hyperplanes: array<int> of band hashes
    * indexed by band (`bands` bands of `bitsPerBand` bits), computed by the
    * native HyperplaneSig expression — one tight nbits×dim loop per row
    * instead of nbits interpreted per-plane dots. Pair with `posexplode`
    * (pos = band, col = bucket).
    */
  private def bandSignature(vec: Column, planes: Array[Array[Double]], bands: Int, bitsPerBand: Int): Column =
    graft.expr.HyperplaneSig(vec, planes, bands, bitsPerBand)

  /** LSH-bucketed approximate top-k: same-band-bucket candidates only.
    * Plan shape: corpus exploded once by band (bands× duplication, tunable),
    * equi-join on (band, bucket) — shuffle-bounded, no CartesianProduct.
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, dim: Int, bands: Int = 8, bitsPerBand: Int = 8, seed: Long = 42L,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val planes = hyperplanes(dim, bands * bitsPerBand, seed)
    // Corpus side carries IDS ONLY through the band explosion: riding the
    // vector through it would push bands× the array bytes through the
    // (band, bucket) exchange (same argument as minhashCandidates' r3
    // rework). Vectors re-enter once per surviving candidate below, where
    // the candidate set is small → AQE broadcasts it and the corpus scan
    // is probed map-side, never shuffled.
    val cSig = corpus.select(col(corpusId).as("neighbor_id"),
      posexplode(bandSignature(col(corpusVec), planes, bands, bitsPerBand)))
      .toDF("neighbor_id", "band", "bucket")
    // query side is broadcast-small; its vector rides along
    val qSig = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"),
      l2Norm(col(queryVec)).as("__qn"),
      posexplode(bandSignature(col(queryVec), planes, bands, bitsPerBand)))
      .toDF("query_id", "__qv", "__qn", "band", "bucket")
    val cands = cSig.join(broadcast(qSig), Seq("band", "bucket"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands
      .join(corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
        .withColumn("__cn", l2Norm(col("__cv"))), Seq("neighbor_id"))
      .withColumn("cos", round(cosinePreNorm(col("__cv"), col("__cn"), col("__qv"), col("__qn")), 6))
    topKPerQuery(scored, "cos", k)
  }

  /** IVF (inverted-file) approximate top-k: coarse-quantize the corpus with
    * k-means, score queries only against the `nprobe` nearest centroid lists.
    */
  /** Train the IVF coarse centroids alone — callers running several probe
    * configurations against ONE index (e.g. the q_ann_ivf recall-law gate)
    * train once and pass the result as `ivfTopK`'s `centroids` instead of
    * re-fitting an identical model per call.
    */
  def ivfTrainCentroids(
      corpus: DataFrame, corpusVec: String,
      nlist: Int = 16, seed: Long = 42L, maxTrainRows: Long = 100000L,
      trainFraction: Double = -1.0
  ): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // Coarse centroids need a representative sample, not the corpus: k-means
    // is iterative (each iteration scans its input), so training on 100 TB
    // would dominate the whole query. Standard IVF practice caps the
    // training set; the assignment pass still covers every row.
    // Pass trainFraction explicitly to skip the sizing count() — at corpus
    // scale that dedicated scan is itself worth avoiding.
    val trainBase =
      if (trainFraction > 0 && trainFraction < 1.0)
        corpus.sample(withReplacement = false, trainFraction, seed)
      else if (trainFraction >= 1.0) corpus
      else {
        val corpusRows = corpus.count()
        if (corpusRows <= maxTrainRows) corpus
        else corpus.sample(withReplacement = false,
          math.min(1.0, maxTrainRows.toDouble * 1.05 / corpusRows), seed)
      }
    val train = trainBase.select(array_to_vector(col(corpusVec).cast("array<double>")).as("features"))
    new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features").fit(train)
      .clusterCenters.map(_.toArray)
  }

  /** Persist trained IVF coarse centroids (round 10): at 100 TB the
    * coarse structure is trained once on a sample and reused by every
    * search job — it must survive the training job. Same one-row parquet
    * idiom as [[graft.vec.Pq.saveModel]]. */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
                    centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    Seq(Tuple1(centroids.map(_.toSeq).toSeq)).toDF("centroids")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load centroids written by [[saveCentroids]]; validates rectangular
    * shape so a corrupt file fails here, not inside a search plan. */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[Array[Double]] = {
    val cents = spark.read.parquet(path).select("centroids").head()
      .getSeq[scala.collection.Seq[Double]](0).map(_.toArray).toArray
    require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
      s"ivf loadCentroids: corrupt/ragged centroid table at $path")
    cents
  }

  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 2, seed: Long = 42L,
      excludeSelf: Boolean = true, maxTrainRows: Long = 100000L,
      trainFraction: Double = -1.0,
      centroids: Array[Array[Double]] = null
  ): DataFrame = {
    val spark = corpus.sparkSession
    val cents =
      if (centroids != null) centroids
      else ivfTrainCentroids(corpus, corpusVec, nlist, seed, maxTrainRows, trainFraction)
    val centroidNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    // per-centroid cosine as a row-local expression over the (driver-side)
    // centroid literals — assigning the corpus via crossJoin × nlist + a
    // per-row window would shuffle the nlist×-expanded corpus just to take
    // an argmax; this computes the same assignment with zero expansion.
    // ONE nested-array literal node (SemDedup precedent): the nlist×dim
    // composed-lit() tree was re-analyzed by Catalyst per action; element_at
    // over the single literal constant-folds to the same per-centroid arrays.
    // Zero-norm vectors coalesce to -2 (< any cosine) so ANSI never throws.
    val centArr = typedlit(cents.map(_.toSeq).toSeq)
    def centroidCos(vec: Column, i: Int): Column = coalesce(
      dot(vec, element_at(centArr, i + 1)) /
        nullif(l2Norm(vec) * lit(centroidNorms(i)), lit(0.0)),
      lit(-2.0))
    // argmax via array_max over (cos, -list_id) structs: max cosine, ties →
    // smallest list id (matching the old window's ORDER BY cd DESC, id ASC).
    // The outer coalesce is LOAD-BEARING for the plan, not the values (the
    // argmax over a non-empty literal-sized array never returns null): it
    // makes the expression non-nullable, so the inner equi-join on list_id
    // below cannot infer an `isnotnull(list_id)` filter — which pushdown
    // would substitute as this WHOLE argmax tree into the corpus scan's
    // data filters, re-running it interpreted per row (caught by the
    // expensive_scan_filter plan lint).
    def bestList(vec: Column): Column = coalesce(
      (array_max(array(cents.indices.map(i =>
        struct(centroidCos(vec, i).as("cd"), lit(-i).as("nl"))): _*))
        .getField("nl") * -1).cast("int"),
      lit(-1))
    val cAssigned = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .withColumn("__cn", l2Norm(col("__cv"))) // norm once per row, not per candidate pair
      .withColumn("list_id", bestList(col("__cv")))
    // the query side probes nprobe lists — tiny frame, window formulation is fine
    val centroidDf = broadcast(spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq).toDF("list_id", "__centroid"))
    val qAssigned = {
      val scored = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
        .withColumn("__qn", l2Norm(col("__qv")))
        .crossJoin(centroidDf)
        .withColumn("__cd", coalesce(
          dot(col("__qv"), col("__centroid")) /
            nullif(col("__qn") * l2Norm(col("__centroid")), lit(0.0)),
          lit(-2.0)))
      val w = Window.partitionBy(col("query_id")).orderBy(col("__cd").desc, col("list_id").asc)
      scored.withColumn("__lr", row_number().over(w)).filter(col("__lr") <= nprobe)
        .drop("__centroid", "__cd", "__lr")
    }
    val cands = cAssigned.join(qAssigned, Seq("list_id"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", round(cosinePreNorm(col("__cv"), col("__cn"), col("__qv"), col("__qn")), 6))
    topKPerQuery(cands, "cos", k)
  }

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): LSH
    * bucketing + cosine threshold — the embedding-space sibling of
    * Dedup.minhashCandidates. Output (id_a, id_b, cos), id_a < id_b.
    */
  def embeddingNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bands: Int = 8, bitsPerBand: Int = 8, seed: Long = 42L,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    val planes = hyperplanes(dim, bands * bitsPerBand, seed)
    // Same one-exchange shape as Dedup.minhashCandidates: the band explosion
    // carries ids only (vectors would ride the exchange bands× — and twice,
    // once per self-join side, in the old a×b formulation), pair expansion
    // happens in-array per bucket, vectors re-enter per surviving pair.
    val sig = corpus.select(col(idCol).as("id"),
      posexplode(bandSignature(col(vecCol), planes, bands, bitsPerBand)))
      .toDF("id", "band", "bucket")
    val vecs = corpus.select(col(idCol), col(vecCol))
      .withColumn("__n", l2Norm(col(vecCol))) // norm once per row, not per pair
    graft.text.Dedup.bucketPairs(sig, Seq("band", "bucket"), maxBucketSize)
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va"), col("__n").as("__na")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("cos", round(cosinePreNorm(col("__va"), col("__na"), col("__vb"), col("__nb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
