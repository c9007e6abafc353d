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

  /** Dot product of two float-array columns as one codegen'd expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

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
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv")))
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .crossJoin(q) // broadcast nested loop over the small query set — NOT corpus×corpus
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cos", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "neighbor_id", "cos")
  }

  /** Deterministic random hyperplanes: `nbits × dim` doubles seeded from
    * (seed, bit, dim index) — reproducible across runs and engines.
    */
  private[vec] def hyperplanes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature under the hyperplanes, as an array<int> of band
    * hashes: `bands` bands of `bitsPerBand` bits each.
    */
  private def bandSignature(vec: Column, planes: Array[Array[Double]], bands: Int, bitsPerBand: Int): Column = {
    val bits: Seq[Column] = planes.toSeq.map { p =>
      val planeLit = array(p.map(lit).toSeq: _*)
      when(dot(vec, planeLit) >= 0, 1).otherwise(0)
    }
    val bandCols = (0 until bands).map { b =>
      val slice = bits.slice(b * bitsPerBand, (b + 1) * bitsPerBand)
      val packed = slice.zipWithIndex.map { case (bit, i) => bit * math.pow(2, i).toInt }.reduce(_ + _)
      struct(lit(b).as("band"), packed.as("h"))
    }
    array(bandCols: _*)
  }

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
    val cSig = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      explode(bandSignature(col(corpusVec), planes, bands, bitsPerBand)).as("bh"))
      .select(col("neighbor_id"), col("__cv"), col("bh.band").as("band"), col("bh.h").as("bucket"))
    val qSig = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"),
      explode(bandSignature(col(queryVec), planes, bands, bitsPerBand)).as("bh"))
      .select(col("query_id"), col("__qv"), col("bh.band").as("band"), col("bh.h").as("bucket"))
    val cands = cSig.join(qSig, Seq("band", "bucket"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "neighbor_id", "cos")
  }

  /** IVF (inverted-file) approximate top-k: coarse-quantize the corpus with
    * k-means, score queries only against the `nprobe` nearest centroid lists.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 2, seed: Long = 42L,
      excludeSelf: Boolean = true
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val train = corpus.select(array_to_vector(col(corpusVec).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features").fit(train)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val centroidDf = broadcast(spark.createDataFrame(centroids.toSeq).toDF("list_id", "__centroid"))
    def nearestLists(vec: Column, n: Int): DataFrame => DataFrame = df => {
      val scored = df.crossJoin(centroidDf)
        .withColumn("__cd", dot(vec, col("__centroid")) / (l2Norm(vec) * l2Norm(col("__centroid"))))
      val w = Window.partitionBy(col("__pk")).orderBy(col("__cd").desc, col("list_id").asc)
      scored.withColumn("__lr", row_number().over(w)).filter(col("__lr") <= n)
        .drop("__centroid", "__cd", "__lr")
    }
    val cAssigned = nearestLists(col("__cv"), 1)(
      corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"), col(corpusId).as("__pk")))
      .drop("__pk")
    val qAssigned = nearestLists(col("__qv"), nprobe)(
      queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"), col(queryId).as("__pk")))
      .drop("__pk")
    val cands = cAssigned.join(qAssigned, Seq("list_id"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "neighbor_id", "cos")
  }

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): LSH
    * bucketing + cosine threshold — the embedding-space sibling of
    * Dedup.minhashCandidates. Output (id_a, id_b, cos), id_a < id_b.
    */
  def embeddingNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bands: Int = 8, bitsPerBand: Int = 8, seed: Long = 42L
  ): DataFrame = {
    val planes = hyperplanes(dim, bands * bitsPerBand, seed)
    val sig = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"),
      explode(bandSignature(col(vecCol), planes, bands, bitsPerBand)).as("bh"))
      .select(col("id"), col("__v"), col("bh.band").as("band"), col("bh.h").as("bucket"))
    val a = sig.select(col("band"), col("bucket"), col("id").as("id_a"), col("__v").as("__va"))
    val b = sig.select(col("band"), col("bucket"), col("id").as("id_b"), col("__v").as("__vb"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
