package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frozen SEMANTIC gate — the embedding-space member of the frozen-gate
  * family (VERDICT r12 #6). The streaming dedup triad covers exact
  * (seenCorpusFit) and lexical near-dup (neardupBloomFit) screening;
  * this closes embedding space: screen incoming rows against a frozen,
  * batch-accepted corpus of embeddings without any join or state.
  *
  * Structure (the SemDeDup cell discipline): k-means centroids partition
  * the sphere into cells; the accepted corpus's vectors are indexed PER
  * CELL. Apply assigns each incoming row to its cell (argmax 6dp-rounded
  * cosine against the centroid literal — the [[Prototypes]] protocol, so
  * assignment replays in plain SQL) and screens it against ONLY that
  * cell's accepted reps via the [[graft.expr.MaxCosAgainst]] kernel (one
  * tight doubles loop; the index rides the task binary). A row flags
  * `sem_dup` iff its within-cell max cosine clears the threshold —
  * exactly the "would batch SemDeDup have paired me with an accepted
  * row" question, since batch SemDeDup also pairs within cells only.
  *
  * Scale shape: apply is a PURE MAP — k centroid dots + |cell| rep dots
  * per row, zero joins, zero shuffles, zero state — so it composes into
  * `readStream` like the other frozen gates. The accepted reps are a
  * driver-bounded collect (`maxReps`, the langIdFit bound class): the
  * gate is for screening against a bounded accepted set (eval suites,
  * curated corpora, a stream's own accepted head); past the bound the
  * snapshot-join tier ([[graft.text.Dedup.dedupAgainstCorpus]] /
  * [[SemDedup]]) is the documented route.
  *
  * Malformed vectors (wrong dimension, null elements, zero norm) carry a
  * null cell and flag false — a failed embedding is a near-duplicate of
  * nothing, mirroring SemDedup's "wrong-dim rows are duplicates of
  * nothing" and the bloom gate's null-signature convention.
  */
object SemGate {

  final case class SemGateModel(centroids: Array[Array[Double]],
                                reps: Array[graft.expr.EvalIndex]) {
    require(centroids.nonEmpty, "semGate: no centroids")
    require(centroids.length == reps.length,
      s"semGate: ${centroids.length} centroids but ${reps.length} rep cells")
    def dim: Int = centroids(0).length
  }

  /** Row-local cell assignment: argmax of the 6dp-rounded cosine to the
    * nested-array centroid literal, ties → smallest index (the
    * [[Prototypes]] numeric protocol verbatim — SQL-replayable). Null for
    * malformed rows.
    */
  private def cellExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val dim = centroids(0).length
    require(centroids.forall(_.length == dim), "semGate: ragged centroids")
    val norms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
    require(norms.forall(_ > 0), "semGate: zero-norm centroid")
    val centArr = typedlit(centroids.map(_.toSeq).toSeq)
    val vn = graft.expr.L2NormExpr(vec)
    def cosTo(i: Int): Column =
      round(graft.expr.DotProduct(vec, element_at(centArr, i + 1)) / (vn * lit(norms(i))), 6)
    val scoredArr = array(centroids.indices.map(i =>
      struct(cosTo(i).as("c"), lit(-i).as("ni"))): _*)
    when(size(vec) === lit(dim) && vn > lit(0.0),
      (lit(0) - array_max(scoredArr).getField("ni")).cast("int"))
  }

  /** Fit: freeze centroids (caller-provided for the oracle-replayable
    * path, else a deterministic [[Prototypes.protoFit]] Lloyd on the
    * accepted corpus) and index the accepted vectors per cell. One
    * assignment pass over the accepted corpus, collected driver-side
    * (bounded by `maxReps` — fails loudly rather than silently admitting
    * near-dups of un-indexed acceptances).
    *
    * Model envelope (round 14): the fitted model holds rows×dim doubles
    * on the DRIVER heap (×3–4 with Row boxing during fit) and again in
    * EVERY task binary at apply time — 1M reps × dim 768 would be ≈6 GB
    * of raw vector payload, far past what a task binary should carry.
    * Both bounds fail LOUDLY before any vector is collected: the row
    * count is checked with a column-pruned count (no vectors move), and
    * rows×dim must stay under [[MaxModelElems]] (2×10⁸ doubles ≈ 1.6 GB
    * raw — already generous; past it, the snapshot-join dedup tier is
    * the documented route).
    */
  val MaxModelElems: Long = 200000000L

  def semGateFit(accepted: DataFrame, idCol: String, vecCol: String,
                 nCells: Int = 16, seed: Long = 42L, maxTrainRows: Int = 100000,
                 maxReps: Int = 1000000,
                 centroids: Array[Array[Double]] = null): SemGateModel = {
    val cents =
      if (centroids != null) centroids
      else Prototypes.protoFit(accepted, idCol, vecCol, nCells, seed, maxTrainRows)
    val indexable = accepted
      .select(col(idCol).as("__gid"), col(vecCol).as("__gv"))
      .withColumn("__cell", cellExpr(col("__gv"), cents))
      .withColumn("__gn", Similarity.l2Norm(col("__gv")))
      .filter(col("__cell").isNotNull) // malformed accepted rows index nothing
    // bound checks BEFORE any vector reaches the driver: at the default
    // maxReps and typical dims an over-limit collect would be multiple GB
    // of boxed rows ahead of the require — count() prunes to no columns
    // and moves nothing
    val n = indexable.limit(maxReps + 1).count()
    require(n <= maxReps,
      s"semGate: accepted corpus exceeds maxReps=$maxReps indexable rows — " +
        "use the snapshot-join dedup tier instead of the frozen gate")
    val dim = cents(0).length
    require(n * dim <= MaxModelElems,
      s"semGate: model envelope $n rows x dim $dim = ${n * dim} doubles " +
        s"exceeds MaxModelElems=$MaxModelElems (~1.6 GB raw vector payload " +
        "on the driver heap and in every task binary) — use the " +
        "snapshot-join dedup tier instead of the frozen gate")
    val assigned = indexable
      .orderBy("__gid") // EvalIndex tie-break convention: ascending id
      .collect()
    val idType = accepted.schema(idCol).dataType
    def toD(v: Any): Array[Double] = v.asInstanceOf[scala.collection.Seq[Any]].map {
      case f: java.lang.Float => f.toDouble
      case n: java.lang.Number => n.doubleValue()
    }.toArray
    val byCell = assigned.groupBy(_.getInt(2))
    val reps = cents.indices.map { i =>
      val rows = byCell.getOrElse(i, Array.empty) // already id-ascending
      new graft.expr.EvalIndex(
        rows.map(r => toD(r.get(1))), rows.map(_.getDouble(3)),
        rows.map(_.get(0)).toArray[Any], idType)
    }.toArray
    SemGateModel(cents, reps)
  }

  /** Apply: adds `sem_cell` (null = malformed), `sem_max_cos` (6dp-rounded
    * max cosine against the row's own cell's accepted reps; null when the
    * cell is empty or the row malformed) and `sem_dup`
    * (max cos ≥ threshold; false on null). Pure map; pre-existing columns
    * of those names are replaced.
    */
  def semGateApply(df: DataFrame, vecCol: String, model: SemGateModel,
                   threshold: Double = 0.95): DataFrame = {
    require(threshold > -1 && threshold <= 1,
      s"semGate: threshold must be in (-1, 1], got $threshold")
    val base = df.drop("sem_cell", "sem_max_cos", "sem_dup")
      .withColumn("sem_cell", cellExpr(col(vecCol), model.centroids))
    // per-cell dispatch: a lazy CASE chain — only the matched cell's
    // kernel evaluates, so per-row work is k centroid dots + |cell| dots
    val screened = model.reps.indices.tail.foldLeft(
      when(col("sem_cell") === 0,
        graft.expr.MaxCosAgainst(col(vecCol), model.reps(0)).getField("cos"))) { (acc, i) =>
      acc.when(col("sem_cell") === i,
        graft.expr.MaxCosAgainst(col(vecCol), model.reps(i)).getField("cos"))
    }
    base.withColumn("sem_max_cos", screened)
      .withColumn("sem_dup", coalesce(col("sem_max_cos") >= lit(threshold), lit(false)))
  }

  /** Persist: centroids as the [[Similarity.saveCentroids]] one-row
    * nested-array parquet, reps as a (cell, id, vec, norm) parquet —
    * id type travels with the file, norms are the fit's engine-computed
    * values, so a loaded apply is bit-identical to the in-memory one.
    * The reps write is SHARDED at ~8M doubles (~64 MB) of vector payload
    * per file (round 14 — a model at the [[MaxModelElems]] ceiling would
    * otherwise be a single-task multi-GB write); [[loadSemGate]] re-sorts
    * on the unique (cell, id) key, so the rebuilt model is bit-identical
    * regardless of file count.
    */
  def saveSemGate(spark: org.apache.spark.sql.SparkSession,
                  model: SemGateModel, dir: String,
                  rowsPerFile: Long = 0L): Unit = {
    Similarity.saveCentroids(spark, model.centroids, s"$dir/centroids")
    import org.apache.spark.sql.types._
    val idType = model.reps(0).idType
    val schema = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("id", idType, nullable = false),
      StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("norm", DoubleType, nullable = false)))
    val rows = model.reps.zipWithIndex.flatMap { case (idx, cell) =>
      idx.ids.indices.map { j =>
        org.apache.spark.sql.Row(cell, idx.ids(j), idx.vecs(j).toSeq, idx.norms(j))
      }
    }
    val rpf = if (rowsPerFile > 0) rowsPerFile
              else math.max(1L, 8000000L / math.max(1, model.dim))
    val parts = math.max(1, math.ceil(rows.length.toDouble / rpf).toInt)
    spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
      .repartition(parts).write.mode("overwrite").parquet(s"$dir/reps")
  }

  /** Load a model written by [[saveSemGate]]. */
  def loadSemGate(spark: org.apache.spark.sql.SparkSession, dir: String): SemGateModel = {
    val cents = Similarity.loadCentroids(spark, s"$dir/centroids")
    val repDf = spark.read.parquet(s"$dir/reps")
    val idType = repDf.schema("id").dataType
    val rows = repDf.select("cell", "id", "vec", "norm").orderBy("cell", "id").collect()
    val byCell = rows.groupBy(_.getInt(0))
    val reps = cents.indices.map { i =>
      val rs = byCell.getOrElse(i, Array.empty)
      new graft.expr.EvalIndex(
        rs.map(_.getSeq[Double](2).toArray), rs.map(_.getDouble(3)),
        rs.map(_.get(1)).toArray[Any], idType)
    }.toArray
    SemGateModel(cents, reps)
  }
}
