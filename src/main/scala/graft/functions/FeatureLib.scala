package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature engineering — §2.K, graft's equivalent of
  * transformations/feature_engineering.py (567 LoC). Expression-backed where
  * possible (codegen'd, oracle-checkable); MLlib-backed for the model-fitting
  * members (k-means binning/clustering, PCA, TF-IDF).
  */
object FeatureLib {

  // ------------------------------------------------------------ expressions

  /** Polynomial features (feature_engineering.py:18-72): powers up to
    * `degree` and optional pairwise interactions, as plain column products.
    */
  def polynomialFeatures(df: DataFrame, cols: Seq[String], degree: Int = 2,
                         interactionOnly: Boolean = false): DataFrame = {
    val powers =
      if (interactionOnly) Nil
      else for { c <- cols; d <- 2 to degree } yield (s"${c}_pow$d", pow(col(c), d))
    val interactions =
      for { i <- cols.indices; j <- cols.indices if i < j }
        yield (s"${cols(i)}_x_${cols(j)}", col(cols(i)) * col(cols(j)))
    (powers ++ interactions).foldLeft(df) { case (d, (name, e)) => d.withColumn(name, e) }
  }

  /** Ratio features with explicit division-by-zero policy
    * (feature_engineering.py:344-392): zero | null | inf.
    */
  def ratioFeature(df: DataFrame, name: String, num: String, den: String,
                   divByZero: String = "null"): DataFrame = {
    val ratio = col(num) / col(den)
    val guarded = divByZero match {
      case "zero" => when(col(den) === 0, 0.0).otherwise(ratio)
      case "null" => when(col(den) === 0, lit(null)).otherwise(ratio)
      // null operands stay null under every policy: without the leading
      // guard, num=null with den=0 makes the +Inf condition null, falls
      // through to the bare den===0 clause, and fabricates -Infinity
      case "inf"  => when(col(num).isNull || col(den).isNull, lit(null))
                      .when(col(den) === 0 && col(num) >= 0, lit(Double.PositiveInfinity))
                      .when(col(den) === 0, lit(Double.NegativeInfinity))
                      .otherwise(ratio)
      case other  => throw new IllegalArgumentException(s"Unknown div_by_zero policy: $other")
    }
    df.withColumn(name, guarded)
  }

  /** Interaction features multiply/add/subtract with a pair cap
    * (feature_engineering.py:394-448).
    */
  def interactionFeatures(df: DataFrame, cols: Seq[String], op: String = "multiply",
                          maxInteractions: Int = 20): DataFrame = {
    val pairs = (for { i <- cols.indices; j <- cols.indices if i < j } yield (cols(i), cols(j)))
      .take(maxInteractions)
    pairs.foldLeft(df) { case (d, (a, b)) =>
      val e = op match {
        case "multiply" => col(a) * col(b)
        case "add"      => col(a) + col(b)
        case "subtract" => col(a) - col(b)
        case other      => throw new IllegalArgumentException(s"Unknown interaction op: $other")
      }
      d.withColumn(s"${a}_${op}_$b", e)
    }
  }

  /** Uniform-width binning (feature_engineering.py:86-97): bin edges from the
    * global min/max, broadcast back — one aggregate + one projection, exact
    * and scale-safe. Output bin ∈ [0, nBins-1].
    */
  def binUniform(df: DataFrame, c: String, nBins: Int, outCol: String = null): DataFrame = {
    val out = Option(outCol).getOrElse(s"${c}_bin")
    val stats = df.agg(min(col(c)).cast("double").as("__mn"), max(col(c)).cast("double").as("__mx"))
    // nullif width guard: a constant column has mx == mn, and the bare
    // division is an ANSI DIVIDE_BY_ZERO job-killer; all rows then coalesce
    // to bin 0. Null inputs keep a null bin (greatest() skips nulls, so the
    // unguarded expression would silently absorb missing data into bin 0).
    val width = nullif((col("__mx") - col("__mn")) / nBins, lit(0.0))
    df.crossJoin(broadcast(stats))
      .withColumn(out,
        when(col(c).isNotNull,
          coalesce(
            least(greatest(floor((col(c) - col("__mn")) / width), lit(0)), lit(nBins - 1)),
            lit(0)).cast("int")))
      .drop("__mn", "__mx")
  }

  /** Exact quantile binning (feature_engineering.py:98-109): cut points are
    * exact percentiles broadcast back (ntile would mis-handle ties at scale;
    * fixed cut points keep bin semantics stable across re-runs).
    */
  def binQuantile(df: DataFrame, c: String, nBins: Int, outCol: String = null): DataFrame =
    binQuantileGrouped(df, c, nBins, Seq.empty, outCol) // same cuts/'>'/null conventions

  /** Per-group quantile binning: cut points computed per group with the
    * exact `percentile` aggregate (|groups| rows, broadcast back), bin
    * assignment row-local. The CCNet-style corpus gate — "keep the head /
    * middle / tail of the perplexity distribution PER LANGUAGE" — is this
    * composed after TextLib.unigramScore:
    * `binQuantileGrouped(scored, "lm_logprob", 3, Seq("lang"),
    *   labels = Seq("tail", "middle", "head"))`.
    *
    * Scale: one map-side-combined aggregate + a broadcast hash join — the
    * data itself never shuffles (same class as the fill_null-mean /
    * global-binQuantile scalar-broadcast pattern). NULL group keys join
    * null-safely (<=>) so they bin within their own group instead of being
    * dropped; NULL values → NULL bin (binQuantile's convention). With
    * `labels` (length nBins) the output column is the label string instead
    * of the bin index.
    */
  def binQuantileGrouped(df: DataFrame, c: String, nBins: Int, groupCols: Seq[String],
                         outCol: String = null, labels: Seq[String] = null): DataFrame = {
    require(nBins >= 2, s"binQuantileGrouped: nBins must be >= 2, got $nBins")
    require(labels == null || labels.length == nBins,
      s"binQuantileGrouped: ${if (labels == null) 0 else labels.length} labels for $nBins bins")
    val out = Option(outCol).getOrElse(s"${c}_qbin")
    val cuts = (1 until nBins).map(i => percentile(col(c), lit(i.toDouble / nBins)).as(s"__q$i"))
    val stats =
      if (groupCols.isEmpty) df.agg(cuts.head, cuts.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(cuts.head, cuts.tail: _*)
    val statsR = groupCols.foldLeft(stats)((d, g) => d.withColumnRenamed(g, s"__g_$g"))
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(statsR))
      else df.join(broadcast(statsR),
        groupCols.map(g => col(g) <=> col(s"__g_$g")).reduce(_ && _), "left")
    val binIdx = (1 until nBins).foldLeft(lit(0): Column) { (acc, i) =>
      acc + when(col(c) > col(s"__q$i"), 1).otherwise(0)
    }
    val binned =
      if (labels != null) when(col(c).isNotNull, element_at(array(labels.map(lit): _*), binIdx.cast("int") + 1))
      else when(col(c).isNotNull, binIdx.cast("int"))
    joined.withColumn(out, binned)
      .drop((1 until nBins).map(i => s"__q$i") ++ groupCols.map(g => s"__g_$g"): _*)
  }

  /** K-means 1-D binning (feature_engineering.py:110-127) via MLlib.
    *
    * Thin wrapper over [[kmeansLaw]] — the ONE k-means fit/transform path
    * in the library (clusteringFeatures shares it too), so the
    * q_fe_kmeans_bin nearest-centroid gate exercises the shipped operator
    * rather than a parallel training path. Rows with a null `c` are dropped
    * (MLlib cannot score them — previously they crashed the fit).
    */
  def binKmeans(df: DataFrame, c: String, nBins: Int, seed: Long = 42L, outCol: String = null): DataFrame = {
    val out = Option(outCol).getOrElse(s"${c}_kbin")
    // the law columns ride under private temp names so an input frame that
    // already carries cluster/not_nearest/... (a prior clustering step) is
    // neither clobbered nor rejected — the prediction goes straight to `out`
    kmeansLaw(df, Seq(c), nBins, seed, predCol = out,
        notNearestCol = "__bk_nn", badIdCol = "__bk_bad", distCol = "__bk_dist")
      .drop("__bk_nn", "__bk_bad", "__bk_dist")
  }

  // ------------------------------------------------------------ categorical

  /** Frequency encoding (feature_engineering.py:279-287): category →
    * occurrence count, via a count window (no join needed).
    */
  def encodeFrequency(df: DataFrame, c: String, outCol: String = null): DataFrame =
    df.withColumn(Option(outCol).getOrElse(s"${c}_freq"),
      count(lit(1)).over(Window.partitionBy(col(c))))

  /** Deterministic label encoding (feature_engineering.py:267-277):
    * lexicographic rank of the category (stable across runs, unlike
    * StringIndexer's frequency order with ties). Scale shape: the global
    * ordering runs only over the DISTINCT category set (small by
    * definition), which is then broadcast-joined back — no single-partition
    * window over the full table. Null categories get a null label.
    */
  def encodeLabel(df: DataFrame, c: String, outCol: String = null): DataFrame = {
    val out = Option(outCol).getOrElse(s"${c}_label")
    val labels = df.select(col(c)).where(col(c).isNotNull).distinct()
      .withColumn(out, (row_number().over(Window.orderBy(col(c))) - 1).cast("int"))
    df.join(broadcast(labels), Seq(c), "left")
  }

  /** One-hot encoding with a top-N cap → "other"
    * (feature_engineering.py:236-265): known values become indicator
    * columns; pass `values` to avoid the distinct pre-scan.
    */
  def encodeOneHot(df: DataFrame, c: String, values: Seq[String]): DataFrame = {
    val withOther = values.foldLeft(df) { (d, v) =>
      d.withColumn(s"${c}_$v", when(col(c) === v, 1).otherwise(0))
    }
    withOther.withColumn(s"${c}_other", when(col(c).isin(values: _*), 0).otherwise(1))
  }

  /** Smoothed target (mean) encoding — the standard supervised sibling of
    * frequency/label encoding (reference has frequency/label/onehot,
    * feature_engineering.py:236-287; mean encoding is the step a modeling
    * pipeline takes next): category → (n·mean_cat + m·prior)/(n + m) with
    * additive smoothing m pulling rare categories toward the global prior.
    *
    * Scale shape: ONE map-side-combined aggregate over the corpus produces
    * the |distinct|-row stats frame; the global prior is derived from that
    * same frame (Σ n·mean / Σ n — no second corpus scan) and rides a
    * one-row broadcast; delivery is a broadcast null-safe equi-join (null
    * categories encode as their own group, binQuantileGrouped's
    * convention). Null targets are excluded from both n and the prior
    * (count/avg semantics); an all-null category falls back to the prior.
    *
    * LEAKAGE caveat (round-6 ADVICE): with the default `fit = null` the
    * category means include each row's OWN target, so fitting and
    * transforming the same frame leaks the label into the feature. For
    * supervised use, pass the TRAINING split as `fit` and transform
    * held-out frames with it (the psiFit/psiApply discipline); same-frame
    * encoding is only sound for unsupervised/analytics uses.
    */
  def encodeTarget(df: DataFrame, c: String, targetCol: String, smoothing: Double = 20.0,
                   outCol: String = null, fit: DataFrame = null): DataFrame = {
    require(smoothing >= 0, s"encodeTarget: smoothing must be >= 0, got $smoothing")
    val out = Option(outCol).getOrElse(s"${c}_target")
    val stats = Option(fit).getOrElse(df).groupBy(col(c).as("__cat"))
      .agg(count(col(targetCol)).as("__n"), avg(col(targetCol)).as("__mean"))
    // prior over the aggregated stats frame: each corpus row counted once,
    // nothing rescans df. sum(n·mean) uses coalesce so all-null categories
    // (n=0, mean=null) contribute 0, not null-poison.
    val prior = stats.agg(
      (sum(coalesce(col("__n") * col("__mean"), lit(0.0))) / nullif(sum(col("__n")), lit(0L)))
        .as("__prior"))
    val enc = stats.crossJoin(broadcast(prior))
      .withColumn(out,
        when(col("__n") + lit(smoothing) > 0,
          (col("__n") * coalesce(col("__mean"), lit(0.0)) + lit(smoothing) * col("__prior")) /
            (col("__n") + lit(smoothing))))
      .select(col("__cat"), col(out))
    // categories UNSEEN in the fit frame take the global prior (standard
    // target-encoding semantics; with fit = df every category matches and
    // the coalesce is a no-op) — without this, a test-frame category absent
    // from training silently encoded as null (round-6 review)
    df.join(broadcast(enc), col(c) <=> col("__cat"), "left")
      .crossJoin(broadcast(prior.select(col("__prior").as("__gprior"))))
      .withColumn(out, coalesce(col(out), col("__gprior")))
      .drop("__cat", "__gprior")
  }

  /** Winsorization: clip a numeric column to its exact [lower, upper]
    * percentiles, globally or per group — the robust-statistics
    * complement of flagOutliers (flag vs repair). Cut points are exact
    * `percentile` aggregates (DuckDB quantile_cont parity, binQuantile's
    * convention) computed in one map-side-combined aggregate and broadcast
    * back; the clip itself is row-local least/greatest. Nulls stay null;
    * null group keys clip within their own group (null-safe join).
    */
  def winsorize(df: DataFrame, c: String, lower: Double = 0.05, upper: Double = 0.95,
                groupCols: Seq[String] = Nil, outCol: String = null): DataFrame = {
    require(lower >= 0 && upper <= 1 && lower < upper,
      s"winsorize: need 0 <= lower < upper <= 1, got ($lower, $upper)")
    val out = Option(outCol).getOrElse(s"${c}_wins")
    val cuts = Seq(percentile(col(c), lit(lower)).as("__lo"),
      percentile(col(c), lit(upper)).as("__hi"))
    val stats =
      if (groupCols.isEmpty) df.agg(cuts.head, cuts.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(cuts.head, cuts.tail: _*)
    val statsR = groupCols.foldLeft(stats)((d, g) => d.withColumnRenamed(g, s"__g_$g"))
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(statsR))
      else df.join(broadcast(statsR),
        groupCols.map(g => col(g) <=> col(s"__g_$g")).reduce(_ && _), "left")
    joined.withColumn(out,
        when(col(c).isNotNull,
          least(greatest(col(c).cast("double"), col("__lo")), col("__hi"))))
      .drop("__lo" +: "__hi" +: groupCols.map(g => s"__g_$g"): _*)
  }

  /** Feature scaling — the standalone form of the standardization the
    * reference buries inside clustering/PCA (feature_engineering.py:477,
    * 538 StandardScaler): `zscore` (x−μ)/σ, `minmax` (x−min)/(max−min),
    * `robust` (x−median)/IQR (50%-breakdown outlier-resistant). One
    * map-side-combined aggregate computes every column's stats; delivery
    * is the broadcast scalar/null-safe-group join shape shared with
    * binQuantileGrouped. Degenerate columns (σ=0, constant, IQR=0) scale
    * to null rather than ±Inf/ANSI-divide errors; null inputs stay null.
    * Output columns are `<col>_scaled`.
    */
  def scaleFeatures(df: DataFrame, cols: Seq[String], method: String = "zscore",
                    groupCols: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "scaleFeatures: need at least one column")
    val aggs = cols.flatMap { c =>
      method match {
        case "zscore" => Seq(avg(col(c)).as(s"__m_$c"), stddev(col(c)).as(s"__s_$c"))
        case "minmax" => Seq(min(col(c)).cast("double").as(s"__m_$c"),
          max(col(c)).cast("double").as(s"__s_$c"))
        case "robust" => Seq(percentile(col(c), lit(0.5)).as(s"__m_$c"),
          (percentile(col(c), lit(0.75)) - percentile(col(c), lit(0.25))).as(s"__s_$c"))
        case other => throw new IllegalArgumentException(s"Unknown scaling method: $other")
      }
    }
    val stats =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val statsR = groupCols.foldLeft(stats)((d, g) => d.withColumnRenamed(g, s"__g_$g"))
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(statsR))
      else df.join(broadcast(statsR),
        groupCols.map(g => col(g) <=> col(s"__g_$g")).reduce(_ && _), "left")
    val scaled = cols.foldLeft(joined) { (d, c) =>
      val x = col(c).cast("double")
      val expr = method match {
        case "zscore" => when(col(s"__s_$c") > 0, (x - col(s"__m_$c")) / col(s"__s_$c"))
        case "minmax" =>
          when(col(s"__s_$c") > col(s"__m_$c"),
            (x - col(s"__m_$c")) / (col(s"__s_$c") - col(s"__m_$c")))
        case "robust" => when(col(s"__s_$c") > 0, (x - col(s"__m_$c")) / col(s"__s_$c"))
      }
      d.withColumn(s"${c}_scaled", when(x.isNotNull, expr))
    }
    scaled.drop(cols.flatMap(c => Seq(s"__m_$c", s"__s_$c")) ++
      groupCols.map(g => s"__g_$g"): _*)
  }

  /** Group-aggregate features broadcast onto rows
    * (feature_engineering.py:298-342): window aggregate per key — one
    * shuffle, no join.
    */
  def aggregationFeatures(df: DataFrame, groupBy: Seq[String],
                          aggs: Seq[(String, String)]): DataFrame = {
    val w = Window.partitionBy(groupBy.map(col): _*)
    aggs.foldLeft(df) { case (d, (c, fn)) =>
      d.withColumn(s"${c}_${fn}_by_${groupBy.mkString("_")}",
        graft.ops.Relational.aggExpr(fn, c).over(w))
    }
  }

  // ------------------------------------------------------------ text / MLlib

  /** Text feature basic stats (feature_engineering.py:197-206). One
    * TextCharStats pass supplies all three: word count is the pinned
    * run-count spec (= tokenCountWs), avg word length = non-whitespace
    * chars / tokens, null (not ANSI DIVIDE_BY_ZERO, not NaN) for empty or
    * whitespace-only text — same guard TextLib.qualityFeatures uses.
    */
  def textBasicStats(df: DataFrame, c: String): DataFrame = {
    val st = graft.expr.TextCharStats(col(c))
    df.withColumn(s"${c}_char_count", length(col(c)))
      .withColumn("__tcs", st)
      .withColumn(s"${c}_word_count", col("__tcs.n_tokens"))
      .withColumn(s"${c}_avg_word_length",
        round(col("__tcs.n_nonws").cast("double") /
          nullif(col("__tcs.n_tokens"), lit(0)), 6))
      .drop("__tcs")
  }

  /** TF-IDF features (feature_engineering.py:152-173) via the standard MLlib
    * chain; returns the input plus a `tfidf` vector column.
    */
  def textTfidf(df: DataFrame, c: String, vocabSize: Int = 1000, minDF: Int = 1): DataFrame = {
    import org.apache.spark.ml.feature.{CountVectorizer, IDF, RegexTokenizer, StopWordsRemover}
    val tok = new RegexTokenizer().setInputCol(c).setOutputCol("__tok").setPattern("\\W+")
    val stop = new StopWordsRemover().setInputCol("__tok").setOutputCol("__tok2")
    val cv = new CountVectorizer().setInputCol("__tok2").setOutputCol("__tf")
      .setVocabSize(vocabSize).setMinDF(minDF.toDouble)
    val toks = stop.transform(tok.transform(df))
    val cvm = cv.fit(toks)
    val idf = new IDF().setInputCol("__tf").setOutputCol("tfidf").fit(cvm.transform(toks))
    idf.transform(cvm.transform(toks)).drop("__tok", "__tok2", "__tf")
  }

  /** Deterministic tf-idf as plain relational ops — the oracle-able sibling
    * of `textTfidf` (same smooth-idf formulation MLlib/sklearn use, but no
    * ML fit and no arbitrary tie-break: CountVectorizer orders equal-count
    * vocabulary terms by hashmap iteration order, so its vector layout is
    * not reproducible across engines). Tokens = the engine-wide whitespace
    * dialect (TextLib.normalized, split on ' '); vocabulary = top
    * `vocabSize` tokens by corpus term frequency, ties broken by token asc;
    * idf = ln((N+1)/(df+1)); tfidf = tf·idf. Output: one row per (id,
    * in-vocab token): idCol, token, tf, df, tfidf — a sparse-triplet layout
    * that joins/aggregates without a vector type.
    *
    * Scale shape: one explode with map-side-combined (id, token) counts,
    * one token-level re-aggregation, a TakeOrdered top-K for the vocabulary
    * (K rows, broadcast back). One extra count() pass sizes N — pass
    * `numDocs` to skip it when the caller already knows the corpus size.
    */
  def textTfidfTerms(df: DataFrame, c: String, idCol: String, vocabSize: Int = 1000,
                     numDocs: Long = -1L): DataFrame = {
    require(vocabSize > 0, s"textTfidfTerms: vocabSize must be positive, got $vocabSize")
    val n = if (numDocs >= 0) numDocs else df.count()
    val tf = df
      .select(col(idCol), explode(split(graft.text.TextLib.normalized(col(c)), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("token"))
      .agg(sum(col("tf")).as("__total"), count(lit(1)).as("df"))
      .orderBy(col("__total").desc, col("token").asc)
      .limit(vocabSize)
      .drop("__total")
    tf.join(broadcast(vocab), Seq("token"))
      .withColumn("tfidf", col("tf") * log(lit(n + 1.0) / (col("df") + lit(1.0))))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Top-k TF-IDF keywords per document — the keyword-extraction read of
    * [[textTfidfTerms]] (document tagging, dedup-cluster labeling, corpus
    * slicing by topic). Ranks are deterministic: tfidf values derive from
    * integer (tf, df, N) through identical IEEE ops in both engines, and
    * exact ties break on token order; the per-doc window is
    * rank-pushdown-rescued (partial top-k before the exchange).
    */
  def textTopKeywords(df: DataFrame, c: String, idCol: String, k: Int = 5,
                      vocabSize: Int = 1000): DataFrame = {
    require(k > 0, s"textTopKeywords: k must be positive, got $k")
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("token").asc)
    textTfidfTerms(df, c, idCol, vocabSize)
      .filter(col("tfidf") > 0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Clustering features (feature_engineering.py:450-511): k-means cluster id
    * + distance to own centroid over the given feature columns.
    *
    * The reference's `algorithm='dbscan'` branch lives in
    * [[graft.functions.Dbscan]] (grid-bucketed epsilon-neighborhood join +
    * pointer-jumping connected components — round 5; MLlib ships no DBSCAN,
    * so it is a native formulation, eps-grid cells standing in for sklearn's
    * ball tree). For >4-dim density grouping compose
    * `Similarity.embeddingNearDupPairs` (epsilon-ball pairs via LSH) with
    * `Dedup.clusterCandidates` — same result shape at bucketed-join cost.
    */
  def clusteringFeatures(df: DataFrame, cols: Seq[String], k: Int, seed: Long = 42L): DataFrame =
    // single code path with the law-gated frame: the q_fe_kmeans gate checks
    // the exact training+assignment this operator ships
    kmeansLaw(df, cols, k, seed).drop("not_nearest", "bad_cluster_id")

  /** Law-check frame for the MLlib k-means paths (clusteringFeatures /
    * binKmeans): trains the SAME model (same params/seed) and emits, per
    * row, the trained assignment plus violation flags computable without
    * pinning float centroids — the driver's oracle can then hard-gate the
    * k-means queries on "all violations are zero" even though the centroids
    * themselves are float-order/partitioning-dependent (VERDICT r5 #2).
    *
    * Laws (all row-local over the model's centers as literals):
    *  - `not_nearest`: 1 when the assigned center is farther than the true
    *    argmin by more than `tol` (assignment must be nearest-centroid);
    *  - `bad_cluster_id`: 1 when the assignment falls outside [0, k).
    * Rows with a null feature are dropped (MLlib cannot score them), so
    * callers should gate row counts against a null-free source. The frame
    * also carries `cluster` and `cluster_dist` (same formula as
    * clusteringFeatures) for callers that want both surfaces from one
    * training run.
    */
  def kmeansLaw(df: DataFrame, cols: Seq[String], k: Int, seed: Long = 42L,
                tol: Double = 1e-6, predCol: String = "cluster",
                notNearestCol: String = "not_nearest",
                badIdCol: String = "bad_cluster_id",
                distCol: String = "cluster_dist"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val feat = df.na.drop(cols)
      .withColumn("__f", array_to_vector(array(cols.map(c => col(c).cast("double")): _*)))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("__f").setPredictionCol(predCol).fit(feat)
    val centers = model.clusterCenters.map(_.toArray)
    def dist2(i: Int): Column = aggregate(
      zip_with(col("__fa"), array(centers(i).map(lit).toSeq: _*), (a, b) => (a - b) * (a - b)),
      lit(0.0d), (acc, x) => acc + x)
    val minD2 = (0 until centers.length).map(dist2).reduce(least(_, _))
    val assignedD2 = (0 until centers.length).foldLeft(lit(Double.NaN): Column) {
      (acc, i) => when(col(predCol) === i, dist2(i)).otherwise(acc)
    }
    model.transform(feat)
      .withColumn("__fa", vector_to_array(col("__f")))
      .withColumn(notNearestCol,
        when(sqrt(assignedD2) > sqrt(minD2) + tol, 1).otherwise(0))
      .withColumn(badIdCol,
        when(col(predCol) < 0 || col(predCol) >= k, 1).otherwise(0))
      .withColumn(distCol, sqrt(assignedD2))
      .drop("__f", "__fa")
  }

  /** PCA with auto-k by explained-variance threshold
    * (feature_engineering.py:513-567): standardize, fit full PCA once, pick
    * the smallest k reaching the threshold, project.
    */
  def pcaFeatures(df: DataFrame, cols: Seq[String], varianceThreshold: Double = 0.95,
                  maxK: Int = 0): DataFrame = {
    import org.apache.spark.ml.feature.{PCA, StandardScaler}
    import org.apache.spark.ml.functions.array_to_vector
    val kCap = if (maxK > 0) maxK else cols.size
    val feat = df.withColumn("__f", array_to_vector(array(cols.map(c => col(c).cast("double")): _*)))
    val scaler = new StandardScaler().setInputCol("__f").setOutputCol("__fs")
      .setWithMean(true).setWithStd(true).fit(feat)
    val scaled = scaler.transform(feat)
    val full = new PCA().setK(kCap).setInputCol("__fs").setOutputCol("__p").fit(scaled)
    val ev = full.explainedVariance.toArray
    val k = math.max(1, ev.scanLeft(0.0)(_ + _).drop(1).indexWhere(_ >= varianceThreshold) + 1 match {
      case 0 => kCap
      case n => n
    })
    val pca = new PCA().setK(k).setInputCol("__fs").setOutputCol("pca").fit(scaled)
    pca.transform(scaled).drop("__f", "__fs", "__p")
  }
}
