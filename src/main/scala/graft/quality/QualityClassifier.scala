package graft.quality

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based document quality gate — the GPT-3/WebText recipe: train
  * a linear classifier to distinguish a REFERENCE corpus (curated, assumed
  * good) from the raw crawl, then keep crawl documents the model scores
  * reference-like. Heuristic filters (TextLib.qualityScore) are blunt
  * instruments; the classifier learns which combination of the same
  * signals separates the corpora.
  *
  * Features are plain numeric columns (typically TextLib.qualityFeatures
  * output: ratios, lengths, lm_logprob) — nulls are imputed to 0.0 before
  * assembly (empty-doc ratios are null by convention; the classifier
  * should see them as the degenerate value, not crash). Training is
  * MLlib's distributed L-BFGS; scoring is a broadcast-model projection
  * (one codegen'd pass, no shuffle).
  *
  * Oracle strategy (round 6): L-BFGS coefficients depend on float
  * reduction order, but logistic regression is CONVEX — the optimum is
  * essentially unique — so the q_quality_classifier gate hard-oracles
  * LAWS instead of coefficients: all rows scored, probabilities in
  * [0, 1], positive pseudo-label separation. Property specs add the
  * planted-signal accuracy/monotonicity checks.
  */
object QualityClassifier {

  case class Model(lr: LogisticRegressionModel, features: Seq[String])

  private def assemble(df: DataFrame, features: Seq[String]): DataFrame =
    df.withColumn("__qc_f", array_to_vector(
      array(features.map(f => coalesce(col(f).cast("double"), lit(0.0))): _*)))

  /** Train on a frame with a 0/1 `labelCol` (reference = 1). Rows with a
    * NULL label are ignored — pseudoLabelByQuantile emits exactly that for
    * the ambiguous middle.
    *
    * Fails loudly unless BOTH classes are present: a tied/constant
    * pseudo-label signal can make a strict quantile cut emit only one
    * class (or none), and MLlib then fits a constant model whose
    * downstream `prob >= 0.5` gate silently keeps or deletes the ENTIRE
    * corpus. The class check is one extra tiny aggregate over the labeled
    * rows — cheap next to the fit, and the failure names the cause.
    */
  def train(df: DataFrame, labelCol: String, features: Seq[String],
            maxIter: Int = 50, regParam: Double = 0.01): Model = {
    require(features.nonEmpty, "qualityClassifier: need at least one feature column")
    val prepared = assemble(df.filter(col(labelCol).isNotNull), features)
      .withColumn("__qc_l", col(labelCol).cast("double"))
    val classes = prepared.select("__qc_l").distinct().collect().map(_.getDouble(0)).toSet
    require(classes == Set(0.0, 1.0),
      s"qualityClassifier: training needs both classes, got ${classes.toSeq.sorted.mkString("{", ",", "}")} — " +
        "a constant or heavily-tied pseudo-label signal leaves a strict quantile cut " +
        "with one class (or none); widen lo/hi or label explicitly")
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("__qc_f").setLabelCol("__qc_l")
    Model(lr.fit(prepared), features)
  }

  /** Score every row: `outCol` = P(reference-like) in [0, 1]. Operates on
    * a COPY of the model — the Param setters would otherwise mutate the
    * shared instance (rename its output columns under concurrent users).
    */
  def score(df: DataFrame, model: Model, outCol: String = "quality_prob"): DataFrame =
    model.lr.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setPredictionCol("__qc_p").setProbabilityCol("__qc_prob")
      .setRawPredictionCol("__qc_raw")
      .transform(assemble(df, model.features))
      .withColumn(outCol, element_at(vector_to_array(col("__qc_prob")), 2))
      .drop("__qc_f", "__qc_p", "__qc_prob", "__qc_raw")

  /** Persist a trained model (round 10 — the FastText-classifier
    * production shape: train once against a curated reference, gate every
    * crawl snapshot after): MLlib's own writer for the LR (path/lr) plus
    * the feature-column list (path/features), so a loaded model can never
    * silently bind to a different feature order. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.lr.write.overwrite().save(s"$path/lr")
    model.features.zipWithIndex.toDF("feature", "pos")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/features")
  }

  /** Load a model written by [[saveModel]]; scoring with it is identical
    * to the in-memory model (same coefficients, same feature order). */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val feats = spark.read.parquet(s"$path/features")
      .orderBy("pos").select("feature").collect().map(_.getString(0)).toSeq
    Model(LogisticRegressionModel.load(s"$path/lr"), feats)
  }

  /** Pseudo-labels from a ranking signal when no curated reference exists:
    * 1 above the `hi` quantile, 0 below `lo`, NULL between (train on the
    * extremes, leave the ambiguous middle out — standard practice when
    * bootstrapping a quality model from an LM score). Deliberately NOT
    * built on binQuantileGrouped: these are two arbitrary cuts with a
    * null middle, not equal-mass bands.
    *
    * Scan budget (the temperatureSample convention, documented not
    * hidden): label+train+score executes the upstream pipeline several
    * times — one percentile aggregate, the LR fit passes, one scoring
    * scan. Checkpoint/write an expensive upstream first, or persist the
    * labeled frame around train+score.
    */
  def pseudoLabelByQuantile(df: DataFrame, signalCol: String,
                            lo: Double = 0.3, hi: Double = 0.7,
                            outCol: String = "quality_label"): DataFrame = {
    require(lo > 0.0 && hi < 1.0 && lo < hi,
      s"pseudoLabelByQuantile: need 0 < lo < hi < 1, got lo=$lo hi=$hi")
    val cuts = df.agg(
      percentile(col(signalCol), lit(lo)).as("__q_lo"),
      percentile(col(signalCol), lit(hi)).as("__q_hi"))
    df.crossJoin(broadcast(cuts))
      .withColumn(outCol,
        when(col(signalCol) > col("__q_hi"), 1)
          .when(col(signalCol) < col("__q_lo"), 0))
      .drop("__q_lo", "__q_hi")
  }
}
