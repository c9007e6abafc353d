package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * overlap a held-out evaluation suite by shared word n-grams — the
  * standard contamination check from the GPT-3 / PaLM data pipelines
  * (13-gram overlap there; `n` is a parameter here because the right value
  * tracks the tokenizer and document length).
  *
  * Scale shape — this is the one dedup-family operator with a NO-SHUFFLE
  * corpus path: an eval suite is tiny (benchmarks are MBs) while the
  * training corpus is the 100 TB side. The eval n-gram index builds once,
  * broadcasts, and the corpus probes it map-side (explode + broadcast
  * semi-join); only the matched fraction — roughly the true contamination
  * rate — reaches the per-document aggregation. The corpus itself is never
  * hash-partitioned.
  */
object Contamination {

  /** Distinct word n-grams of the eval suite with their source doc ids —
    * the contamination index. Small by construction; callers broadcast it.
    */
  def evalNgramIndex(evalDf: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    evalDf.select(col(idCol).as("eval_id"),
        explode(TextLib.shingles(col(textCol), n)).as("s"))
      .distinct()

  /** Per-training-document contamination stats: how many of the document's
    * distinct n-grams appear in the eval suite, and how many distinct eval
    * documents they hit. Only contaminated documents are returned.
    * Output: (train_id, n_hit_ngrams, n_eval_docs).
    */
  def contaminationStats(
      train: DataFrame, textCol: String, idCol: String,
      evalDf: DataFrame, evalTextCol: String, evalIdCol: String,
      n: Int = 8
  ): DataFrame = {
    val idx = broadcast(evalNgramIndex(evalDf, evalTextCol, evalIdCol, n))
    train.select(col(idCol).as("train_id"), explode(TextLib.shingles(col(textCol), n)).as("s"))
      .join(idx, Seq("s")) // broadcast hash join: corpus side stays map-local
      .groupBy("train_id")
      .agg(count_distinct(col("s")).as("n_hit_ngrams"),
        count_distinct(col("eval_id")).as("n_eval_docs"))
  }

  /** Drop contaminated documents: any training doc sharing at least
    * `minOverlap` distinct n-grams with the eval suite. The flagged-id set
    * is contamination-rate-sized, so the anti-join's right side is small
    * (AQE picks a broadcast anti-join at runtime).
    */
  def decontaminate(
      train: DataFrame, textCol: String, idCol: String,
      evalDf: DataFrame, evalTextCol: String, evalIdCol: String,
      n: Int = 8, minOverlap: Int = 1
  ): DataFrame = {
    val flagged = contaminationStats(train, textCol, idCol, evalDf, evalTextCol, evalIdCol, n)
      .filter(col("n_hit_ngrams") >= minOverlap)
      .select(col("train_id").as(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Embedding-side contamination: for each training row, the maximum cosine
    * similarity against the held-out eval suite's embeddings, plus which eval
    * row attains it — the semantic sibling of the n-gram overlap check above
    * (paraphrased eval leakage shares no 8-gram but sits at cosine ≈ 1).
    *
    * Scale shape mirrors [[contaminationStats]]: the EVAL side is the small
    * side (eval suites are thousands of rows) and rides a broadcast; the
    * training corpus crosses it map-locally (BroadcastNestedLoop over the
    * broadcast eval set — the corpus itself never shuffles raw vectors) and
    * re-aggregates per train row with partial max, so the exchange carries
    * one row per (train row, task). Corpus×corpus never happens.
    *
    * Cosine is rounded to 6dp BEFORE the argmax so the winning eval id is
    * deterministic (ties → smallest eval id, in the id's OWN ordering — ids
    * may be any orderable type: numeric, string "mmlu_00123", …; the argmin
    * is min(struct(-cos, id)), no numeric cast). Train rows with a
    * null/zero vector get null max_cos and false flag; eval rows with a
    * null id are dropped (nothing to report a hit against). Output: the
    * FULL training frame (all columns preserved, so a downstream
    * `filter NOT contaminated` pipeline step keeps working) plus max_cos,
    * nearest_eval_id, contaminated; pre-existing columns of those names
    * are replaced.
    */
  def semanticContamination(
      train: DataFrame, idCol: String, vecCol: String,
      evalDf: DataFrame, evalIdCol: String, evalVecCol: String,
      threshold: Double = 0.95
  ): DataFrame = {
    require(threshold > -1 && threshold <= 1,
      s"semanticContamination: threshold must be in (-1, 1], got $threshold")
    val ev = broadcast(evalDf.filter(col(evalIdCol).isNotNull)
      .select(col(evalIdCol).as("__eid"), col(evalVecCol).as("__ev"))
      .withColumn("__en", graft.vec.Similarity.l2Norm(col("__ev"))))
    val scored = train.select(col(idCol), col(vecCol).as("__tv"))
      // norms hoisted above the train×eval pair space: computed once per
      // row instead of once per pair (bit-identical — cosinePreNorm)
      .withColumn("__tn", graft.vec.Similarity.l2Norm(col("__tv")))
      .crossJoin(ev)
      // degenerate vectors score nothing — screened CHEAPLY before the
      // cosine exists: `isnotnull(__cos)` would re-evaluate the substituted
      // dot per pair in a filter below the projection (2x the pair-space
      // arithmetic; the SemDedup filter-on-alias lesson). Equivalent:
      // cosinePreNorm is null exactly when a norm is null (null vector /
      // null element, via dot(v,v)), the norm product is 0, or the dims
      // mismatch; NaN products compare non-equal-to-zero and stay, like
      // the NaN cosines they produce did.
      .filter(size(col("__tv")) === size(col("__ev")) &&
        (col("__tn") * col("__en")) =!= lit(0.0))
      .withColumn("__cos", round(
        graft.vec.Similarity.cosinePreNorm(col("__tv"), col("__tn"), col("__ev"), col("__en")), 6))
      .groupBy(col(idCol))
      // argmax via min(struct): -cos first (min -cos == max cos), then the
      // eval id — equal cos resolves to the SMALLEST id in its native order
      .agg(min(struct((-col("__cos")).as("nc"), col("__eid").as("i"))).as("__m"))
      .select(col(idCol), (-col("__m.nc")).as("max_cos"), col("__m.i").as("nearest_eval_id"))
    train.drop("max_cos", "nearest_eval_id", "contaminated")
      .alias("__sc_d").join(scored.alias("__sc_s"), Seq(idCol), "left")
      .withColumn("contaminated",
        coalesce(col("max_cos") >= lit(threshold), lit(false)))
  }
}
