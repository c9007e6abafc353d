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
}
