package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-training precursor of
  * a training-data pipeline (the reference stops at token counting; real
  * pipelines train the tokenizer on the cleaned corpus).
  *
  * Scale split follows standard practice (subword-nmt, HuggingFace
  * tokenizers): the CORPUS-sized work — word frequency counting — runs in
  * Spark (one shuffle with map-side combine), and the merge loop runs on
  * the collected word-frequency table, which is orders of magnitude
  * smaller than the corpus and capped at `maxWords` by frequency. At
  * 100 TB the corpus is scanned once; the driver holds ≤ maxWords entries.
  *
  * Determinism: pair selection breaks count ties lexicographically on
  * (left, right), and the word cap breaks frequency ties on the word, so
  * the same corpus always yields the same merge table.
  */
object Bpe {

  /** End-of-word sentinel; distinguishes "low ". */
  val EndOfWord = "</w>"

  /** Train `numMerges` BPE merges on the word frequencies of `textCol`.
    * Returns (merges, wordPieces):
    *  - merges: (rank, left, right, merged, pair_count) — the ordered rule
    *    table an encoder replays;
    *  - wordPieces: word → final piece sequence for every trained word
    *    (the broadcastable application map `encode` uses).
    * Stops early when no pair reaches `minPairCount`.
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
                  maxWords: Int = 1000000, minPairCount: Long = 2L)
      : (Seq[(Int, String, String, String, Long)], Map[String, Seq[String]]) = {
    require(numMerges > 0, s"trainMerges: numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"trainMerges: maxWords must be positive, got $maxWords")
    val wordCounts: Array[(String, Long)] = df
      .select(explode(split(TextLib.normalized(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // word → symbol sequence (code points + end-of-word sentinel)
    var pieces: Array[(Vector[String], Long)] = wordCounts.map { case (w, c) =>
      (w.toSeq.map(_.toString).toVector :+ EndOfWord, c)
    }
    val merges = Vector.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      pieces.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      // max by count, ties by (left, right) ascending — deterministic
      val best = pairCounts.reduceOption[((String, String), Long)] {
        case (a @ ((al, ar), ac), b @ ((bl, br), bc)) =>
          if (ac > bc) a
          else if (bc > ac) b
          else if (al < bl || (al == bl && ar <= br)) a else b
      }
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          val merged = l + r
          pieces = pieces.map { case (syms, wc) =>
            if (syms.length < 2) (syms, wc)
            else {
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                  out += merged; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.result(), wc)
            }
          }
          merges += ((rank, l, r, merged, c))
          rank += 1
        case _ => continue = false
      }
    }
    val pieceMap = wordCounts.map(_._1).zip(pieces.map(_._1.toSeq)).toMap
    (merges.result(), pieceMap)
  }

  /** Merge table as a DataFrame for storage/inspection. */
  def mergesDF(df: DataFrame, textCol: String, numMerges: Int,
               maxWords: Int = 1000000, minPairCount: Long = 2L): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    trainMerges(df, textCol, numMerges, maxWords, minPairCount)._1
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Encode `textCol` into BPE pieces using a trained word→pieces map:
    * known words resolve through the broadcast map (one equi-join), words
    * outside the trained vocabulary fall back to code points + sentinel —
    * exactly what replaying the merge rules on an unseen word of novel
    * characters yields with no applicable merge. Adds `bpe_pieces`
    * (array<string>, token order preserved) and `bpe_len`; token-free
    * docs get an empty array. Pre-existing bpe_pieces/bpe_len columns are
    * replaced.
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             pieceMap: Map[String, Seq[String]]): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val pm = pieceMap.toSeq.toDF("__bpe_w", "__bpe_p")
    // posexplode, not explode: collect_list gives no cross-shuffle order
    // guarantee — pieces must reassemble in token order
    val toks = df.select(col(idCol),
      posexplode_outer(filter(split(TextLib.normalized(col(textCol)), " "), t => t =!= ""))
        .as(Seq("__bpe_i", "__bpe_w")))
    val perDoc = toks
      .join(broadcast(pm), Seq("__bpe_w"), "left")
      .withColumn("__bpe_p",
        when(col("__bpe_w").isNull, array().cast("array<string>"))
          .otherwise(coalesce(col("__bpe_p"),
            concat(split(col("__bpe_w"), ""), array(lit(EndOfWord))))))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__bpe_i"), col("__bpe_p")))),
        s => s.getField("__bpe_p"))).as("__bpe_all"))
    df.drop("bpe_pieces", "bpe_len")
      .alias("__bpe_d").join(perDoc.alias("__bpe_s"), Seq(idCol), "left")
      .withColumn("bpe_pieces", coalesce(col("__bpe_all"), array().cast("array<string>")))
      .withColumn("bpe_len", size(col("bpe_pieces")))
      .drop("__bpe_all")
  }
}
