package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training + encoding — the tokenizer-training
  * precursor of a training-data pipeline (the reference stops at token
  * counting; real pipelines train the tokenizer on the cleaned corpus).
  *
  * Scale split follows standard practice (subword-nmt, HuggingFace
  * tokenizers): the CORPUS-sized work — word frequency counting — runs in
  * Spark (one shuffle with map-side combine, via the shared
  * `TextLib.wordCounts` tokenization), and the merge loop runs on the
  * collected word-frequency table, which is orders of magnitude smaller
  * than the corpus and capped at `maxWords` by frequency. At 100 TB the
  * corpus is scanned once; the driver holds ≤ maxWords entries.
  *
  * The merge loop is INCREMENTAL: pair statistics live in a lazy max-heap
  * (stale entries verified against the live count on pop) and each merge
  * rewrites only the words that contain the merged pair (an occurrence
  * index), not the whole vocabulary — the subword-nmt algorithm. A naive
  * recount-everything loop is O(numMerges × total symbols) driver work,
  * hours at the 1M-word / 1k-merge defaults.
  *
  * Determinism: pair selection breaks count ties lexicographically on
  * (left, right), and the word cap breaks frequency ties on the word, so
  * the same corpus always yields the same merge table. Words split into
  * UNICODE CODE POINTS (never UTF-16 code units — a lone surrogate is not
  * a valid string and round-trips through Spark as '?').
  */
object Bpe {

  /** End-of-word sentinel; distinguishes "low ". */
  val EndOfWord = "</w>"

  /** A trained model: the ordered merge table (rank, left, right, merged,
    * pair_count at selection) and the word → final-pieces map for every
    * trained word.
    */
  final case class BpeModel(merges: Seq[(Int, String, String, String, Long)],
                            pieces: Map[String, Seq[String]]) {
    /** (left, right) → rank, for replaying merges on unseen words. */
    lazy val ranks: Map[(String, String), Int] =
      merges.map { case (rank, l, r, _, _) => (l, r) -> rank }.toMap
  }

  private def codePoints(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Train `numMerges` BPE merges on the word frequencies of `textCol`.
    * Stops early when no pair reaches `minPairCount`.
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
                  maxWords: Int = 1000000, minPairCount: Long = 2L): BpeModel = {
    require(numMerges > 0, s"trainMerges: numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"trainMerges: maxWords must be positive, got $maxWords")
    val wordCounts: Array[(String, Long)] = TextLib.wordCounts(df, textCol)
      .orderBy(col("tf").desc, col("token").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val words: Array[Array[String]] =
      wordCounts.map { case (w, _) => codePoints(w) :+ EndOfWord }
    val wc: Array[Long] = wordCounts.map(_._2)

    import scala.collection.mutable
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val occur = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def addPairs(i: Int, delta: Int): Unit = {
      val syms = words(i)
      var j = 0
      while (j < syms.length - 1) {
        val k = (syms(j), syms(j + 1))
        val next = pairCounts.getOrElse(k, 0L) + delta * wc(i)
        if (next <= 0L) { pairCounts.remove(k); occur.get(k).foreach(_ -= i) }
        else {
          pairCounts.update(k, next)
          if (delta > 0) occur.getOrElseUpdate(k, mutable.BitSet.empty) += i
        }
        j += 1
      }
    }
    (words.indices).foreach(addPairs(_, 1))

    // lazy max-heap: (count desc, left asc, right asc); entries go stale
    // when counts change — verified against pairCounts on pop
    implicit val ord: Ordering[(Long, String, String)] = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2.compareTo(a._2) // smaller left = higher priority
          if (l != 0) l else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)]
    pairCounts.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }

    val merges = Vector.newBuilder[(Int, String, String, String, Long)]
    val pieceTouched = mutable.HashSet.empty[(String, String)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // pop until a live entry surfaces
      var selected: Option[(Long, String, String)] = None
      while (selected.isEmpty && heap.nonEmpty) {
        val top = heap.dequeue()
        if (pairCounts.get((top._2, top._3)).contains(top._1)) selected = Some(top)
      }
      selected match {
        case Some((c, l, r)) if c >= minPairCount =>
          val k = (l, r)
          val merged = l + r
          val affected = occur.getOrElse(k, mutable.BitSet.empty).toArray
          pieceTouched.clear()
          affected.foreach { i =>
            // track which pairs change so their fresh counts re-enter the heap
            val before = words(i)
            var j = 0; while (j < before.length - 1) { pieceTouched += ((before(j), before(j + 1))); j += 1 }
            addPairs(i, -1)
            val out = Array.newBuilder[String]
            j = 0
            while (j < before.length) {
              if (j < before.length - 1 && before(j) == l && before(j + 1) == r) {
                out += merged; j += 2
              } else { out += before(j); j += 1 }
            }
            words(i) = out.result()
            val after = words(i)
            j = 0; while (j < after.length - 1) { pieceTouched += ((after(j), after(j + 1))); j += 1 }
            addPairs(i, 1)
          }
          // every touched pair's current count gets a fresh heap entry;
          // decreased counts would otherwise never resurface (their old,
          // higher entries are stale and get skipped)
          pieceTouched.foreach { p =>
            pairCounts.get(p).foreach(cur => heap.enqueue((cur, p._1, p._2)))
          }
          merges += ((rank, l, r, merged, c))
          rank += 1
        case _ => done = true
      }
    }
    BpeModel(merges.result(), wordCounts.map(_._1).zip(words.map(_.toSeq)).toMap)
  }

  /** Merge table as a DataFrame for storage/inspection. */
  def mergesDF(df: DataFrame, textCol: String, numMerges: Int,
               maxWords: Int = 1000000, minPairCount: Long = 2L): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    trainMerges(df, textCol, numMerges, maxWords, minPairCount).merges
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Replay the merge table on one word — the real BPE encode step for
    * words outside the trained vocabulary: repeatedly merge the
    * lowest-rank adjacent pair until none applies. A word of entirely
    * novel characters falls out unchanged (code points + sentinel).
    */
  private[graft] def segmentWord(w: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Vector[String] = codePoints(w).toVector :+ EndOfWord
    var continue = syms.length > 1 && ranks.nonEmpty
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach(r => if (r < bestRank) bestRank = r)
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val (l, r) = { // re-find the pair carrying bestRank
          var found: (String, String) = null
          var j = 0
          while (found == null && j < syms.length - 1) {
            val k = (syms(j), syms(j + 1))
            if (ranks.get(k).contains(bestRank)) found = k
            j += 1
          }
          found
        }
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += (l + r); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Encode `textCol` into BPE pieces: trained words resolve through the
    * broadcast word→pieces map (one equi-join, the fast majority path);
    * words outside the trained vocabulary REPLAY the merge table
    * driver-for-driver identical to training ("lowest" segments to
    * [low, est</w>] when its merges were learned from other words, never
    * to bare characters). Adds `bpe_pieces` (array<string>, token order
    * preserved) and `bpe_len`; token-free docs get an empty array.
    * Pre-existing bpe_pieces/bpe_len columns are replaced.
    */
  def encode(df: DataFrame, textCol: String, idCol: String, model: BpeModel): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val pm = model.pieces.toSeq.toDF("__bpe_w", "__bpe_p")
    val ranksBc = sp.sparkContext.broadcast(model.ranks)
    val segment = udf((w: String) => segmentWord(w, ranksBc.value))
    // posexplode, not explode: collect_list gives no cross-shuffle order
    // guarantee — pieces must reassemble in token order
    val toks = df.select(col(idCol),
      posexplode_outer(filter(split(TextLib.normalized(col(textCol)), " "), t => t =!= ""))
        .as(Seq("__bpe_i", "__bpe_w")))
    val perDoc = toks
      .join(broadcast(pm), Seq("__bpe_w"), "left")
      .withColumn("__bpe_p",
        when(col("__bpe_w").isNull, array().cast("array<string>"))
          .otherwise(coalesce(col("__bpe_p"), segment(col("__bpe_w")))))
      .groupBy(col(idCol))
      .agg(flatten(TextLib.collectInOrder(col("__bpe_i"), col("__bpe_p"))).as("__bpe_all"))
    df.drop("bpe_pieces", "bpe_len")
      .alias("__bpe_d").join(perDoc.alias("__bpe_s"), Seq(idCol), "left")
      .withColumn("bpe_pieces", coalesce(col("__bpe_all"), array().cast("array<string>")))
      .withColumn("bpe_len", size(col("bpe_pieces")))
      .drop("__bpe_all")
  }
}
