package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — the BM25 complement of the
  * embedding-side ANN family in [[graft.vec.Similarity]]. A curation
  * pipeline uses both: ANN finds semantic neighbors, BM25 finds keyword
  * matches (eval-suite leakage probes, targeted corpus slicing, seed-set
  * expansion a la "retrieve documents matching these quality exemplars").
  *
  * Reference anchor: the reference ships text search only as row-level
  * filters (`transformations/data_cleaner.py` regex ops); ranked retrieval
  * is part of this engine's beyond-reference LLM-data surface.
  *
  * Scale shape (the inverted-index discipline, not a cartesian):
  *   - The QUERY side is tiny by contract (an eval suite / probe list) —
  *     its tokenized (query_id, term) pairs are collected to the driver
  *     and ride literals/broadcasts; the corpus never joins anything
  *     bigger than the query-term table.
  *   - The corpus tokenizes in two executing scans (both column-pruned to
  *     id+text): one "train" scan electing per-term document frequencies
  *     (aggregated over matched postings only — the `isin` filter prunes
  *     before the exchange), one scoring scan whose shuffle carries only
  *     matched (doc, term, tf) postings, never the raw token stream. A
  *     third scalar scan computes (N, Σdl) with no shuffle at all.
  *     Model stats are materialized driver-side at call time
  *     (unigramScore's convention) so the returned frame re-scans nothing
  *     twice and no session-lifetime cache is pinned.
  *   - Per-query top-k is a row_number window on the (bounded) per-query
  *     candidate set, rank-pushdown-rescued (partial top-k before the
  *     exchange).
  *
  * Determinism: scores are rounded (roundScale dp, +1e-9 boundary nudge)
  * BEFORE ranking and ties break on ascending doc id, so the result set is
  * stable across partitionings and engine float-summation orders — the
  * q_bm25 DuckDB oracle replays training and scoring end to end.
  */
object Search {

  /** Okapi BM25 (Robertson et al., TREC-3; Lucene's +1 idf form so scores
    * stay positive): per matched term,
    *   idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   score(t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    * summed over the query's distinct terms. Tokenization is the engine's
    * pinned `normalized` form (lowercase, \s+ split).
    *
    * Output: one row per (query, retrieved doc), columns = queryIdCol,
    * idCol, `bm25` (rounded score), `n_terms` (matched distinct query
    * terms), `rank` (1-based). Queries with no valid tokens return no rows.
    */
  def bm25TopK(corpus: DataFrame, textCol: String, idCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
               roundScale: Int = 6): DataFrame = {
    require(k > 0, s"bm25TopK: k must be positive, got $k")
    require(queryIdCol != idCol,
      s"bm25TopK: query id column '$queryIdCol' collides with corpus id column")
    val sp = corpus.sparkSession
    import sp.implicits._

    // query side: distinct (query_id, term), collected — the small side by
    // contract, like the broadcast eval suite in Contamination
    val qPairs = queries
      .select(col(queryIdCol), explode(split(TextLib.normalized(col(queryTextCol)), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
      .collect()
      .map(r => (r.get(0), r.getString(1)))
    require(qPairs.length <= 100000,
      s"bm25TopK: ${qPairs.length} query-term pairs — the query side must be the small side")
    val terms = qPairs.map(_._2).distinct.toSeq

    val dlCol = coalesce(graft.expr.TextCharStats(col(textCol)).getField("n_tokens"), lit(0))
    // scalar job: N and avgdl over ALL docs (null/empty text counts dl 0)
    val (nDocs, avgdl) = {
      val r = corpus.agg(count(lit(1)), sum(dlCol.cast("long"))).first()
      val n = r.getLong(0)
      (n, if (n == 0) 1.0 else Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L).toDouble / n)
    }

    def matchedTf(d: DataFrame): DataFrame = d
      .select(col(idCol), dlCol.as("__dl"),
        explode(split(TextLib.normalized(col(textCol)), " ")).as("token"))
      .filter(col("token") =!= "" && col("token").isin(terms: _*))
      .groupBy(col(idCol), col("__dl"), col("token"))
      .agg(count(lit(1)).as("__tf"))

    // train job: per-term df over matched postings, idf computed on the
    // driver with the same Math.log Spark's log() evaluates
    val dfByTerm = matchedTf(corpus).groupBy("token").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idfRows: Seq[(String, Double)] = terms.flatMap { t =>
      dfByTerm.get(t).map(df =>
        (t, math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))))
    }
    // a term absent from the corpus has no postings and simply contributes
    // nothing; a query whose every term is absent yields no rows
    val idfDf = idfRows.toDF("token", "__idf")
    // the (query_id, term) pair frame keeps the query-id column's ORIGINAL
    // type by deriving from the (tiny) query frame itself
    val qTerms = queries
      .select(col(queryIdCol), explode(split(TextLib.normalized(col(queryTextCol)), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()

    val tfD = col("__tf").cast("double")
    val dlD = col("__dl").cast("double")
    val perTerm = col("__idf") * (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + (lit(b) * dlD) / lit(avgdl)))

    val scored = matchedTf(corpus)
      .join(broadcast(idfDf), Seq("token"))
      .join(broadcast(qTerms), Seq("token"))
      .withColumn("__s", perTerm)
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("__s")) + lit(1e-9), roundScale).as("bm25"),
        count(lit(1)).as("n_terms"))

    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("bm25").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("bm25"), col("n_terms"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: given ranked result lists
    * from different retrievers over the same (query, doc) space (e.g.
    * [[bm25TopK]] lexical + [[graft.vec.Similarity.lshTopK]] semantic),
    * score every candidate Σ_lists 1/(kRrf + rank) and re-rank. Score
    * magnitudes of the input retrievers never mix — only their RANKS do —
    * which is the whole point (BM25 scores and cosines are not
    * commensurable).
    *
    * Scale shape: a union of per-query candidate lists (each already
    * top-k-bounded by its retriever) + one map-side-combined aggregate on
    * (query, doc) + a rank-pushdown per-query window. Nothing corpus-sized
    * appears here at all. Determinism: RRF scores are sums of exact
    * double reciprocals of small integers computed in one aggregate
    * (addition order over ≤ |lists| values; rounded before ranking), ties
    * break on ascending doc id.
    *
    * Inputs must carry (queryIdCol, idCol, rankCol); rows with null rank
    * are ignored. Output: (queryIdCol, idCol, rrf_score, rank).
    */
  def rrfFuse(lists: Seq[DataFrame], queryIdCol: String, idCol: String,
              rankCol: String = "rank", kRrf: Int = 60, k: Int = 10,
              roundScale: Int = 6): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    require(kRrf > 0, s"rrfFuse: kRrf must be positive, got $kRrf")
    require(k > 0, s"rrfFuse: k must be positive, got $k")
    val slim = lists.map(_.select(col(queryIdCol), col(idCol), col(rankCol).cast("long").as("__r"))
      .filter(col("__r").isNotNull))
    val unioned = slim.reduce(_.unionByName(_))
    val scored = unioned
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(lit(1.0) / (lit(kRrf.toDouble) + col("__r"))) + lit(1e-9), roundScale)
        .as("rrf_score"),
        count(lit(1)).as("__n_lists"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rrf_score"), col("rank"))
  }
}
