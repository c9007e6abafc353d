package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) self-join: all id pairs whose strings are within
  * Levenshtein distance `maxDist` — the near-dup primitive for SHORT keys
  * (titles, names, URLs after canonicalization) where token-set methods
  * (MinHash/SimHash, Dedup.scala) are too coarse.
  *
  * Scale shape (Gravano et al., approximate string joins, VLDB 2001): no
  * all-pairs comparison anywhere. Candidates come from an equi-join on
  * positional q-grams with three sound prefilters —
  *   - position filter: |posA − posB| ≤ k (k edits shift a gram ≤ k),
  *   - length filter:   |lenA − lenB| ≤ k,
  *   - count filter:    shared grams ≥ max(len) − q + 1 − k·q
  * — then the exact `levenshtein` verifies the survivors. Join-match
  * counting over-counts repeated grams vs the 1-1 bound, which only ADDS
  * candidates (no false negatives). Strings too short for the count bound
  * to hold (max(len) ≤ q·(k+1) − 1) pair via a 2k+1-value length-band
  * EQUI-join (no theta/BNL join), bounded by the short-string population.
  *
  * Hot grams fan out quadratically; `maxGramDf` drops grams whose document
  * frequency exceeds it (candidate loss is then possible for pairs whose
  * every shared gram is hot — default keeps the guarantee by being
  * unlimited; set it when a corpus has boilerplate-heavy keys).
  */
object Fuzzy {

  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String, maxDist: Int,
                 q: Int = 2, maxGramDf: Long = Long.MaxValue): DataFrame = {
    require(maxDist >= 1, s"fuzzyPairs: maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"fuzzyPairs: q must be >= 1, got $q")
    val k = maxDist
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
      .withColumn("__len", length(col("__s")))

    // ---- long path: positional q-grams + count filter
    val grams0 = base
      .filter(col("__len") >= q)
      .select(col("__id"), col("__len"),
        posexplode(expr(s"transform(sequence(1, length(__s) - ${q - 1}), i -> substring(__s, i, $q))"))
          .as(Seq("__pos", "__gram")))
    val grams =
      if (maxGramDf == Long.MaxValue) grams0
      else {
        val hot = grams0.groupBy("__gram").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxGramDf).select("__gram")
        grams0.join(hot, Seq("__gram"), "left_anti")
      }
    val a = grams.select(col("__id").as("__ida"), col("__len").as("__lena"),
      col("__pos").as("__posa"), col("__gram"))
    val b = grams.select(col("__id").as("__idb"), col("__len").as("__lenb"),
      col("__pos").as("__posb"), col("__gram"))
    val longCand = a.join(b, Seq("__gram"))
      .filter(col("__ida") < col("__idb") &&
        abs(col("__posa") - col("__posb")) <= k &&
        abs(col("__lena") - col("__lenb")) <= k)
      .groupBy("__ida", "__idb", "__lena", "__lenb")
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >=
        greatest(col("__lena"), col("__lenb")) - lit(q - 1) - lit(k * q))
      .select("__ida", "__idb")

    // ---- short path: the count bound degenerates (max(len) ≤ q(k+1)−1);
    // pair short strings via an exploded ±k length-band equi-join
    val short = base.filter(col("__len") <= q * (k + 1) - 1)
    val probe = short.select(col("__id").as("__ida"),
      explode(sequence(col("__len") - k, col("__len") + k)).as("__lb"))
    val shortCand = probe
      .join(short.select(col("__id").as("__idb"), col("__len").as("__lb")), Seq("__lb"))
      .filter(col("__ida") < col("__idb"))
      .select("__ida", "__idb")

    // ---- verify: exact edit distance on the deduplicated candidates
    val sById = base.select(col("__id"), col("__s"))
    longCand.unionByName(shortCand).distinct()
      .join(sById.withColumnRenamed("__id", "__ida").withColumnRenamed("__s", "__sa"), Seq("__ida"))
      .join(sById.withColumnRenamed("__id", "__idb").withColumnRenamed("__s", "__sb"), Seq("__idb"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= k)
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"), col("dist"))
  }

  /** Fuzzy value consolidation — the data-cleaning read of [[fuzzyPairs]]:
    * map each categorical value to the MOST FREQUENT value within edit
    * distance `maxDist` (ties → lexicographically smaller), leaving it
    * unchanged when it is already the local maximum. One round of
    * standardization for typo-splintered categoricals ("Marketng" →
    * "Marketing"); deliberately single-hop — a typo chain longer than
    * maxDist from its canonical needs another round, and silent transitive
    * merging is exactly how distinct real categories get glued together.
    *
    * Scale shape: everything after the groupBy runs on the DISTINCT value
    * relation (the op's contract: the column is categorical, |distinct| ≪
    * corpus); pairs come from fuzzyPairs' q-gram candidates (no all-pairs
    * scan); delivery is a broadcast map join. Nulls pass through.
    */
  def consolidateValues(df: DataFrame, c: String, maxDist: Int = 2,
                        outCol: String = null): DataFrame = {
    val out = Option(outCol).getOrElse(c)
    val vals = df.filter(col(c).isNotNull)
      .groupBy(col(c).as("__v")).agg(count(lit(1)).as("__n"))
    val pairs = fuzzyPairs(vals, "__v", "__v", maxDist)
    // neighbors in both directions, each with the neighbor's count
    val nbrs = pairs.select(col("id_a").as("__v"), col("id_b").as("__u"))
      .unionByName(pairs.select(col("id_b").as("__v"), col("id_a").as("__u")))
      .join(vals.select(col("__v").as("__u"), col("__n").as("__un")), Seq("__u"))
      .join(vals, Seq("__v"))
      // strictly better neighbors only: more frequent, or equal and smaller
      .filter(col("__un") > col("__n") ||
        (col("__un") === col("__n") && col("__u") < col("__v")))
      .groupBy(col("__v"))
      // max frequency, then lexicographically smallest: minimize (−n, u)
      .agg(min_by(col("__u"), struct((-col("__un")).as("negn"), col("__u").as("u")))
        .as("__canon"))
    df.join(broadcast(nbrs), col(c) === col("__v"), "left")
      .withColumn(out, coalesce(col("__canon"), col(c)))
      .drop("__v", "__canon")
  }
}
