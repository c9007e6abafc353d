package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skew and layout tools for the 100 TB posture: salted aggregation/join for
  * hot keys, bucketed table layout for shuffle-free repeated joins. AQE's
  * skew-join handling covers sort-merge joins automatically; these are for
  * the cases AQE can't fix (skewed aggregation keys, reused join layouts).
  */
object Scale {

  /** Two-phase salted aggregation for skewed group keys: partial-aggregate on
    * (keys, salt) — spreading each hot key over `saltBuckets` reducers — then
    * final-aggregate on keys. Caller supplies re-aggregable functions
    * (sum/count/min/max; avg = sum+count then divide).
    *
    * Salt is `pmod(hash(all cols), buckets)` — deterministic, uniform, no
    * rand() (which would break retries/speculation).
    */
  def aggregateSalted(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[(String, String)], // (column, sum|count|min|max)
      saltBuckets: Int = 16
  ): DataFrame = {
    val salt = pmod(hash(df.columns.map(col): _*), lit(saltBuckets)).as("__salt")
    val partialExprs = aggs.map { case (c, fn) =>
      (fn match {
        case "sum"   => sum(col(c))
        case "count" => count(col(c))
        case "min"   => min(col(c))
        case "max"   => max(col(c))
        case other   => throw new IllegalArgumentException(s"non-reaggregable fn: $other")
      }).as(s"__p_${c}_$fn")
    }
    val finalExprs = aggs.map { case (c, fn) =>
      (fn match {
        case "sum" | "count" => sum(col(s"__p_${c}_$fn"))
        case "min"           => min(col(s"__p_${c}_$fn"))
        case "max"           => max(col(s"__p_${c}_$fn"))
      }).as(s"${c}_$fn")
    }
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalExprs.head, finalExprs.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left rows get a deterministic salt in [0, n); the right side is
    * replicated n× with every salt value; join on (keys :+ salt). Each hot
    * left key now spreads over n tasks. Right-side blowup = n× — size
    * accordingly (or broadcast and skip salting entirely).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16,
      joinType: String = "inner"
  ): DataFrame = {
    // Replicating the right side n× is only sound when unmatched right rows
    // never surface: right/full outer would emit each unmatched right row
    // n times, and right_semi/anti would change semantics entirely.
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports only left-payload join types ${allowed.mkString("/")}, got '$joinType'")
    val l = left.withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(saltBuckets)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Write a table bucketed+sorted on join keys (Spark bucketing: repeated
    * joins/aggregations on the bucket keys skip the shuffle entirely —
    * `spark.sql.sources.bucketing.enabled`). Requires saveAsTable (bucket
    * metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — plans with zero
    * Exchange when bucket layouts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Per-op salt decorrelation (mixtureSample's pattern), applied to EVERY
    * default hash gate in this object: two gate-based ops chained on the
    * SAME key must not read the same buckets — e.g. sample_by_hash followed
    * by sample_to_budget would otherwise produce fully nested keep sets,
    * and sample_temperature followed by assign_split would put every
    * survivor of a frac-downsampled group below the train threshold and
    * silently starve val/test. Callers passing an explicit `gate` own
    * their own decorrelation.
    */
  private def opSalt(op: String, salt: Int): Int =
    salt ^ scala.util.hashing.MurmurHash3.stringHash(op)

  /** Deterministic hash-gate sampling: keep rows where
    * xxhash64(key, op-salt) lands in the lowest `fraction` slice of the
    * hash space. Unlike `df.sample` (per-partition RNG seeded by partition
    * id, so the kept set changes under repartitioning/retries), the decision
    * is a pure function of the KEY — the same document always lands the
    * same way across reruns, incremental loads, and speculative tasks;
    * and the gate is a map-local filter pushed at the scan, no shuffle.
    */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double, salt: Int = 42): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol), lit(opSalt("sample_by_hash", salt))), lit(buckets)) <
      lit(math.round(fraction * buckets)))
  }

  /** Budget-weighted per-group sampling: keep a deterministic hash-gated
    * subset of each group sized so the kept rows total ≈ `budget` weight
    * (tokens, chars, bytes) — the "N billion tokens per domain" step of a
    * mixture recipe, where quotas are token budgets, not row counts.
    *
    * frac_g = min(1, budget / Σ weight_g); a row survives iff its hash
    * bucket (of 1e6) falls below floor(frac_g × 1e6) — the same pure-
    * function-of-the-key gate as sampleByHash, so the kept set is stable
    * under repartitioning, retries, and incremental reruns. Groups under
    * budget keep everything. Expected kept weight = frac_g × Σ weight_g
    * (hash is independent of weight); exact-budget packing needs the
    * ordered quota ops instead.
    *
    * Scale shape: one aggregate for the per-group totals (map-side
    * combine, |groups| rows), broadcast back onto the corpus — the corpus
    * itself is never shuffled. Rows with a NULL group drop out (inner
    * join); rows with a NULL weight count as ZERO weight toward the group
    * total but still pass/fail the hash gate like any other row — filter
    * or fill weights first if they should be excluded.
    *
    * `gate` overrides the default xxhash64 bucket (e.g. an md5-derived
    * bucket when an external system must re-derive the kept set).
    */
  def sampleToBudget(
      df: DataFrame,
      weightCol: String,
      groupCol: String,
      keyCol: String,
      budget: Long,
      salt: Int = 42,
      gate: Option[Column] = None
  ): DataFrame = {
    require(budget > 0, s"sampleToBudget: budget must be positive, got $budget")
    val bucket = gate.getOrElse(
      pmod(xxhash64(col(keyCol), lit(opSalt("sample_to_budget", salt))), lit(1000000L)))
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).cast("double").as("__gw"))
    // floor(frac*1e6) is the PINNED threshold formulation (cross-engine:
    // a bare double→int cast rounds in DuckDB but truncates in Spark)
    val thresh = floor(least(lit(1.0), lit(budget.toDouble) / col("__gw")) * lit(1000000.0))
    df.alias("__sb_d")
      .join(broadcast(totals).alias("__sb_t"), Seq(groupCol))
      .filter(bucket < thresh)
      .drop("__gw")
  }

  /** Temperature-based mixture reweighting — the mT5/PaLM "alpha sampling"
    * recipe: keep fractions derived from group sizes so the kept mixture
    * follows p_g ∝ n_g^alpha, scaled to ≈`totalRows` kept rows overall.
    * alpha = 1 keeps source proportions (a uniform totalRows/N gate);
    * alpha → 0 flattens toward uniform across groups; alpha in (0, 1) is
    * the standard low-resource-upsampling compromise. This operator only
    * DROPS rows (target_g caps at n_g) — repeating data to upsample is an
    * explicit separate step, never an implicit one.
    *
    * target_g = totalRows · n_g^alpha / Σ n^alpha; frac_g = target_g/n_g;
    * a row survives iff its hash bucket (of 1e6) < floor(frac_g·1e6+1e-6).
    * The same pure-function-of-the-key gate as sampleByHash — stable under
    * repartitioning, retries, incremental reruns; `gate` overrides the
    * default xxhash64 bucket (e.g. md5-derived for cross-engine
    * derivability). The 1e-6 nudge inside floor pins the threshold against
    * ±ulp drift in the pow/sum chain (Σ n^alpha is accumulated on the
    * driver in sorted group order, so it is ALSO run-to-run deterministic;
    * a distributed float sum would not be).
    *
    * Scale shape: one map-side-combined count aggregate, collected —
    * |groups| rows, driver-sized by definition for a mixture recipe — and
    * the per-group THRESHOLD delivered back by a broadcast null-safe
    * equi-join (sampleToBudget's shape); the corpus itself never shuffles.
    * Only the Σ n^alpha normalizer needs the driver (a deterministic
    * sorted fold), so the driver round-trip carries |groups| longs — a
    * when-chain of group literals would instead grow the Catalyst tree
    * linearly with |groups| and blow up analysis on a high-cardinality
    * group column (100k domains = a 100k-node expression). Kept counts are
    * hash-binomial around frac_g·n_g; exact counts need quotaPerGroup.
    * NULL groups form their own group (the join is null-safe).
    */
  def temperatureSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      alpha: Double,
      totalRows: Long,
      salt: Int = 42,
      gate: Option[Column] = None
  ): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"temperatureSample: alpha must be in [0,1], got $alpha")
    require(totalRows > 0, s"temperatureSample: totalRows must be positive, got $totalRows")
    // The input is scanned twice — eagerly here for the sizes, again by
    // the returned filter — the same double-scan trade every
    // scalar-broadcast op makes (sampleToBudget, unigramScore's scoring
    // pass). It is deliberately not persisted: the input is corpus-sized.
    // Checkpoint/write expensive upstream pipelines first.
    val sizes = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__tsn"))
      .collect()
      .map(r => (r.get(0), r.getLong(1)))
      // null sorts apart from a real "" group — a collision would make the
      // fold order of those two weights depend on collect() partition order
      .sortBy { case (g, _) => (g == null, if (g == null) "" else g.toString) }
    val weights = sizes.map { case (g, n) => (g, n, math.pow(n.toDouble, alpha)) }
    val tot = weights.foldLeft(0.0)(_ + _._3) // sorted order → deterministic
    // thresholds computed on the driver with the SAME double ops the old
    // in-plan floor(frac*1e6 + 1e-6) evaluated (IEEE mul/add/floor — bit-
    // identical), so pinned oracles are unchanged
    val threshRows = weights.map { case (g, n, w) =>
      val frac = math.min(1.0, totalRows.toDouble * w / tot / n.toDouble)
      org.apache.spark.sql.Row(g, math.floor(frac * 1000000.0 + 1e-6).toLong)
    }
    val spark = df.sparkSession
    val threshSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__tsg", df.schema(groupCol).dataType),
      org.apache.spark.sql.types.StructField("__tsthr", org.apache.spark.sql.types.LongType)))
    val thresh = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(threshRows: _*)), threshSchema)
    val bucket = gate.getOrElse(
      pmod(xxhash64(col(keyCol), lit(opSalt("sample_temperature", salt))), lit(1000000L)))
    // inner join is total: every group in df appears in `thresh` (it was
    // computed from df); <=> routes NULL-group rows to their own threshold
    df.join(broadcast(thresh), col(groupCol) <=> col("__tsg"), "inner")
      .filter(bucket < col("__tsthr"))
      .drop("__tsg", "__tsthr")
  }

  /** Deterministic train/validation/test assignment: label each row by
    * which cumulative hash-bucket band its key falls in — the split is a
    * pure function of the key (stable under repartitioning, reruns, and
    * incremental appends: a document NEVER migrates between splits when
    * the corpus grows, which a random split cannot guarantee). Weights
    * must sum to ≤ 1 + 1e-9; any remainder is labeled null (an explicit
    * holdout). Thresholds are pinned as floor(cum·1e6 + 1e-6) — same
    * formulation as temperatureSample, cross-engine derivable via `gate`.
    *
    * Row-local (no shuffle, no aggregate): the corpus is never touched
    * beyond the one projection.
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: Int = 42,
      outCol: String = "split",
      gate: Option[Column] = None
  ): DataFrame = {
    require(splits.nonEmpty, "assignSplit: need at least one (label, weight)")
    require(splits.forall(_._2 > 0.0), s"assignSplit: weights must be positive, got $splits")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"assignSplit: weights sum to ${splits.map(_._2).sum} > 1")
    val bucket = gate.getOrElse(
      pmod(xxhash64(col(keyCol), lit(opSalt("assign_split", salt))), lit(1000000L)))
    // cumulative thresholds accumulate left-to-right on the driver —
    // deterministic. A chained when gives first-match semantics in a
    // LINEAR expression tree (embedding the accumulator in an otherwise()
    // doubles the tree per band — 2^|splits| nodes)
    val (labelCol, _) = splits.foldLeft((Option.empty[Column], 0.0)) {
      case ((acc, cum), (label, w)) =>
        val hi = cum + w
        val cond = bucket < floor(lit(hi) * lit(1000000.0) + lit(1e-6))
        val next = acc match {
          case None    => when(cond, lit(label))
          case Some(c) => c.when(cond, lit(label))
        }
        (Some(next), hi)
    }
    df.withColumn(outCol, labelCol.get)
  }

  /** LEAKAGE-SAFE split assignment: every member of a duplicate cluster
    * lands in the SAME split. Hash-splitting on the document id — the
    * industry default [[assignSplit]] implements — quietly leaks eval
    * into train whenever the corpus still contains duplicates or
    * near-duplicates of a held-out document (the contamination channel
    * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", measure on standard benchmarks). The fix is structural:
    * gate on the CLUSTER id (component-min id), not the row id, so a
    * whole duplicate family moves between splits as one unit.
    *
    * `clusters` = (id, cluster_id) labels — [[graft.text.Dedup]]'s
    * clusterCandidates output, an exactDupMap rename, or semantic groups
    * alike; rows absent from it are singletons gated on their own id
    * (consistent: a component-min labeling maps every survivor to
    * itself). Proportions are therefore over CLUSTERS, the only
    * leakage-safe allocation; they converge to row proportions as
    * duplicate mass thins.
    *
    * `gateOf` maps the resolved cluster key to a bucket in [0, 1e6) —
    * callers that need cross-engine replay pass an md5-derived gate (the
    * [[assignSplit]] gate convention); None uses the salted xxhash64
    * default.
    *
    * Scale shape: one id-keyed left join (the cluster frame is duplicate
    * mass, usually broadcast-small) + [[assignSplit]]'s pure-map gate;
    * the corpus never shuffles on the cluster key.
    */
  def assignSplitLeakageSafe(
      df: DataFrame,
      idCol: String,
      clusters: DataFrame,
      splits: Seq[(String, Double)],
      salt: Int = 42,
      outCol: String = "split",
      gateOf: Option[Column => Column] = None
  ): DataFrame = {
    val lab = clusters.select(col("id").as(idCol), col("cluster_id").as("__ls_key"))
    val keyed = df.join(lab, Seq(idCol), "left")
      .withColumn("__ls_key", coalesce(col("__ls_key"), col(idCol)))
    assignSplit(keyed, "__ls_key", splits, salt, outCol,
      gate = gateOf.map(g => g(col("__ls_key"))))
      .drop("__ls_key")
  }

  /** Epoch-style data repetition — the explicit UPSAMPLING complement of
    * temperatureSample's drop-only stance: each group is repeated
    * `epochs(group)` times, fractional epochs resolved per row by the
    * deterministic hash gate (epochs = 2.25 → every row appears twice,
    * and the stable 25% of keys under the gate appear a third time).
    * "4 epochs of books, 1 of web, 0.5 of forums" is the standard
    * pretraining-mixture recipe this implements.
    *
    * Adds `epoch` (1-based copy index) — downstream sharding should
    * include it in the order key so copies spread across shards. Groups
    * absent from `epochs` default to 1 (kept once); 0 drops a group.
    *
    * Row-local: the copy count is a pure function of (group, key), the
    * explode multiplies rows in place — no shuffle, no aggregate, stable
    * under repartitioning and reruns.
    */
  def repeatEpochs(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      epochs: Map[String, Double],
      salt: Int = 42,
      gate: Option[Column] = None
  ): DataFrame = {
    require(epochs.values.forall(_ >= 0.0),
      s"repeatEpochs: epoch counts must be >= 0, got $epochs")
    val bucket = gate.getOrElse(
      pmod(xxhash64(col(keyCol), lit(opSalt("repeat_epochs", salt))), lit(1000000L)))
    // per-group copy count = floor(e) + (bucket < floor(frac(e)·1e6 + 1e-6))
    val copies = epochs.toSeq.sortBy(_._1).foldLeft(lit(1).cast("int")) {
      case (acc, (g, e)) =>
        val base = math.floor(e).toInt
        val fracThresh = math.floor((e - base) * 1000000.0 + 1e-6)
        val c = lit(base) + when(bucket < lit(fracThresh), 1).otherwise(0)
        when(col(groupCol) === lit(g), c).otherwise(acc)
    }
    df.withColumn("__re_n", copies)
      .filter(col("__re_n") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__re_n"))))
      .drop("__re_n")
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual Pretraining",
    * ICLR 2023): split a total training `budget` (in `weightCol`
    * units — chars/tokens) across groups by WATER-FILLING under a per-group
    * repetition cap of `maxEpochs` epochs. Every group would ideally get an
    * equal share; a group whose entire corpus repeated `maxEpochs` times
    * still undershoots that share is CAPPED at cap_g = ⌊n_g·maxEpochs⌋ and
    * its unused share is re-leveled across the rest. Temperature sampling
    * (the mT5 recipe, [[temperatureSample]]) fixes the mixture by corpus
    * SIZE — UniMax instead bounds per-document repetition, which is the
    * quantity that actually degrades models (the paper's argument).
    *
    * Closed form instead of an iterative loop: with groups sorted by
    * ascending cap, the capped set is exactly a PREFIX — group j caps iff
    * cap_j·(L−j+1) ≤ budget − Σ_{i<j} cap_i, and once that test fails for
    * the smallest remaining cap it provably fails for every later one
    * (level_{j+1} = (level_j·(L−j) − cap_j)/(L−j−1) < level_j < cap_j ≤
    * cap_{j+1}), so the flag computes per-row from prefix sums alone. All
    * waterfall arithmetic is INTEGER (caps floor to longs; the prefix-sum
    * test promotes to decimal(38,0) so cap·remaining cannot overflow at
    * 100 TB weights) — bit-exact in any engine, which is what lets a plain
    * SQL oracle replay the allocation. Only the final level division is a
    * double.
    *
    * Returns one row per group: group, `group_weight` (Σ weightCol),
    * `cap`, `capped`, `allocation` (weight units granted), and `epochs`
    * (= allocation/weight — ≤ maxEpochs by construction; feed to
    * [[unimaxSample]] or [[repeatEpochs]]). If budget ≥ Σ cap every group
    * caps and the surplus is deliberately left unallocated (spending it
    * would exceed the epoch bound — the whole point of the method).
    *
    * Scale shape: one map-side-combined aggregate to |groups| rows, then
    * ONE global-sort window chain over that |groups|-row frame — bounded
    * by definition for a mixture recipe (languages/domains/sources), the
    * same allowance class as q_funnel's k-row window. The corpus is
    * scanned once and never shuffled.
    */
  def unimaxAllocation(
      df: DataFrame,
      groupCol: String,
      weightCol: String,
      budget: Long,
      maxEpochs: Double
  ): DataFrame = {
    require(budget > 0, s"unimaxAllocation: budget must be positive, got $budget")
    require(maxEpochs > 0, s"unimaxAllocation: maxEpochs must be positive, got $maxEpochs")
    // fail fast at submit: cap = ⌊w·E⌋ is computed in one double multiply;
    // with E ≤ 2^20 (any real epoch bound is single digits) a 100 TB char
    // weight (~1e14) keeps w·E < 2^50 — inside both the double-exact
    // integer range (2^53) and Long range, so the ANSI cast can't throw
    // mid-job and the bit-exact-oracle claim holds. An absurd E (e.g. a
    // units mix-up passing a budget as epochs) is a misconfiguration.
    require(maxEpochs <= (1 << 20),
      s"unimaxAllocation: maxEpochs must be ≤ 2^20 (got $maxEpochs) — " +
        "caps are computed as floor(group_weight * maxEpochs) in double, " +
        "which loses integer exactness past 2^53 and overflows Long past 2^63")
    import org.apache.spark.sql.expressions.Window
    // all-NULL weights coalesce to 0: such a group must cap at 0 and absorb
    // nothing — a NULL group_weight would make `capped` NULL, fall into the
    // uncapped branch, and silently steal a level share from real groups
    // (round-10 review catch, probe-confirmed)
    val sizes = df.groupBy(col(groupCol))
      .agg(coalesce(sum(col(weightCol)), lit(0L)).cast("long").as("group_weight"))
      // ⌊n·E + 1e-6⌋: the house pinned-floor formulation (the nudge absorbs
      // ±ulp in the one double multiply so both engines land the same long)
      .withColumn("cap",
        floor(col("group_weight").cast("double") * lit(maxEpochs) + lit(1e-6)).cast("long"))
    val w = Window.orderBy(col("cap"), col(groupCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sizes
      .withColumn("__idx", row_number().over(w))
      .withColumn("__cum", coalesce(sum(col("cap")).over(wPrev), lit(0L)))
      .withColumn("__l", count(lit(1)).over(wAll))
      // decimal(38,0): cap·remaining at 100 TB char weights overflows a long
      .withColumn("capped",
        col("cap").cast("decimal(38,0)") * (col("__l") - col("__idx") + 1).cast("decimal(38,0)")
          <= (lit(budget) - col("__cum")).cast("decimal(38,0)"))
      .withColumn("__spent", coalesce(sum(when(col("capped"), col("cap"))).over(wAll), lit(0L)))
      .withColumn("__ncap", sum(when(col("capped"), 1L).otherwise(0L)).over(wAll))
      .withColumn("allocation",
        when(col("capped"), col("cap").cast("double"))
          .otherwise((lit(budget) - col("__spent")).cast("double") /
            (col("__l") - col("__ncap")).cast("double")))
      // zero-weight groups define epochs = 0.0 (allocation is 0 by the cap);
      // the bare division would DIVIDE_BY_ZERO under Spark 4's default ANSI
      // mode (round-10 review catch, probe-confirmed)
      .withColumn("epochs",
        coalesce(col("allocation") / nullif(col("group_weight").cast("double"), lit(0.0)),
          lit(0.0)))
      .drop("__idx", "__cum", "__l", "__spent", "__ncap")
  }

  /** Materialize a UniMax mixture: repeat each group's rows `epochs_g`
    * times (from [[unimaxAllocation]]), the fractional part resolved per
    * row by the deterministic hash gate — [[repeatEpochs]]' copy rule with
    * the epoch map coming from the allocation instead of the operator's
    * when-chain, delivered by a broadcast join so a 100k-domain recipe
    * costs a join, not a 100k-node expression tree. Adds `epoch` (1-based
    * copy index); epochs ≤ maxEpochs bounds the blow-up by construction.
    * NULL groups join null-safely to their own allocation row.
    *
    * NOTE this fused form evaluates `df` TWICE when uncached — once
    * aggregated for the allocation, once as the join probe side — i.e.
    * two full corpus scans per run. For a large corpus either persist
    * `df` first or use the fit/apply split ([[unimaxAllocation]] saved to
    * parquet, then [[unimaxApply]]), which scans the corpus once per job.
    */
  def unimaxSample(
      df: DataFrame,
      groupCol: String,
      weightCol: String,
      keyCol: String,
      budget: Long,
      maxEpochs: Double,
      salt: Int = 42,
      gate: Option[Column] = None
  ): DataFrame =
    unimaxApply(df, unimaxAllocation(df, groupCol, weightCol, budget, maxEpochs),
      groupCol, keyCol, salt, gate)

  /** Materialize a mixture against a FROZEN allocation frame (any frame
    * with `groupCol` + `epochs`, usually [[unimaxAllocation]]'s output
    * persisted as parquet) — the apply half of the fit/apply split, same
    * production shape as the DSIR/CCNet gates: allocate ONCE on the
    * reference corpus, then every later job — batch or a STREAMING ingest
    * (the repeat rule is a stateless join + explode, so it composes into
    * `readStream → unimaxApply`) — repeats rows per the frozen epochs.
    * Groups absent from the allocation are dropped (no epochs = no
    * budget); NULL groups join null-safely to their own row.
    */
  def unimaxApply(
      df: DataFrame,
      allocation: DataFrame,
      groupCol: String,
      keyCol: String,
      salt: Int = 42,
      gate: Option[Column] = None
  ): DataFrame = {
    require(allocation.columns.contains("epochs"),
      s"unimaxApply: allocation frame needs an `epochs` column, has ${allocation.columns.toSeq}")
    val alloc = allocation
      .select(col(groupCol).as("__ux_g"),
        floor(col("epochs")).cast("int").as("__ux_base"),
        // per-key copy count = base + (bucket < ⌊frac·1e6 + 1e-6⌋)
        floor((col("epochs") - floor(col("epochs"))) * lit(1000000.0) + lit(1e-6))
          .cast("long").as("__ux_fthr"))
    val bucket = gate.getOrElse(
      pmod(xxhash64(col(keyCol), lit(opSalt("unimax_sample", salt))), lit(1000000L)))
    df.join(broadcast(alloc), col(groupCol) <=> col("__ux_g"), "inner")
      .withColumn("__ux_n", col("__ux_base") + when(bucket < col("__ux_fthr"), 1).otherwise(0))
      .filter(col("__ux_n") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__ux_n"))))
      .drop("__ux_g", "__ux_base", "__ux_fthr", "__ux_n")
  }

  /** Weighted corpus mixture: union of hash-gate samples of each source at
    * its target rate, tagged with a `mixture_source` lineage column — the
    * "30% web, 30% code, 40% books" recipe step of a training-data
    * pipeline. Per-source salts decorrelate the gates, so a key kept in
    * one source implies nothing about its fate in another.
    */
  def mixtureSample(sources: Seq[(String, DataFrame, Double)], keyCol: String,
                    salt: Int = 42): DataFrame = {
    require(sources.nonEmpty, "mixtureSample needs at least one (name, df, fraction) source")
    sources.map { case (name, d, f) =>
      sampleByHash(d, keyCol, f, salt ^ scala.util.hashing.MurmurHash3.stringHash(name))
        .withColumn("mixture_source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Blocklist exclusion with a Bloom prefilter — the 100 TB shape for
    * "drop every document whose key appears in a known-bad list":
    * a plain left_anti join shuffles the FULL corpus on the key; here a
    * Bloom filter over the blocklist (built distributed with Spark's own
    * BloomFilterAggregate, a few MB of bits) is evaluated row-local, so only
    * the tiny might-match fraction (true matches + fpp of the corpus) pays
    * the exact anti-join. No false drops: bloom-negative rows are provably
    * clean, bloom-positive rows are re-checked exactly.
    */
  /** @param expectedDistinct sizes the bloom; pass the (approximate) count
    *   of distinct blocklist keys if known to skip the estimation scan —
    *   otherwise one approx_count_distinct pass computes it.
    */
  def excludeKeysBloom(
      df: DataFrame,
      keyCol: String,
      blocklist: DataFrame,
      blockKeyCol: String,
      fpp: Double = 0.01,
      expectedDistinct: Long = -1L
  ): DataFrame = {
    // the hash probe is TYPE-strict (xxhash64("123") != xxhash64(123)) while
    // the anti-join it fronts would coerce — a dtype mismatch would silently
    // route blocked rows down the "provably clean" path. Fail loudly instead.
    require(df.schema(keyCol).dataType == blocklist.schema(blockKeyCol).dataType,
      s"excludeKeysBloom: key dtypes must match exactly (corpus $keyCol is " +
      s"${df.schema(keyCol).dataType.simpleString}, blocklist $blockKeyCol is " +
      s"${blocklist.schema(blockKeyCol).dataType.simpleString}) — cast one side first")
    val bytes = bloomBytes(blocklist, blockKeyCol, fpp, expectedDistinct)
    val might = mightContainCol(bytes, col(keyCol))
    val clean = df.filter(!might)
    val suspect = df.filter(might)
      .join(blocklist.select(col(blockKeyCol).as(keyCol)).distinct(), Seq(keyCol), "left_anti")
    clean.unionByName(suspect)
  }

  /** Distributed Bloom-sketch build over a key column, returned as the
    * serialized bitset `BloomFilterMightContain` deserializes.
    *
    * Built with a treeAggregate over the sketch-library BloomFilter (same
    * implementation class the probe expression uses, so bit layout and
    * hashing match putLong-for-putLong). NOT BloomFilterAggregate: that
    * aggregate silently Math.min-clamps items/numBits against the
    * session-global runtime-bloom confs (default 4M items / 64M bits) —
    * working around it by mutating those confs is racy for concurrent
    * queries on the same SparkSession. treeAggregate is conf-free,
    * mergeable across partitions, and ships only the few-MB bitset to the
    * driver. An empty input needs no special case: the all-zero bloom
    * answers false for every probe.
    */
  private[graft] def bloomBytes(keys: DataFrame, keyCol: String, fpp: Double,
                                expectedDistinct: Long = -1L): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val est = math.max(1L,
      if (expectedDistinct > 0) expectedDistinct
      else keys.agg(approx_count_distinct(col(keyCol))).first().getLong(0))
    val bf = keys.select(xxhash64(col(keyCol)).as("__h"))
      .rdd.map(_.getLong(0))
      .treeAggregate(BloomFilter.create(est, fpp))(
        (acc, h) => { acc.putLong(h); acc },
        (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Row-local membership probe against a serialized Bloom sketch. The probe
    * hashes with xxhash64, matching `bloomBytes`' putLong keys — callers
    * must probe the same dtype they built with (xxhash64 is type-strict).
    */
  private[graft] def mightContainCol(bytes: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      GraftColumnBridge.expression(xxhash64(key))))
  }

  /** Per-group quota: keep at most `quota` rows per group, chosen as the
    * smallest `orderKey` values (default: xxhash64 of the key — a
    * deterministic uniform "random" draw, stable under repartitioning and
    * retries like sampleByHash). The per-domain cap step of a corpus
    * recipe: "at most N documents from any one domain".
    *
    * Skew design: a naive `row_number() over (partition by group)` shuffles
    * EVERY row of a hot group into one task — at 100 TB a single web domain
    * is billions of rows. Instead a two-level TakeOrdered: level 1 windows
    * over (group, hash-bucket) — `preBuckets` tasks per group — keeping each
    * bucket's local top-`quota`; level 2 windows over the group alone but
    * now sees at most preBuckets×quota rows per group. The global smallest-N
    * of a group is preserved because every member of it is also in its own
    * bucket's smallest-N.
    *
    * Ties on (orderKey, keyCol) make the survivor row arbitrary among
    * identical (orderKey, key) rows — pass a unique key for full
    * determinism. NULL group values form one group of their own
    * (Window.partitionBy groups nulls together).
    */
  def quotaPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      quota: Int,
      orderKey: Option[Column] = None,
      preBuckets: Int = 64
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quota > 0, s"quotaPerGroup: quota must be positive, got $quota")
    require(preBuckets > 0, s"quotaPerGroup: preBuckets must be positive, got $preBuckets")
    val o = orderKey.getOrElse(xxhash64(col(keyCol), lit(42)))
    val w1 = Window.partitionBy(col(groupCol), col("__qb"))
      .orderBy(col("__qo").asc, col(keyCol).asc)
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(col("__qo").asc, col(keyCol).asc)
    df.withColumn("__qo", o)
      .withColumn("__qb", pmod(xxhash64(col(keyCol), lit(1042)), lit(preBuckets)))
      .withColumn("__qrn", row_number().over(w1))
      .filter(col("__qrn") <= quota)
      .drop("__qrn", "__qb")
      .withColumn("__qrn", row_number().over(w2))
      .filter(col("__qrn") <= quota)
      .drop("__qrn", "__qo")
  }

  /** Deterministic training-order sharding: assign every row a shard in
    * [0, numShards) and a position within its shard, both pure functions of
    * the key — the "global shuffle" step before writing training shards,
    * reproducible across reruns and engines (the order key is an md5 hex
    * string, so an external system can re-derive the exact layout).
    *
    * shard = first 15 hex digits of md5("salt:key") mod numShards (60 bits,
    * always non-negative); pos = rank of the full md5 within the shard.
    * Uniform hash keys → balanced shards, so the per-shard sort (one
    * Exchange on shard + in-partition sort, exactly what
    * `repartition(shard).sortWithinPartitions` does on write) sees
    * n/numShards rows per task regardless of data skew. Size numShards so a
    * shard fits a task at the target scale.
    *
    * NULL keys get a NULL shard/md5 and sort together at the front of one
    * window — filter them beforehand if that is not intended.
    */
  def shardAssign(
      df: DataFrame,
      keyCol: String,
      numShards: Int,
      salt: Int = 42,
      shardCol: String = "shard",
      posCol: String = "pos"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, s"shardAssign: numShards must be positive, got $numShards")
    val hx = md5(concat(lit(s"$salt:"), col(keyCol).cast("string")))
    val shard = (conv(substring(col("__hx"), 1, 15), 16, 10).cast("long")
      % numShards).cast("int")
    val w = Window.partitionBy(col(shardCol)).orderBy(col("__hx").asc, col(keyCol).asc)
    df.withColumn("__hx", hx)
      .withColumn(shardCol, shard)
      .withColumn(posCol, row_number().over(w))
      .drop("__hx")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    * keep the top-k rows by selection key ln(u)/w, where u ∈ (0,1] derives
    * DETERMINISTICALLY from md5("salt:key") — the hash plays the RNG, so
    * the sample is reproducible across reruns, partitionings, and engines
    * (shardAssign's md5-hex arithmetic; the default-salt xxhash gates
    * can't serve here because the oracle must replay the float math).
    * The classic "sample k docs proportional to quality/length" curation
    * gate: P(select) ∝ w without replacement, exactly the A-ES scheme.
    *
    * u = (first-60-bits-of-md5 + 1) / 2^60 (never 0, so ln is finite);
    * es = ln(u)/w, larger is better (u^(1/w) ordering, log-monotone).
    * Null keys, null weights, and non-positive weights never select.
    *
    * Scale shape: the key is row-local; global k is a TakeOrdered (no
    * global sort materializes), per-group k is a rank-pushdown window
    * (partial top-k before the exchange). Grouped output carries `rank`.
    */
  def weightedSample(
      df: DataFrame,
      weightCol: String,
      keyCol: String,
      k: Int,
      groupCols: Seq[String] = Nil,
      salt: Int = 42,
      scoreCol: String = "es_key"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"weightedSample: k must be positive, got $k")
    val hx = md5(concat(lit(s"$salt:"), col(keyCol).cast("string")))
    // 15 hex digits = 60 bits; exact as long, then one correctly-rounded
    // long→double conversion — bit-identical to DuckDB's BIGINT→DOUBLE
    val u = (conv(substring(col("__hx"), 1, 15), 16, 10).cast("long").cast("double") + lit(1.0)) /
      lit(1152921504606846976.0) // 2^60, exactly representable
    val base = df
      .filter(col(keyCol).isNotNull && col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__hx", hx)
      .withColumn(scoreCol, log(u) / col(weightCol).cast("double"))
      .drop("__hx")
    if (groupCols.isEmpty) base.orderBy(col(scoreCol).desc, col(keyCol).asc).limit(k)
    else {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col(scoreCol).desc, col(keyCol).asc)
      base.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
  }
}
