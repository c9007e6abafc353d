package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate state: profile a 100 TB corpus ONCE,
  * then keep the stats current by aggregating only each new shard and
  * merging compact state tables — the corpus is never re-scanned.
  *
  * The state per (group, column) is the classic mergeable-summary tuple
  * (n, n_nulls, sum, sumsq, min, max [, HLL sketch]): every element is
  * associative/commutative, so `merge(fit(A), fit(B)) == fit(A ∪ B)`
  * exactly for the integer-path members and up to float re-association for
  * the double sums. Finalized mean/std derive from the state alone.
  *
  * Scale shape: fit is one map-side-combined groupBy over the SHARD;
  * merge is a groupBy over state tables whose size is |groups|, not |rows|.
  * The same pattern the reference's quality monitor recomputes from scratch
  * per run (utils/quality_monitor.py recomputes full-table metrics on every
  * call) — at 100 TB recomputation is a full scan per refresh, this is one
  * scan per new shard.
  */
object IncrementalAgg {

  private def stateCols(c: String): Seq[String] =
    Seq(s"${c}_n", s"${c}_nulls", s"${c}_sum", s"${c}_sumsq", s"${c}_min", s"${c}_max")

  /** Aggregate one shard to its state table. `approxDistinctCols` adds a
    * DataSketches HLL sketch per listed column (mergeable across shards;
    * estimates via finalizeStats).
    */
  def fit(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
          approxDistinctCols: Seq[String] = Nil): DataFrame = {
    require(valueCols.nonEmpty, "IncrementalAgg.fit: at least one value column")
    val aggs = valueCols.flatMap { c =>
      val v = col(c).cast("double")
      Seq(
        count(col(c)).as(s"${c}_n"),
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        sum(v).as(s"${c}_sum"),
        sum(v * v).as(s"${c}_sumsq"),
        min(v).as(s"${c}_min"),
        max(v).as(s"${c}_max"))
    } ++ approxDistinctCols.map(c => hll_sketch_agg(col(c)).as(s"${c}_hll"))
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state tables (all produced by `fit` with the same columns):
    * groups present in either side combine element-wise. Cost is
    * proportional to the state size — the underlying shards are not read.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String], valueCols: Seq[String],
            approxDistinctCols: Seq[String] = Nil): DataFrame = {
    require(states.nonEmpty, "IncrementalAgg.merge: at least one state table")
    val unioned = states.reduce(_ unionByName _)
    val aggs = valueCols.flatMap { c =>
      Seq(
        sum(col(s"${c}_n")).as(s"${c}_n"),
        sum(col(s"${c}_nulls")).as(s"${c}_nulls"),
        sum(col(s"${c}_sum")).as(s"${c}_sum"),
        sum(col(s"${c}_sumsq")).as(s"${c}_sumsq"),
        min(col(s"${c}_min")).as(s"${c}_min"),
        max(col(s"${c}_max")).as(s"${c}_max"))
    } ++ approxDistinctCols.map(c => hll_union_agg(col(s"${c}_hll")).as(s"${c}_hll"))
    if (keys.isEmpty) unioned.agg(aggs.head, aggs.tail: _*)
    else unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Derive presentable stats from a state table: count/nulls/mean/std
    * (population)/min/max per value column, plus HLL distinct estimates.
    * Sumsq-based variance carries the usual cancellation caveat for
    * |mean| >> std — profiling-grade, as documented.
    */
  def finalizeStats(state: DataFrame, keys: Seq[String], valueCols: Seq[String],
                    approxDistinctCols: Seq[String] = Nil): DataFrame = {
    val outCols = keys.map(col) ++ valueCols.flatMap { c =>
      val n = col(s"${c}_n").cast("double")
      val mean = when(col(s"${c}_n") > 0, col(s"${c}_sum") / n)
      val variance = when(col(s"${c}_n") > 0,
        greatest(lit(0.0), col(s"${c}_sumsq") / n - (col(s"${c}_sum") / n) * (col(s"${c}_sum") / n)))
      Seq(
        col(s"${c}_n"), col(s"${c}_nulls"),
        mean.as(s"${c}_mean"), sqrt(variance).as(s"${c}_std"),
        col(s"${c}_min"), col(s"${c}_max"))
    } ++ approxDistinctCols.map(c =>
      hll_sketch_estimate(col(s"${c}_hll")).as(s"${c}_distinct_est"))
    state.select(outCols: _*)
  }

  // ------------------------------------------------- mergeable quantiles

  /** DDSketch-style mergeable quantile state (Masson, Rim & Lee, VLDB
    * 2019): values land in log-spaced buckets idx = ceil(ln|x| / ln γ)
    * with γ = (1+α)/(1−α), which guarantees every quantile estimate is
    * within RELATIVE error α of the true value — the property
    * fixed-width histograms lack. The state per (group, sign, bucket) is
    * one count row: merging shards is a plain groupBy-sum (exact —
    * `ddMerge(ddFit(A), ddFit(B)) == ddFit(A ∪ B)`, spec-pinned), so
    * corpus-wide p99s stay current at one scan per new shard, completing
    * the (n, sum, sumsq, HLL) state family above with quantiles.
    *
    * Signed layout: sign ∈ {−1, 0, 1}, bucket of |x|; ordering by
    * (sign, sign·bucket) walks buckets in true value order. Everything —
    * ln, division, ceil — is the same correctly-rounded IEEE op in both
    * engines, so the whole sketch AND its quantile read-out are
    * DuckDB-replayable. Null values are excluded (nulls have no
    * quantile).
    */
  def ddFit(df: DataFrame, keys: Seq[String], valueCol: String,
            alpha: Double = 0.01): DataFrame = {
    require(alpha > 0 && alpha < 1, s"ddFit: alpha must be in (0,1), got $alpha")
    val gamma = (1 + alpha) / (1 - alpha)
    val x = col(valueCol).cast("double")
    val bucket = when(x === 0, lit(0))
      .otherwise(ceil(log(abs(x)) / lit(math.log(gamma))).cast("int"))
    val sign = when(x > 0, 1).when(x < 0, -1).otherwise(0)
    // ±Inf must be excluded BEFORE bucketing: ceil(ln(inf)) = inf, and the
    // ANSI int cast on it is a job-killing CAST_OVERFLOW, not a null
    val base = df.filter(x.isNotNull && !isnan(x) && abs(x) < lit(Double.PositiveInfinity))
      .select((keys.map(col) :+ sign.as("sign") :+ bucket.as("bucket")): _*)
    base.groupBy((keys :+ "sign" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge ddFit state tables — exact, cost ∝ state size. */
  def ddMerge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "ddMerge: at least one state table")
    states.reduce(_ unionByName _)
      .groupBy((keys :+ "sign" :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))
  }

  /** Quantile read-out from a ddFit/ddMerge state: for each q, the
    * DDSketch point estimate sign·2γ^b/(γ+1) of the first bucket whose
    * cumulative count reaches q·total. Per-key windows run over the
    * BUCKET frame (≤ log-range/α rows per key), never the data. Output:
    * one row per (keys, q).
    */
  def ddQuantiles(state: DataFrame, keys: Seq[String], qs: Seq[Double],
                  alpha: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"ddQuantiles: quantiles must be in [0,1], got $qs")
    val sp = state.sparkSession
    import sp.implicits._
    val gamma = (1 + alpha) / (1 - alpha)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("sign").asc, (col("sign") * col("bucket")).asc)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val est = when(col("sign") === 0, lit(0.0))
      .otherwise(col("sign") * (lit(2.0) * pow(lit(gamma), col("bucket")) / lit(gamma + 1)))
    val cum = state
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("__est", est)
    val perQ = cum.crossJoin(broadcast(qs.toDF("q")))
      .filter(col("__cum").cast("double") >= col("q") * col("__tot").cast("double"))
    perQ.groupBy((keys :+ "q").map(col): _*)
      .agg(min_by(col("__est"),
        struct(col("sign").as("s"), (col("sign") * col("bucket")).as("k"))).as("quantile_est"))
  }
}
