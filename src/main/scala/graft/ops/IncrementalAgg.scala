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
}
