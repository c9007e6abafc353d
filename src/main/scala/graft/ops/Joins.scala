package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-oriented joins Spark lacks as built-ins, expressed as compositions
  * of shuffles/windows (guide preference order: compose built-ins before
  * custom SparkPlans — both of these have exact shuffle-based formulations,
  * so no custom physical operator is warranted).
  */
object Joins {

  /** As-of join: for each left row, the most recent right row with
    * rightTs <= leftTs (per key), optionally within `toleranceSeconds`.
    *
    * Implementation is the union+ordered-window formulation: tag sides,
    * union on (keys, ts), and forward-fill the right payload over
    * (keys ORDER BY ts, side) — ONE shuffle on the keys, no join node at
    * all, O(n log n) per key. At equal timestamps the right row sorts first,
    * giving inclusive (<=) semantics.
    *
    * `rightCols` are the payload columns pulled from `right`; they must not
    * collide with left column names.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceSeconds: Long = -1L,
      direction: String = "backward" // backward: last right <= leftTs; forward: first right >= leftTs
  ): DataFrame = {
    require(Set("backward", "forward").contains(direction),
      s"asofJoin: direction must be backward|forward, got '$direction'")
    // The whole right payload rides in ONE struct filled by ONE
    // last(ignoreNulls) — filling columns independently would mix values
    // from different right rows whenever a right row holds a NULL payload
    // column (and a single window expression is cheaper than N).
    val r = right.select((keys.map(col) :+ col(rightTs).cast("timestamp").as("__t") :+
        struct(rightCols.map(col) :+ col(rightTs).cast("timestamp").as("__mt"): _*).as("__rpay")): _*)
      .withColumn("__side", lit(0)) // right sorts first at equal ts → inclusive
    val l = left.withColumn("__t", col(leftTs).cast("timestamp"))
      .withColumn("__side", lit(1))
    val unioned = r.unionByName(l, allowMissingColumns = true)
    // forward flips the scan direction: walking ts DESC, the "most recent
    // right row so far" is the NEAREST FOLLOWING one; the side tiebreak
    // keeps equal timestamps inclusive in both directions
    val ord = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__rpay", last(col("__rpay"), ignoreNulls = true).over(w))
    val onlyLeft = rightCols.foldLeft(filled.filter(col("__side") === 1)) { (d, c) =>
        d.withColumn(c, col(s"__rpay.$c"))
      }
      .withColumn("__matched_t", col("__rpay.__mt"))
    val tolerated =
      if (toleranceSeconds < 0) onlyLeft
      else {
        val gap =
          if (direction == "backward") unix_micros(col("__t")) - unix_micros(col("__matched_t"))
          else unix_micros(col("__matched_t")) - unix_micros(col("__t"))
        val within = col("__matched_t").isNotNull && gap <= toleranceSeconds * 1000000L
        rightCols.foldLeft(onlyLeft)((d, c) => d.withColumn(c, when(within, col(c))))
          .withColumn("__matched_t", when(within, col("__matched_t")))
      }
    tolerated.withColumnRenamed("__matched_t", "asof_ts").drop("__t", "__side", "__rpay")
  }

  /** Range (interval containment) join: left rows with tsCol ∈
    * [startCol, endCol] of right, sharing `keys`. Instead of the
    * BroadcastNestedLoopJoin Spark plans for a bare BETWEEN predicate, both
    * sides are bucketed on floor(ts / bucketSeconds): each right interval
    * explodes into its covered buckets, each left row lands in exactly one —
    * so the join is an equi-join on (keys, bucket) with a post-filter, and
    * each qualifying pair matches exactly once. Choose bucketSeconds near
    * the typical interval length (cost ~ intervalLen/bucketSeconds
    * duplicates per right row).
    */
  def rangeJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketSeconds: Long
  ): DataFrame = {
    val lb = left.withColumn("__bucket",
      floor(unix_micros(col(tsCol).cast("timestamp")) / (bucketSeconds * 1000000L)))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol).cast("timestamp")) / (bucketSeconds * 1000000L)),
        floor(unix_micros(col(endCol).cast("timestamp")) / (bucketSeconds * 1000000L)))))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
