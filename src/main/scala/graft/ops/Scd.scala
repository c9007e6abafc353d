package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (Type 2): versioned dimension rows
  * with `valid_from` / `valid_to` / `is_current`, merged incrementally from a
  * batch of observed changes. The incremental-merge pattern a 100 TB
  * dimension needs: the CLOSED history never joins and never shuffles (it
  * passes through a union untouched); only the open rows — one per key — and
  * the (small) update batch take part in the merge, so cost scales with the
  * change volume, not the accumulated history.
  *
  * No reference-repo equivalent (the reference's JDBC upsert is Type-1
  * overwrite, storage/postgresql_storage.py:252-322); this is the Type-2
  * sibling a training-data lakehouse uses for provenance-stable dims.
  */
object Scd {

  private val meta = Seq("valid_from", "valid_to", "is_current")

  /** Bootstrap a dimension from a point-in-time snapshot: every row becomes
    * an open version effective at its `tsCol`.
    */
  def scd2Init(snapshot: DataFrame, keys: Seq[String], tracked: Seq[String],
               tsCol: String): DataFrame =
    snapshot.select(
      (keys ++ tracked).map(col) :+
        col(tsCol).as("valid_from") :+
        lit(null).cast(snapshot.schema(tsCol).dataType).as("valid_to") :+
        lit(true).as("is_current"): _*)

  /** Merge a change batch into a Type-2 dimension.
    *
    * `current`: keys ++ tracked ++ (valid_from, valid_to, is_current).
    * `updates`: keys ++ tracked ++ tsCol (+ optional `orderBy` tie-breakers —
    * ties on tsCol within a key are otherwise nondeterministic).
    *
    * Semantics per key:
    *   - consecutive updates with identical tracked values collapse (only
    *     transitions produce versions — null-safe comparison);
    *   - if the first surviving change equals the open row's tracked values
    *     it is a no-op (the open row already holds that state);
    *   - the open row closes at the first effective change's timestamp;
    *   - each change opens a version valid until the next change (the last
    *     one stays open / current);
    *   - keys without an open row (new keys) insert their full chain;
    *   - closed history rows pass through untouched.
    *
    * Assumes update timestamps are newer than the open rows' `valid_from`
    * (late-arriving corrections are a rewrite of history, not a merge — run
    * scd2Init over the corrected change log instead).
    *
    * Idempotency: re-applying the same batch is a no-op — every change either
    * matches the open row it created (dropped as no-op first change) or an
    * earlier closed version boundary it already wrote.
    */
  def scd2Apply(current: DataFrame, updates: DataFrame, keys: Seq[String],
                tracked: Seq[String], tsCol: String,
                orderBy: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2Apply: at least one key column is required")
    require(tracked.nonEmpty, "scd2Apply: at least one tracked column is required")
    val ord = tsCol +: orderBy
    val kw = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(col): _*)
    val tsType = updates.schema(tsCol).dataType
    val trackedStruct = struct(tracked.map(col): _*)
    val workCols = ((keys ++ tracked) :+ tsCol) ++ orderBy

    // 1. collapse consecutive duplicates: only transitions survive
    val transitions = updates
      .select(workCols.map(col): _*)
      .withColumn("__prev", lag(trackedStruct, 1).over(kw))
      .filter(col("__prev").isNull || !(trackedStruct <=> col("__prev")))
      .drop("__prev")

    val open = current.filter(col("is_current"))
    val closed = current.filter(!col("is_current"))

    // 2. drop the first change when it matches the open row's state (no-op).
    // Only the FIRST can match: later survivors differ from their
    // predecessor by construction.
    // __has_open marks a real open-row match: without it, a NEW key whose
    // tracked values are all null would null-safe-equal the all-null
    // unmatched join columns and lose its first version
    val openState = open.select(
      keys.map(col) ++ tracked.map(c => col(c).as(s"__cur_$c"))
        :+ lit(true).as("__has_open"): _*)
    val firstRn = row_number().over(kw)
    val effective = transitions
      .withColumn("__rn", firstRn)
      .join(openState, keys, "left")
      .filter(!(col("__rn") === 1 && col("__has_open").isNotNull &&
        struct(tracked.map(c => col(s"__cur_$c")): _*) <=> trackedStruct))
      .select(workCols.map(col): _*)

    // 3. version chain over the effective changes
    val versions = effective
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(kw))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ tracked ++ meta).map(col): _*)

    // 4. close open rows whose key received an effective change
    val closeAt = effective.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__close_ts"))
    val openAdjusted = open
      .join(closeAt, keys, "left")
      .withColumn("valid_to",
        when(col("__close_ts").isNotNull, col("__close_ts").cast(tsType))
          .otherwise(col("valid_to")))
      .withColumn("is_current", col("__close_ts").isNull)
      .select((keys ++ tracked ++ meta).map(col): _*)

    closed.select((keys ++ tracked ++ meta).map(col): _*)
      .unionByName(openAdjusted)
      .unionByName(versions)
  }
}
