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

  /** Apply a CDC change log (I/U/D rows with a monotonically increasing
    * sequence — Debezium/binlog shape) onto a Type-1 snapshot: per key,
    * the HIGHEST-sequence change wins; `D` deletes the key, `I`/`U` upsert
    * the payload. Untouched snapshot keys pass through an anti-join — the
    * snapshot never shuffles on anything but the key, and the change log
    * (the small side at any realistic change rate) is aggregated to one
    * winner per key BEFORE touching the snapshot.
    *
    * Winner election is deterministic under sequence ties via the
    * max-struct trick ordered on (seq, delete-rank, op, payload): a
    * same-sequence I/U + D pair resolves to the delete (the conservative
    * read — an explicit rank, since bare lexicographic op order would put
    * "U" above "D").
    */
  def applyCdc(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
               opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payload = snapshot.columns.toSeq // target schema
    require(payload.forall(changes.columns.contains),
      s"applyCdc: change log must carry every snapshot column; missing " +
        payload.filterNot(changes.columns.contains).mkString(", "))
    // one winner per key: max over (seq, op, tracked payload) — a single
    // map-side-combined aggregate, no window over the log
    val winner = changes
      .groupBy(keys.map(col): _*)
      .agg(max(struct(
        col(seqCol).as("__seq") +:
          when(col(opCol) === "D", 1).otherwise(0).as("__del") +:
          col(opCol).as("__op") +:
          payload.filterNot(keys.contains).map(c => col(c).as(s"__p_$c")): _*)).as("__w"))
    val upserts = winner
      .filter(col("__w.__op") =!= "D")
      .select(keys.map(col) ++
        payload.filterNot(keys.contains).map(c => col(s"__w.__p_$c").as(c)): _*)
      .select(payload.map(col): _*)
    // null-safe anti join: a change log CAN target a null-keyed row (the
    // winner groupBy keeps the null group), and the bare USING anti-join
    // would then retain the old snapshot row alongside the upsert
    val touchedKeys = winner.select(keys.map(k => col(k).as(s"__tk_$k")): _*)
    val cond = keys.map(k => col(k) <=> col(s"__tk_$k")).reduce(_ && _)
    snapshot.join(touchedKeys, cond, "left_anti")
      .unionByName(upserts)
  }
}
