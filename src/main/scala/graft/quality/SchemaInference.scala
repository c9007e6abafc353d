package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema analysis — graft's equivalent of utils/schema_inference.py
  * (80-374). Physical schema comes free from Spark readers; what this module
  * adds is the *analysis*: per-column cardinality/nullability stats, SQL type
  * recommendation, primary-key candidates (all-unique + non-null,
  * schema_inference.py:288-300), foreign-key candidates (`*_id`/`*key`
  * name-suffix heuristic, :302-319), and a data-quality score (:266-286) —
  * all from ONE aggregate pass.
  */
object SchemaInference {

  /** Long-format per-column analysis: (column, n, nulls, distinct,
    * null_ratio, distinct_ratio, is_pk_candidate).
    */
  def columnStats(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => s"'$c', `${c}__nulls`, `${c}__distinct`").mkString(", ")
    wide
      .select(col("__n"), expr(s"stack(${cols.size}, $stacked) as (column, nulls, n_distinct)"))
      .select(
        col("column"),
        col("__n").as("n"),
        col("nulls"),
        col("n_distinct"),
        (col("nulls") / nullif(col("__n"), lit(0L))).as("null_ratio"),
        (col("n_distinct") / nullif(col("__n"), lit(0L))).as("distinct_ratio"),
        (col("nulls") === 0 && col("n_distinct") === col("__n")).as("is_pk_candidate"))
  }

  /** Spark type → recommended SQL type (schema_inference.py:123-179 mapping). */
  def sqlTypeFor(dt: DataType, maxLen: Option[Int] = None): String = dt match {
    case ByteType | ShortType | IntegerType => "INTEGER"
    case LongType                           => "BIGINT"
    case FloatType | DoubleType             => "DOUBLE PRECISION"
    case _: DecimalType                     => "NUMERIC"
    case BooleanType                        => "BOOLEAN"
    case TimestampType                      => "TIMESTAMP"
    case DateType                           => "DATE"
    case StringType =>
      maxLen match {
        case Some(n) if n <= 255 => s"VARCHAR(${math.max(1, n)})"
        case _                   => "TEXT"
      }
    case _ => "TEXT"
  }

  /** FK candidates by the reference's name heuristic (schema_inference.py:302-319):
    * columns ending in `_id` / `key` whose values are contained in another
    * table's PK-candidate column. Containment check = left_anti count == 0.
    */
  def fkCandidates(child: DataFrame, childCol: String, parent: DataFrame, parentCol: String): Boolean = {
    val missing = child.select(col(childCol).as("k")).where(col("k").isNotNull).distinct()
      .join(parent.select(col(parentCol).as("k")).distinct(), Seq("k"), "left_anti")
      .limit(1).count()
    missing == 0L
  }

  /** FK containment stats as data (one row per candidate pair): distinct
    * child keys, count missing from the parent, containment ratio, verdict.
    * The anti-join runs on DISTINCT keys — cost scales with key cardinality,
    * not table size, so star-schema probes stay cheap at corpus scale.
    */
  def fkCandidateStats(child: DataFrame, childCol: String,
                       parent: DataFrame, parentCol: String): DataFrame = {
    val ck = child.select(col(childCol).as("k")).where(col("k").isNotNull).distinct()
    val pk = parent.select(col(parentCol).as("k")).distinct().withColumn("__hit", lit(1))
    // one left join + ONE aggregate (a crossJoin of two single-row aggs
    // would plan a BroadcastNestedLoopJoin — harmless at 1×1 but noise in
    // every plan audit)
    ck.join(pk, Seq("k"), "left")
      .agg(count(lit(1)).as("n_child_keys"),
        sum(when(col("__hit").isNull, 1).otherwise(0)).as("n_missing"))
      .select(
        lit(childCol).as("child_col"), lit(parentCol).as("parent_col"),
        col("n_child_keys"), col("n_missing"),
        round((col("n_child_keys") - col("n_missing")) / col("n_child_keys"), 6).as("containment"),
        (col("n_missing") === 0).as("is_fk_candidate"))
  }

  /** Table quality score (schema_inference.py:266-286): weighted blend of
    * completeness and key integrity, one bounded row out.
    */
  def qualityScore(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val completenessAvg = cols.map(c =>
      count(col(c)).cast("double") / nullif(count(lit(1)), lit(0L))).reduce(_ + _) / cols.size
    df.agg(round(completenessAvg * 100, 2).as("quality_score"))
  }
}
