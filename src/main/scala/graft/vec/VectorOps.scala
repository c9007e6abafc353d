package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column transforms for training-data pipelines: L2
  * normalization and int8 max-abs quantization — the storage/bandwidth
  * step before shipping vectors to an ANN index or a training shard
  * (4× smaller than float32, 8× smaller than the double render).
  *
  * All math runs in DOUBLE with a pinned operation order
  * (x * 127.0 / scale + 0.5, then floor) so results are bit-reproducible
  * across engines — IEEE ops on identical doubles give identical results,
  * which is what lets the DuckDB oracle replicate quantization exactly.
  * Per-row scalars (the norm / scale) are materialized as columns BEFORE
  * the element-wise transform: higher-order functions are interpreted with
  * no common-subexpression elimination, so a scalar referenced inside the
  * lambda would otherwise be recomputed per element (O(d²) per row).
  *
  * NULL elements are preserved positionally (a null in → a null out) and
  * excluded from the norm/scale, matching the null-propagation choice of
  * the native kernels in graft.expr.VecExprs. Non-finite elements are the
  * caller's problem: an Infinity would quantize to NaN and crash the
  * ANSI cast — filter upstream.
  */
object VectorOps {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  private def nonNull(v: Column): Column = filter(v, _.isNotNull)

  /** Max absolute value over the (non-null) elements, in double. Exact —
    * max has no accumulation error, so it is safe to compare raw across
    * engines. Empty / all-null vectors get 0.0.
    */
  def maxAbs(v: Column): Column =
    aggregate(nonNull(asDouble(v)), lit(0.0), (acc, x) => greatest(acc, abs(x)))

  /** L2 norm over the (non-null) elements, in double. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(nonNull(asDouble(v)), lit(0.0), (acc, x) => acc + x * x))

  /** Unit-normalize `vecCol` into `outCol` (array<double>). Zero vectors
    * stay zero (no division); null elements stay null in place.
    *
    * float/double arrays run the native one-pass [[graft.expr.UnitizeExpr]]
    * kernel (bit-identical arithmetic — sequential Σx², sqrt, x/norm);
    * other numeric element types keep the HOF formulation (cold path).
    */
  def l2Normalize(df: DataFrame, vecCol: String, outCol: String = "unit"): DataFrame =
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType, _) =>
        df.withColumn(outCol, graft.expr.UnitizeExpr(col(vecCol), dropIfAnyNull = false))
      case _ =>
        df.withColumn("__l2n", l2Norm(col(vecCol)))
          .withColumn(outCol,
            when(col("__l2n") === 0.0, asDouble(col(vecCol)))
              .otherwise(transform(asDouble(col(vecCol)), x => x / col("__l2n"))))
          .drop("__l2n")
    }

  /** Mean-pool member embeddings into ONE vector per group — the standard
    * long-document composition: embed per chunk, pool to a document vector
    * before doc-level ANN / SemDeDup / prototype pruning. Optional
    * `weightCol` (e.g. chunk token counts) makes it a weighted mean;
    * `renorm` L2-normalizes the pooled vector (cosine consumers live on
    * the unit sphere).
    *
    * Semantics: POSITIONAL mean — element i of the output is the
    * (weighted) mean of element i over the group's members that have a
    * non-null element there; ragged dims therefore pool per-position
    * (document mixed-dim groups upstream if that is not intended). A
    * position where EVERY member element is null emits a null element —
    * positions are never compacted away, keeping the module's
    * null-preserved-positionally convention (a shifted dim would silently
    * misalign downstream cosines). Groups whose every vector is
    * null/empty produce no output row (posexplode's null/empty drop),
    * matching "nothing to pool".
    *
    * Scale shape: posexplode → one map-side-combined (keys, pos) sum →
    * one (keys) aggregate rebuilding the array sorted by position.
    * Exchange volume is rows × dim scalars with uniform keys — no
    * window, no collect, skew-free at any group-size imbalance (a
    * million-chunk document is a million rows per (key, pos) partial,
    * combined map-side).
    */
  def meanPool(df: DataFrame, keyCols: Seq[String], vecCol: String,
               outCol: String = "pooled", weightCol: Option[String] = None,
               renorm: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "meanPool: need at least one key column")
    val keys = keyCols.map(col)
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    // null ELEMENTS stay in the exploded relation (their (key, pos) row is
    // what preserves the position); they are excluded from the sums via
    // the when() guards, so an all-null position means null/null -> null
    val ex = df.select((keys :+ w.as("__w") :+ posexplode(asDouble(col(vecCol)))): _*)
      .filter(col("__w").isNotNull)
    val sums = ex.groupBy((keys :+ col("pos")): _*)
      .agg(sum(when(col("col").isNotNull, col("col") * col("__w"))).as("__s"),
        sum(when(col("col").isNotNull, col("__w"))).as("__n"))
    val pooled = sums.groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(col("pos"),
        (col("__s") / nullif(col("__n"), lit(0.0))).as("v")))).as("__pv"))
      .withColumn(outCol, transform(col("__pv"), e => e.getField("v")))
      .drop("__pv")
    if (renorm) l2Normalize(pooled, outCol, outCol) else pooled
  }

  /** Matryoshka truncation (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): keep the FIRST `dims` elements and
    * re-normalize — MRL-trained embeddings retain most retrieval quality
    * at prefix dims, and ANN/storage cost drops linearly with the cut.
    * The renormalize step is what keeps cosine consumers calibrated
    * (prefix norms shrink, raw dots would too).
    */
  def truncateRenorm(df: DataFrame, vecCol: String, dims: Int,
                     outCol: String = "trunc"): DataFrame = {
    require(dims >= 1, s"truncateRenorm: dims must be >= 1, got $dims")
    l2Normalize(df.withColumn(outCol, slice(asDouble(col(vecCol)), 1, dims)), outCol, outCol)
  }

  /** Symmetric max-abs int8 quantization: scale = max|x| over the vector,
    * q_i = floor(x_i * 127.0 / scale + 0.5) as tinyint in [-127, 127]
    * (round-half-up via floor — NOT round(), whose half-even/half-up
    * behavior differs between engines). Dequantize as q_i * scale / 127.
    * Zero vectors quantize to all zeros. Adds `scaleOutCol` (double) and
    * `outCol` (array<tinyint>).
    */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   outCol: String = "q", scaleOutCol: String = "q_scale"): DataFrame =
    df.withColumn(scaleOutCol, maxAbs(col(vecCol)))
      .withColumn(outCol, transform(asDouble(col(vecCol)), x =>
        when(x.isNull, lit(null))
          .otherwise(
            when(col(scaleOutCol) === 0.0, lit(0L))
              .otherwise(floor(x * lit(127.0) / col(scaleOutCol) + lit(0.5))))
          .cast("tinyint")))
}
