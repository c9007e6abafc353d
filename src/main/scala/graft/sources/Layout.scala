package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side data layout: multi-dimensional clustering (Z-order) and
  * small-file compaction. At 100 TB the LAYOUT of what you write decides
  * the cost of every later scan: parquet row-group min/max stats prune only
  * if rows with nearby values sit in the same row group, and a directory of
  * KB-sized files turns a scan into an open()-bound metadata storm.
  *
  * Everything here is composed from built-in, codegen'd column ops — a
  * Z-order key is just shifts and ORs, so no custom Expression is
  * warranted (guide preference order).
  */
object Layout {

  /** Integer range bucket: maps `c` in [mn, mx] to [0, 2^bits) with pure
    * LONG arithmetic — `(x - mn) * 2^bits DIV (mx - mn + 1)` — so the value
    * is bit-exact and replayable by any engine (no float rounding).
    * Values outside [mn, mx] (stale stats) clamp to the edge buckets; null
    * stays null. Caller guarantees (mx - mn + 1) * 2^bits fits a long —
    * true for any 32-bit-ranged key at bits <= 16.
    */
  def rangeBucket(colName: String, mn: Long, mx: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 30, s"rangeBucket: bits out of range: $bits")
    val m = 1L << bits
    val range = mx - mn + 1
    val q = "`" + colName.replace("`", "``") + "`"
    val raw = expr(s"((CAST($q AS BIGINT) - ${mn}L) * ${m}L) DIV ${range}L")
    // least/greatest SKIP nulls (a null value would silently clamp to
    // bucket 0); propagate null explicitly so a null dimension yields a
    // null layout key
    when(expr(q).isNull, lit(null).cast("int"))
      .otherwise(least(lit(m - 1), greatest(lit(0L), raw)).cast("int"))
  }

  /** Morton (Z-order) interleave of N integer bucket columns, `bits` bits
    * each: bit j of column i lands at position j·N + i. Null in any column
    * → null key. Built from shiftleft/AND/OR — inside whole-stage codegen,
    * constant-folded shift distances.
    */
  def interleaveBits(bits: Int, cols: Seq[Column]): Column = {
    val n = cols.size
    require(n > 0, "interleaveBits: at least one column")
    require(bits > 0 && n * bits <= 63, s"interleaveBits: $n cols x $bits bits exceeds 63")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1)).cast("long"), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Add a Z-order key column over `cols` (numeric): one exact min/max pass
    * (single-row driver collect — the scalar-broadcast pattern), integer
    * range buckets, interleaved key. Constant columns (mn == mx) contribute
    * bucket 0 and don't perturb the curve.
    */
  def addZOrderKey(df: DataFrame, cols: Seq[String], bits: Int = 8,
                   keyCol: String = "zkey"): DataFrame = {
    require(cols.nonEmpty, "addZOrderKey: at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"__mn_$c"), max(col(c).cast("long")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      // empty/all-null column → null min/max; bucket over [0,0] yields 0
      // for the (nonexistent / all-null) values instead of an NPE
      val mn = if (row.isNullAt(2 * i)) 0L else row.getLong(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0L else row.getLong(2 * i + 1)
      rangeBucket(c, mn, mx, bits)
    }
    df.withColumn(keyCol, interleaveBits(bits, buckets))
  }

  /** Range-partition + sort by the Z-order key: the write-ready layout.
    * Rows with nearby values in EVERY clustered column land in the same
    * output file/row group, so min/max stats prune scans filtered on any of
    * them. The key column is kept (drop it before write if unwanted).
    */
  def clusterByZOrder(df: DataFrame, cols: Seq[String], bits: Int = 8,
                      numPartitions: Int = 0, keyCol: String = "zkey"): DataFrame = {
    val keyed = addZOrderKey(df, cols, bits, keyCol)
    val ranged =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col(keyCol))
      else keyed.repartitionByRange(col(keyCol))
    ranged.sortWithinPartitions(keyCol)
  }

  /** Plan a compaction of `inputDir` to ~`targetFileBytes` output files:
    * sums the on-disk file sizes, derives the output partition count, and
    * returns the frame coalesced (shuffle-free narrow merge; set
    * `rebalance = true` for a full shuffle when input files are skewed in
    * size). Same format in ≈ same format out, so on-disk bytes per
    * partition track the target.
    */
  def compactToTargetSize(spark: SparkSession, inputDir: String,
                          targetFileBytes: Long, format: String = "parquet",
                          rebalance: Boolean = false): (DataFrame, Int) = {
    require(targetFileBytes > 0, "compactToTargetSize: target must be positive")
    val path = new org.apache.hadoop.fs.Path(inputDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        total += f.getLen
    }
    val n = math.max(1, math.ceil(total.toDouble / targetFileBytes).toInt)
    val df = format match {
      case "parquet" => spark.read.parquet(inputDir)
      case "orc"     => spark.read.orc(inputDir)
      case other     => throw new IllegalArgumentException(s"compact: unsupported format $other")
    }
    // coalesce can only REDUCE the partition count, and the parquet reader
    // already packs small files into few splits (maxPartitionBytes /
    // openCostInBytes) — when the scan yields fewer splits than the target
    // file count, a shuffle-free coalesce would under-produce, so fall back
    // to a full repartition
    val current = df.rdd.getNumPartitions
    val out = if (rebalance || current < n) df.repartition(n) else df.coalesce(n)
    (out, n)
  }
}
