package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Pivot/reshape library — §2.I, the graft equivalent of the reference's
  * transformations/pivot_operations.py (477 LoC). All single-pass Spark plans:
  * pivots compile to one shuffle; subtotals use ROLLUP (no frame concat).
  */
object PivotLib {

  /** pivot_table (pivot_operations.py:14-66): multi-agg pivot with optional
    * fill value. `pivotValues` bounds the column explosion (SURVEY §7 risk:
    * spark.sql.pivotMaxValues) — pass it whenever the domain is known.
    */
  def pivotTable(
      df: DataFrame,
      index: Seq[String],
      pivotCol: String,
      valueCol: String,
      aggFuncs: Seq[String] = Seq("sum"),
      fillValue: Option[Any] = None,
      pivotValues: Seq[Any] = Nil
  ): DataFrame = {
    val g = df.groupBy(index.map(col): _*)
    val p = if (pivotValues.nonEmpty) g.pivot(pivotCol, pivotValues) else g.pivot(pivotCol)
    val aggs = aggFuncs.map(f => Relational.aggExpr(f, valueCol).as(f))
    val out = if (aggs.size == 1) p.agg(aggs.head) else p.agg(aggs.head, aggs.tail: _*)
    // type-directed fill: na.fill(double) touches numeric columns only,
    // na.fill(string) string columns — a blanket toString.toDouble threw on
    // non-numeric fills (pandas fill_value accepts anything)
    fillValue.fold(out) {
      case v: String  => out.na.fill(v)
      case v: Boolean => out.na.fill(v)
      case v: Number  => out.na.fill(v.doubleValue())
      case v          => out.na.fill(v.toString)
    }
  }

  /** unpivot/melt (pivot_operations.py:68-106) — native `unpivot`. */
  def melt(df: DataFrame, idVars: Seq[String], valueVars: Seq[String],
           varName: String = "variable", valueName: String = "value"): DataFrame =
    Relational.melt(df, idVars, valueVars, varName, valueName)

  /** cross_tab (pivot_operations.py:108-166): count (or agg) contingency
    * table, with optional normalization by all / row (index) / column.
    * Built as an explicit pivot-count so column naming stays predictable.
    */
  def crossTab(
      df: DataFrame,
      rowCol: String,
      colCol: String,
      normalize: String = "none", // none | all | index | columns
      colValues: Seq[Any] = Nil
  ): DataFrame = {
    val g = df.groupBy(col(rowCol))
    val p = if (colValues.nonEmpty) g.pivot(colCol, colValues) else g.pivot(colCol)
    val counts = p.agg(count(lit(1)))
    val valueCols = counts.columns.filterNot(_ == rowCol)
    // the pivot column names are DATA-derived ('1.5', 'a.com', …): every
    // re-resolution must backtick-quote, or col("1.5") parses a struct access
    def q(c: String) = col("`" + c.replace("`", "``") + "`")
    // not na.fill: it resolves names as dotted paths, so a '1.5' category
    // column becomes an unresolved `1`.`5` reference
    val filled = valueCols.foldLeft(counts)((d, c) =>
      d.withColumn(c, coalesce(q(c), lit(0L))))
    normalize match {
      case "none" => filled
      case "index" => // each row sums to 1 (materialize the row total FIRST —
        // dividing in a fold would let later columns see already-divided ones)
        val withTotal = filled.withColumn("__rt", valueCols.map(q).reduce(_ + _))
        // zero totals (possible when colValues is a subset) → null, not NaN
        valueCols.foldLeft(withTotal)((d, c) =>
          d.withColumn(c, when(col("__rt") =!= 0, q(c) / col("__rt")))).drop("__rt")
      case "all" | "columns" =>
        // column/grand totals need a global aggregate: broadcast a 1-row total frame
        val totals = filled.agg(valueCols.map(c => sum(q(c)).as(s"__t_$c")).head,
                                valueCols.map(c => sum(q(c)).as(s"__t_$c")).tail: _*)
        val joined = filled.crossJoin(broadcast(totals))
        val grand = valueCols.map(c => q(s"__t_$c")).reduce(_ + _)
        val out = valueCols.foldLeft(joined) { (d, c) =>
          val denom = if (normalize == "columns") q(s"__t_$c") else grand
          d.withColumn(c, when(denom =!= 0, q(c) / denom))
        }
        out.drop(valueCols.map(c => s"__t_$c"): _*)
    }
  }

  /** pivot_multiple_values (pivot_operations.py:168-213): pandas does one
    * pivot per value column and concatenates; Spark does it in ONE pass with a
    * multi-agg pivot (columns named `{pivotValue}_{fn}_{valueCol}`).
    */
  def pivotMultipleValues(
      df: DataFrame,
      index: Seq[String],
      pivotCol: String,
      valueCols: Seq[String],
      aggFunc: String = "sum",
      pivotValues: Seq[Any] = Nil
  ): DataFrame = {
    val g = df.groupBy(index.map(col): _*)
    val p = if (pivotValues.nonEmpty) g.pivot(pivotCol, pivotValues) else g.pivot(pivotCol)
    val aggs = valueCols.map(v => Relational.aggExpr(aggFunc, v).as(s"${aggFunc}_$v"))
    if (aggs.size == 1) p.agg(aggs.head) else p.agg(aggs.head, aggs.tail: _*)
  }

  /** pivot_with_subtotals (pivot_operations.py:215-282): pandas builds
    * subtotal frames per level and concatenates; Spark expresses the whole
    * thing as ROLLUP + grouping() labels — one shuffle, no unions.
    * Subtotal rows carry `rollupLabel` in the rolled-up key columns.
    */
  def pivotWithSubtotals(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      aggFunc: String = "sum",
      rollupLabel: String = "TOTAL"
  ): DataFrame = {
    val agg = Relational.aggExpr(aggFunc, valueCol).as(s"${aggFunc}_$valueCol")
    val gCols = keys.map(k => grouping(col(k)).as(s"__g_$k"))
    // grouping_id is a DOCUMENTED output column (0 = detail row, higher =
    // subtotal levels) — callers sort/filter subtotals by it
    val rolled = df.rollup(keys.map(col): _*)
      .agg(agg, (gCols :+ grouping_id().as("grouping_id")): _*)
    val labeled = keys.foldLeft(rolled) { (d, k) =>
      d.withColumn(k, when(col(s"__g_$k") === 1, lit(rollupLabel)).otherwise(col(k)))
    }
    labeled.drop(keys.map(k => s"__g_$k"): _*)
  }

  /** Pareto / top-k report with an `__other` rollup: the "top N plus
    * everything else" summary every dashboard wants, with each row's share
    * of the GRAND total. One map-side-combined aggregate to the per-key
    * measure, top-k via TakeOrdered (no global sort materializes), the
    * tail anti-joined and collapsed to one row; shares and ranks ride a
    * window over the ≤ k+1-row report frame. Keys render as strings (the
    * rollup label must coexist with them); `__other` always ranks last.
    */
  def paretoReport(df: DataFrame, keyCol: String, k: Int, valueCol: String = null,
                   otherLabel: String = "__other"): DataFrame = {
    require(k > 0, s"paretoReport: k must be positive, got $k")
    val m = if (valueCol == null) count(lit(1)).cast("double")
            else sum(col(valueCol).cast("double"))
    val counts = df.groupBy(col(keyCol)).agg(m.as("measure"))
    // a genuine category whose string value equals otherLabel would be
    // indistinguishable from the rollup row (and mis-ranked as the tail) —
    // reject loudly. Checked with a pushed-down filter + isEmpty (limit-1
    // short-circuit) on the RAW frame, not an aggregate: the one eager job
    // this costs reads almost nothing when the scan supports pushdown
    // (round-6 ADVICE + review)
    require(df.filter(col(keyCol).cast("string") === otherLabel).isEmpty,
      s"paretoReport: a key value equals otherLabel '$otherLabel' — pass a " +
        "non-colliding otherLabel")
    val top = counts.orderBy(col("measure").desc, col(keyCol).asc).limit(k)
    // null-safe anti join: a NULL key can be a top category, and the bare
    // USING anti-join would keep it in the tail too (null never equals
    // null), double-counting it
    val rest = counts.join(top.select(col(keyCol).as("__tk")),
        col(keyCol) <=> col("__tk"), "left_anti")
      .agg(coalesce(sum(col("measure")), lit(0.0)).as("measure"))
      .select(lit(otherLabel).as(keyCol), col("measure"))
      // =!= 0, not > 0: a NEGATIVE tail (negative measures are legal for
      // sum) must stay in the report or `share` stops summing to 1 over
      // the grand total; only a truly empty tail drops out (round-6 ADVICE)
      .filter(col("measure") =!= 0)
    val unioned = top.select(col(keyCol).cast("string").as(keyCol), col("measure"))
      .unionByName(rest)
    // coalesce: a NULL key is a real category (cast to null string), not
    // the other-bucket — a bare === would rank it null-first regardless
    // of measure
    val isOther = coalesce((col(keyCol) === otherLabel).cast("int"), lit(0))
    val w = Window.orderBy(isOther.asc, col("measure").desc, col(keyCol).asc)
    unioned
      .withColumn("share", col("measure") / sum(col("measure")).over(Window.partitionBy()))
      .withColumn("rank", row_number().over(w))
  }

  /** Arbitrary GROUPING SETS aggregation — the general form rollup/cube
    * (pivotWithSubtotals, crossTab margins) are special cases of: the
    * caller names exactly which grouping combinations to materialize, and
    * all of them compute in ONE pass over the data (Catalyst expands the
    * sets into a single Expand + aggregate — no per-set rescans, the
    * reason GROUPING SETS exists at scale). Grouped-out cells take
    * `rollupLabel` (pivotWithSubtotals' convention) and `grouping_id` is
    * the documented bitmask output (bit order = `columns` order).
    */
  def groupingSetsAgg(
      df: DataFrame,
      sets: Seq[Seq[String]],
      aggs: Seq[(String, String)],
      rollupLabel: String = "TOTAL"
  ): DataFrame = {
    require(sets.nonEmpty, "groupingSetsAgg: need at least one grouping set")
    require(aggs.nonEmpty, "groupingSetsAgg: need at least one aggregation")
    val keys = sets.flatten.distinct
    val aggExprs = aggs.map { case (c, fn) => Relational.aggExpr(fn, c).as(s"${fn}_$c") }
    val gCols = keys.map(k => grouping(col(k)).as(s"__g_$k"))
    val grouped = df.groupingSets(sets.map(_.map(col)), keys.map(col): _*)
      .agg(aggExprs.head, (aggExprs.tail ++ gCols :+ grouping_id().as("grouping_id")): _*)
    val labeled = keys.foldLeft(grouped) { (d, k) =>
      d.withColumn(k, when(col(s"__g_$k") === 1, lit(rollupLabel)).otherwise(col(k)))
    }
    labeled.drop(keys.map(k => s"__g_$k"): _*)
  }

  /** dynamic_pivot (pivot_operations.py:284-339): data-driven columns with a
    * prefix separator. Spark's pivot is inherently dynamic; the prefix is a
    * rename pass.
    */
  def dynamicPivot(
      df: DataFrame,
      index: Seq[String],
      pivotCol: String,
      valueCol: String,
      aggFunc: String = "sum",
      prefix: String = ""
  ): DataFrame = {
    val out = df.groupBy(index.map(col): _*).pivot(pivotCol).agg(Relational.aggExpr(aggFunc, valueCol))
    if (prefix.isEmpty) out
    else out.columns.filterNot(index.contains).foldLeft(out)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))
  }

  /** conditional_pivot (pivot_operations.py:341-387): filter, then pivot. */
  def conditionalPivot(
      df: DataFrame,
      condition: String,
      index: Seq[String],
      pivotCol: String,
      valueCol: String,
      aggFunc: String = "sum"
  ): DataFrame =
    df.filter(expr(condition)).groupBy(index.map(col): _*).pivot(pivotCol).agg(Relational.aggExpr(aggFunc, valueCol))

  /** time_based_pivot (pivot_operations.py:389-435): pandas `to_period(freq)`
    * becomes `date_trunc(freq, ts)` as the pivot key.
    */
  def timeBasedPivot(
      df: DataFrame,
      index: Seq[String],
      timeCol: String,
      freq: String, // year | quarter | month | week | day | hour
      valueCol: String,
      aggFunc: String = "sum"
  ): DataFrame = {
    // the label must be as fine as the truncation: a bare date pattern
    // collapses all 24 hourly buckets of a day into one pivot column
    val fmt = freq.toLowerCase match {
      case "hour"   => "yyyy-MM-dd HH"
      case "minute" => "yyyy-MM-dd HH:mm"
      case _        => "yyyy-MM-dd"
    }
    df.withColumn("__period", date_format(date_trunc(freq, col(timeCol)), fmt))
      .groupBy(index.map(col): _*)
      .pivot("__period")
      .agg(Relational.aggExpr(aggFunc, valueCol))
  }

  /** pivot_summary_stats (pivot_operations.py:437-477): count/avg/stddev/min/max
    * per pivot value in one pass.
    */
  def pivotSummaryStats(df: DataFrame, index: Seq[String], pivotCol: String, valueCol: String,
                        pivotValues: Seq[Any] = Nil): DataFrame = {
    val g = df.groupBy(index.map(col): _*)
    val p = if (pivotValues.nonEmpty) g.pivot(pivotCol, pivotValues) else g.pivot(pivotCol)
    p.agg(
      count(col(valueCol)).as("count"),
      avg(col(valueCol)).as("avg"),
      stddev(col(valueCol)).as("stddev"),
      min(col(valueCol)).as("min"),
      max(col(valueCol)).as("max")
    )
  }
}
