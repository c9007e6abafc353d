package graft.core

import org.apache.spark.sql.DataFrame
import graft.ops.Relational

/** Typed operation AST — graft's replacement for the reference's
  * `{type, params}` dict list (core/pipeline.py:226-232,
  * processors/spark_processor.py:45-82).
  *
  * The reference *interprets* the list eagerly, materializing a frame per op.
  * Graft *compiles* the list into one `DataFrame => DataFrame`, so Catalyst
  * optimizes across op boundaries and nothing executes until the sink action.
  */
sealed trait OpSpec

object OpSpec {
  final case class FilterCondition(condition: String)                               extends OpSpec
  final case class FilterColumn(column: String, op: String, value: Any)             extends OpSpec
  final case class Select(columns: Seq[String] = Nil, exclude: Seq[String] = Nil)   extends OpSpec
  final case class Rename(mapping: Map[String, String])                             extends OpSpec
  final case class Cast(mapping: Map[String, String])                               extends OpSpec
  final case class FillNull(column: String, method: String = "value", value: Any = null,
                            orderBy: Seq[String] = Nil, partitionBy: Seq[String] = Nil) extends OpSpec
  final case class Calculate(column: String, expression: String)                    extends OpSpec
  final case class ExtractDateParts(column: String, year: Boolean = true, month: Boolean = true,
                                    day: Boolean = true, weekday: Boolean = false)  extends OpSpec
  final case class RegexExtract(column: String, pattern: String, groupIdx: Int = 1) extends OpSpec
  final case class StringOperation(column: String, operation: String,
                                   oldValue: String = null, newValue: String = null) extends OpSpec
  final case class Aggregate(groupBy: Seq[String] = Nil, aggregations: Seq[(String, String)] = Nil) extends OpSpec
  final case class Join(rightTable: String, on: Seq[String] = Nil, condition: String = null,
                        joinType: String = "inner", broadcastRight: Boolean = false) extends OpSpec
  final case class Sort(columns: Seq[String], ascending: Seq[Boolean] = Nil)        extends OpSpec
  final case class Limit(n: Int)                                                    extends OpSpec
  final case class Sample(fraction: Double, seed: Long = 42L)                       extends OpSpec
  final case class Deduplicate(subset: Seq[String] = Nil, orderBy: Seq[String] = Nil,
                               keep: String = "first")                              extends OpSpec
  final case class Clean(operations: Seq[String],
                         nullLiterals: Seq[String] = Relational.DefaultNullLiterals) extends OpSpec
  final case class Pivot(groupCols: Seq[String], pivotCol: String, valueCol: String,
                         aggFunc: String = "sum", pivotValues: Seq[Any] = Nil)      extends OpSpec
  final case class Melt(idVars: Seq[String], valueVars: Seq[String],
                        varName: String = "variable", valueName: String = "value")  extends OpSpec
  final case class WindowOp(partitionBy: Seq[String], orderBy: Seq[(String, Boolean)],
                            functions: Seq[WindowFuncSpec],
                            rowsBetween: Option[(Long, Long)] = None,
                            rangeBetween: Option[(Long, Long)] = None)              extends OpSpec
  final case class CustomSql(query: String, tempViewName: String = "temp_table")    extends OpSpec
  /** Ordered sub-list (one YAML transform block can expand to several ops). */
  final case class Sequence(ops: Seq[OpSpec])                                       extends OpSpec
  /** The op types the reference's YAMLs declare but never dispatch — wired
    * here to the library implementations (SURVEY §2.A gap note). Params stay
    * dynamic (config-shaped); see OpCompiler.applyFeatureEngineering /
    * applyTimeSeries for the accepted keys.
    */
  final case class FeatureEngineering(params: Map[String, Any])                     extends OpSpec
  final case class TimeSeriesProcessing(params: Map[String, Any])                   extends OpSpec
  /** Training-data text ops (beyond-reference surface) as first-class
    * pipeline citizens: dedup (exact / near), quality features & score,
    * language ID, token counts, chunking, Bloom blocklist exclusion.
    */
  final case class TextProcessing(params: Map[String, Any])                         extends OpSpec
  /** Multimodal media ops (beyond-reference surface): wrap binary payloads,
    * REAL ImageIO decode/resize, REAL WAV decode/trim (AudioSystem), frame
    * sampling, and the video/compressed-audio stub featurizer — see
    * graft.multimodal.Multimodal.
    */
  final case class MultimodalOp(params: Map[String, Any])                           extends OpSpec
  /** Quality monitoring as a pipeline step (utils/quality_monitor.py:133-340):
    * replaces the frame with the metrics relation (emit: metrics, default)
    * or the WARN/FAIL alert relation (emit: alerts).
    */
  final case class QualityMonitorOp(params: Map[String, Any])                       extends OpSpec
  /** SCD Type-2 dimension maintenance (graft.ops.Scd): operation=init turns
    * the frame into an open-version dimension; operation=apply merges the
    * change batch in `updates_table` into the frame (the dimension).
    */
  final case class Scd2Op(params: Map[String, Any])                                 extends OpSpec
  /** Write-side layout (graft.sources.Layout): operation=zorder_key adds the
    * Morton key; operation=cluster range-partitions + sorts by it (the
    * write-ready multi-dimensional clustering).
    */
  final case class LayoutOp(params: Map[String, Any])                               extends OpSpec
  /** Inline expectation gate (ecommerce_pipeline.yaml:28-39 `validate` op):
    * rows satisfying `expression` must be ≥ min_ratio, else the pipeline
    * fails. NOTE: this is an action (it counts), by design — validation is a
    * barrier in the reference lifecycle too (pipeline.py:234-256).
    */
  final case class Validate(params: Map[String, Any])                               extends OpSpec
  /** In-run result cache (reference performance/cache.py:98-256; SURVEY §4
    * scopes CROSS-run caching out — `df.persist` is the Spark-native
    * in-run equivalent). `storageLevel` is any
    * `org.apache.spark.storage.StorageLevel.fromString` name
    * (MEMORY_ONLY, MEMORY_AND_DISK, DISK_ONLY, ..._SER, ..._2, NONE).
    * Pipeline.execute unpersists every cache-op frame when the run ends,
    * success or failure — the op marks a reuse point, it must not leak
    * executor storage past its run.
    */
  final case class CacheOp(storageLevel: String = "MEMORY_AND_DISK")                 extends OpSpec

  /** One window-function application inside a WindowOp
    * (spark_processor.py:244-263 function specs). */
  final case class WindowFuncSpec(funcType: String, column: String = null,
                                  alias: String = null, offset: Int = 1,
                                  default: Any = null, n: Int = 1,
                                  minPeriods: Int = 1)
}

/** Compile an op list into a single lazy transformation. `tables` resolves
  * join right-hand sides by name (the reference passes materialized frames;
  * graft passes a catalog function so joins stay lazy too).
  */
object OpCompiler {
  import OpSpec._

  def compile(ops: Seq[OpSpec], tables: String => DataFrame = null): DataFrame => DataFrame =
    compile(ops, tables, null)

  /** `caches` (when non-null) collects every frame a CacheOp persisted so
    * the caller — Pipeline.execute — can unpersist them when the run ends;
    * without it a cache op still works but its lifetime is the session's. */
  def compile(ops: Seq[OpSpec], tables: String => DataFrame,
              caches: scala.collection.mutable.Buffer[DataFrame]): DataFrame => DataFrame =
    df => ops.foldLeft(df)((d, op) => applyOp(d, op, tables, caches))

  /** One stage of an attrition report (round 11, VERDICT r10 #5): rows and
    * (when the declared weight column exists at that point of the chain)
    * weight entering and leaving stage `stage` (1-based; `op` is the
    * OpSpec's class name). */
  final case class StageAttrition(stage: Int, op: String,
                                  rowsIn: Long, rowsOut: Long,
                                  weightIn: Option[Long], weightOut: Option[Long]) {
    def rowsDropped: Long = rowsIn - rowsOut
  }

  /** Compile an op list WITH stage-attrition accounting: a
    * `Dataset.observe` node (count + optional weight sum) is threaded
    * before the first op and after every op, so the per-stage in/out
    * counts ride the SAME action that executes the chain — zero extra
    * corpus passes, the `observe()` production shape. Returns the
    * instrumented output frame and a `report()` thunk valid after ONE
    * action has executed on (a descendant of) that frame; the report is a
    * |ops|-row driver-local frame (stage, op, rows_in, rows_out,
    * rows_dropped, weight_in, weight_out).
    *
    * `weightCol` (e.g. tokens/chars) is summed as a long wherever the
    * column exists in the schema at that stage boundary — stages that drop
    * or have not yet created it report a null weight, never an error.
    */
  def compileObserved(ops: Seq[OpSpec], tables: String => DataFrame,
                      caches: scala.collection.mutable.Buffer[DataFrame],
                      weightCol: Option[String])(
      df: DataFrame): (DataFrame, () => Seq[StageAttrition]) = {
    import org.apache.spark.sql.functions._
    val observations = scala.collection.mutable.ArrayBuffer.empty[
      (org.apache.spark.sql.Observation, Boolean)] // (obs, hasWeight)
    def instrument(d: DataFrame): DataFrame = {
      val obs = org.apache.spark.sql.Observation()
      val withW = weightCol.filter(d.columns.contains)
      observations += ((obs, withW.isDefined))
      withW match {
        case Some(w) => d.observe(obs, count(lit(1)).as("rows"),
          sum(col(w).cast("long")).as("weight"))
        case None    => d.observe(obs, count(lit(1)).as("rows"))
      }
    }
    val out = ops.foldLeft(instrument(df))((d, op) =>
      instrument(applyOp(d, op, tables, caches)))
    val report = () => {
      val vals: Seq[(Long, Option[Long])] = observations.toSeq.map { case (obs, hasW) =>
        val row = org.apache.spark.sql.GraftColumnBridge.observationRow(obs)
          .getOrElse(throw new IllegalStateException(
          "attrition report requested before any action executed the instrumented chain"))
        val rows = row.getLong(row.fieldIndex("rows"))
        val weight =
          if (!hasW) None
          else {
            val i = row.fieldIndex("weight")
            if (row.isNullAt(i)) None else Some(row.getLong(i))
          }
        (rows, weight)
      }
      ops.zipWithIndex.map { case (op, i) =>
        StageAttrition(i + 1, op.getClass.getSimpleName,
          vals(i)._1, vals(i + 1)._1, vals(i)._2, vals(i + 1)._2)
      }
    }
    (out, report)
  }

  def applyOp(df: DataFrame, op: OpSpec, tables: String => DataFrame = null,
              caches: scala.collection.mutable.Buffer[DataFrame] = null): DataFrame = op match {
    case FilterCondition(c)            => Relational.filterCondition(df, c)
    case FilterColumn(c, o, v)         => Relational.filterColumn(df, c, o, v)
    case Select(cols, excl)            => Relational.select(df, cols, excl)
    case Rename(m)                     => Relational.rename(df, m)
    case Cast(m)                       => Relational.cast(df, m)
    case FillNull(c, m, v, ob, pb)     => Relational.fillNull(df, c, m, v, ob, pb)
    case Calculate(c, e)               => Relational.calculate(df, c, e)
    case ExtractDateParts(c, y, m, d, w) => Relational.extractDateParts(df, c, y, m, d, w)
    case RegexExtract(c, p, g)         => Relational.regexExtract(df, c, p, g)
    case StringOperation(c, o, ov, nv) => Relational.stringOperation(df, c, o, ov, nv)
    case Aggregate(g, a)               => Relational.aggregate(df, g, a)
    case Join(rt, on, cond, jt, bc)    =>
      require(tables != null, "Join op requires a table catalog")
      Relational.join(df, tables(rt), on, cond, jt, bc)
    case Sort(c, a)                    => Relational.sort(df, c, a)
    case Limit(n)                      => df.limit(n)
    case Sample(f, seed)               => df.sample(withReplacement = false, f, seed)
    case Deduplicate(s, o, k)          => Relational.deduplicate(df, s, o, k)
    case Clean(ops2, nulls)            => Relational.clean(df, ops2, nulls)
    case Pivot(g, p, v, f, pv)         => Relational.pivot(df, g, p, v, f, pv)
    case Melt(id, vv, vn, valn)        => Relational.melt(df, id, vv, vn, valn)
    case w: WindowOp                   => graft.functions.WindowLib.applyWindowOp(df, w)
    case CustomSql(q, tv)              => Relational.customSql(df, q, tv)
    case CacheOp(level)                =>
      val sl = try org.apache.spark.storage.StorageLevel.fromString(level.trim.toUpperCase) catch {
        case _: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"cache op: unknown storage_level '$level' (use MEMORY_ONLY, MEMORY_AND_DISK, DISK_ONLY, ..._SER, ..._2, NONE)")
      }
      val cached = df.persist(sl)
      if (caches != null) caches += cached
      cached
    case Sequence(ops2)                => ops2.foldLeft(df)((d, o) => applyOp(d, o, tables, caches))
    case FeatureEngineering(p)         => applyFeatureEngineering(df, p)
    case TimeSeriesProcessing(p)       => applyTimeSeries(df, p)
    case Validate(p)                   => applyValidate(df, p)
    case TextProcessing(p)             => applyTextProcessing(df, p, tables)
    case MultimodalOp(p)               => applyMultimodal(df, p)
    case QualityMonitorOp(p)           => applyQualityMonitor(df, p)
    case Scd2Op(p)                     =>
      val keys = seqOf(p, "keys"); val tracked = seqOf(p, "tracked")
      val ts = s(p, "ts_col", "ts")
      s(p, "operation", "apply") match {
        case "init"  => graft.ops.Scd.scd2Init(df, keys, tracked, ts)
        case "apply" => graft.ops.Scd.scd2Apply(df, tables(s(p, "updates_table")),
          keys, tracked, ts, seqOf(p, "order_by"))
        case "cdc_apply" => // Type-1 CDC merge: df = snapshot, changes from catalog
          graft.ops.Scd.applyCdc(df, tables(s(p, "changes_table")), keys,
            s(p, "op_col", "op"), s(p, "seq_col", "seq"))
        case other   => throw new IllegalArgumentException(s"Unknown scd2 operation: $other")
      }
    case LayoutOp(p)                   =>
      val cols = seqOf(p, "columns"); val bits = s(p, "bits", "8").toInt
      s(p, "operation", "zorder_key") match {
        case "zorder_key" => graft.sources.Layout.addZOrderKey(df, cols, bits,
          s(p, "key_col", "zkey"))
        case "cluster"    => graft.sources.Layout.clusterByZOrder(df, cols, bits,
          s(p, "partitions", "0").toInt, s(p, "key_col", "zkey"))
        case other        => throw new IllegalArgumentException(s"Unknown layout operation: $other")
      }
  }

  // ------------------------------------------------- dynamic-param dispatch

  private def s(p: Map[String, Any], k: String, dflt: String = null): String =
    p.get(k).map(_.toString).getOrElse(dflt)

  private def seqOf(p: Map[String, Any], k: String): Seq[String] = p.get(k) match {
    case Some(l: java.util.List[_])            => scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.map(_.toString).toSeq
    case Some(l: Seq[_])                       => l.map(_.toString)
    case Some(v)                               => Seq(v.toString)
    case None                                  => Nil
  }

  private def intSeq(p: Map[String, Any], k: String): Seq[Int] = seqOf(p, k).map(_.toInt)

  /** Prototype centroid ids from `centroid_ids` — accepts a YAML list OR
    * a comma string, via seqOf's element-wise list handling (an earlier
    * draft read the param through s(), which stringifies a java List to
    * "[0, 10]" and the bracketed ids silently matched nothing — a
    * round-12 review catch). Empty = no pinning (Lloyd fit).
    */
  private def centroidIds(p: Map[String, Any]): Seq[String] =
    seqOf(p, "centroid_ids").flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Prototype centroids for proto_prune / d4_select: a `loadPath` wins
    * outright (YESTERDAY'S FIT — the fit-once/apply-everywhere discipline
    * of langid/ppl/dsir/pq, VERDICT r12 #5); else non-empty `ids` pins
    * the centroids to data rows (matched as strings, ordered by id) —
    * deterministic AND replayable by a plain SQL oracle; else a
    * hash-gated id-sorted driver-Lloyd fit on the frame (the
    * Prototypes.protoFit protocol). A non-null `savePath` persists
    * whatever was fitted/pinned for tomorrow (the pq_encode
    * model_path/save_model_path pattern).
    */
  private def protoCentroidsFor(df: org.apache.spark.sql.DataFrame, ids: Seq[String],
                                idCol: String, vecCol: String,
                                k: Int, seed: Long, maxTrainRows: Int,
                                loadPath: String = null,
                                savePath: String = null): Array[Array[Double]] = {
    import org.apache.spark.sql.functions.col
    if (loadPath != null) return graft.vec.Prototypes.loadCentroids(df.sparkSession, loadPath)
    val cents =
      if (ids.nonEmpty) {
        val rows = df.filter(col(idCol).cast("string").isin(ids: _*))
          .orderBy(col(idCol)).select(col(vecCol)).collect()
        require(rows.length == ids.distinct.length,
          s"proto centroids: ${ids.distinct.length} ids given, ${rows.length} rows matched (${ids.mkString(",")})")
        rows.map(_.getSeq[Any](0).map {
          case f: java.lang.Float => f.toDouble
          case n: java.lang.Number => n.doubleValue()
        }.toArray)
      } else graft.vec.Prototypes.protoFit(df, idCol, vecCol, k, seed, maxTrainRows)
    if (savePath != null) graft.vec.Prototypes.saveCentroids(df.sparkSession, cents, savePath)
    cents
  }

  private def pairs(p: Map[String, Any], k: String): Seq[(String, String)] = p.get(k) match {
    case Some(m: java.util.Map[_, _]) =>
      scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toSeq.flatMap {
        case (c, fns: java.util.List[_]) =>
          scala.jdk.CollectionConverters.ListHasAsScala(fns).asScala.map(f => c.toString -> f.toString)
        case (c, f) => Seq(c.toString -> f.toString)
      }
    case Some(m: Map[_, _]) => m.toSeq.map { case (c, f) => c.toString -> f.toString }
    case _                  => Nil
  }

  /** feature_engineering op (iot_pipeline.yaml:22-44 shape): `operation`
    * selects the FeatureLib member.
    */
  private def applyFeatureEngineering(df: DataFrame, p: Map[String, Any]): DataFrame = {
    import graft.functions.FeatureLib
    s(p, "operation", "ratio") match {
      case "ratio" =>
        FeatureLib.ratioFeature(df, s(p, "name"), s(p, "numerator"), s(p, "denominator"),
          s(p, "div_by_zero", "null"))
      case "interactions" =>
        FeatureLib.interactionFeatures(df, seqOf(p, "columns"), s(p, "op", "multiply"),
          s(p, "max_interactions", "20").toInt)
      case "polynomial" =>
        FeatureLib.polynomialFeatures(df, seqOf(p, "columns"), s(p, "degree", "2").toInt,
          s(p, "interaction_only", "false").toBoolean)
      case "binning" =>
        val c = s(p, "column"); val bins = s(p, "bins", "10").toInt
        s(p, "method", "uniform") match {
          case "uniform"  => FeatureLib.binUniform(df, c, bins)
          case "quantile" => FeatureLib.binQuantile(df, c, bins)
          case "kmeans"   => FeatureLib.binKmeans(df, c, bins)
          case "quantile_grouped" =>
            // per-group cuts (CCNet-style head/middle/tail when labels given)
            FeatureLib.binQuantileGrouped(df, c, bins, seqOf(p, "group_by"),
              outCol = s(p, "output_column"),
              labels = { val l = seqOf(p, "labels"); if (l.isEmpty) null else l })
          case m => throw new IllegalArgumentException(s"Unknown binning method: $m")
        }
      case "onehot"    => FeatureLib.encodeOneHot(df, s(p, "column"), seqOf(p, "values"))
      case "frequency" => FeatureLib.encodeFrequency(df, s(p, "column"))
      case "label"     => FeatureLib.encodeLabel(df, s(p, "column"))
      case "target" =>
        FeatureLib.encodeTarget(df, s(p, "column"), s(p, "target_column"),
          s(p, "smoothing", "20.0").toDouble)
      case "scaling" =>
        FeatureLib.scaleFeatures(df, seqOf(p, "columns"), s(p, "method", "zscore"),
          seqOf(p, "group_by"))
      case "winsorize" =>
        FeatureLib.winsorize(df, s(p, "column"), s(p, "lower", "0.05").toDouble,
          s(p, "upper", "0.95").toDouble, seqOf(p, "group_by"))
      case "aggregation" =>
        FeatureLib.aggregationFeatures(df, seqOf(p, "group_by"), pairs(p, "aggregations"))
      case "text_stats" => FeatureLib.textBasicStats(df, s(p, "column"))
      case "top_keywords" =>
        FeatureLib.textTopKeywords(df, s(p, "column", "text"), s(p, "id_column", "doc_id"),
          s(p, "k", "5").toInt, s(p, "vocab_size", "1000").toInt)
      case "clustering" => // reference create_clustering_features: kmeans | dbscan
        s(p, "algorithm", "kmeans") match {
          case "kmeans" =>
            FeatureLib.clusteringFeatures(df, seqOf(p, "columns"), s(p, "n_clusters", "5").toInt)
          case "dbscan" =>
            graft.functions.Dbscan.clusteringFeaturesDbscan(df, seqOf(p, "columns"),
              s(p, "eps", "0.5").toDouble, s(p, "min_samples", "5").toInt, s(p, "id_column", "id"))
          case a => throw new IllegalArgumentException(s"Unknown clustering algorithm: $a")
        }
      case other => throw new IllegalArgumentException(s"Unknown feature_engineering operation: $other")
    }
  }

  /** time_series_processing / windowed_aggregation ops
    * (finance_pipeline.yaml:26-35, streaming_pipeline.yaml:45-63 shapes).
    */
  private def applyTimeSeries(df: DataFrame, p: Map[String, Any]): DataFrame = {
    import graft.functions.TimeSeriesLib
    val ts = Option(s(p, "time_column")).getOrElse(s(p, "ts_col", "ts"))
    val keys = seqOf(p, "keys") ++ seqOf(p, "group_by")
    s(p, "operation", "resample") match {
      case "resample" =>
        val aggs = { val a = pairs(p, "aggregations"); if (a.nonEmpty) a else Seq(s(p, "value_column", "value") -> "avg") }
        TimeSeriesLib.resample(df, ts, s(p, "window_size", s(p, "freq", "1 hour")), aggs, keys)
      case "resample_grid" =>
        TimeSeriesLib.resampleWithGrid(df, ts, s(p, "freq", "1 hour"), pairs(p, "aggregations"),
          keys, s(p, "fill", "none"))
      case "rolling" =>
        TimeSeriesLib.rollingStats(df, s(p, "column"), s(p, "window", "5").toInt,
          seqOf(p, "stats"), s(p, "order_by", ts), keys, s(p, "min_periods", "1").toInt)
      case "lags" =>
        TimeSeriesLib.calculateLags(df, s(p, "column"), intSeq(p, "lags"), s(p, "order_by", ts), keys)
      case "differences" =>
        TimeSeriesLib.calculateDifferences(df, s(p, "column"), intSeq(p, "periods"), s(p, "order_by", ts), keys)
      case "fill_missing" =>
        TimeSeriesLib.fillMissing(df, s(p, "column"), s(p, "method", "ffill"), s(p, "order_by", ts),
          keys, p.getOrElse("value", null))
      case "outliers" =>
        TimeSeriesLib.flagOutliers(df, s(p, "column"), s(p, "method", "zscore"),
          s(p, "threshold", "3.0").toDouble, keys, s(p, "order_by", ts), s(p, "window", "20").toInt)
      case "time_features" => TimeSeriesLib.timeFeatures(df, ts)
      case "trend" =>
        TimeSeriesLib.trendFeatures(df, s(p, "column"), s(p, "order_by", ts), keys)
      case "twap" =>
        require(keys.nonEmpty, "twap requires keys/group_by (the entity key)")
        TimeSeriesLib.timeWeightedAvg(df, s(p, "column", "value"), ts, keys,
          seqOf(p, "order_by"))
      case "volume_anomalies" =>
        TimeSeriesLib.volumeAnomalies(df, ts, s(p, "period", "day"), keys,
          s(p, "threshold", "3.5").toDouble)
      case "interarrival" =>
        require(keys.nonEmpty, "interarrival requires keys/group_by (the entity key)")
        // scalable=true: segmented-pair gaps + mergeable approx median —
        // the bot-dominated-log variant (exact median needs every gap of a
        // key in one buffer; see interArrivalStats' scaladoc)
        if (s(p, "scalable", "false").toBoolean)
          TimeSeriesLib.interArrivalStatsScalable(df, ts, keys, seqOf(p, "order_by"),
            s(p, "accuracy", "10000").toInt)
        else TimeSeriesLib.interArrivalStats(df, ts, keys, seqOf(p, "order_by"))
      case "transitions" =>
        require(seqOf(p, "order_by").nonEmpty && keys.nonEmpty,
          "transitions requires params.order_by (total per-entity order) and keys/group_by")
        TimeSeriesLib.transitionMatrix(df, s(p, "state_column", "event_type"),
          seqOf(p, "order_by"), keys)
      case "trending" =>
        require(s(p, "item_column") != null, "trending requires params.item_column")
        TimeSeriesLib.trendingTopK(df, ts, s(p, "item_column"),
          s(p, "k", "10").toInt, s(p, "period", "day"))
      case "active_users" =>
        require(s(p, "user_column") != null, "active_users requires params.user_column")
        TimeSeriesLib.activeUsers(df, s(p, "user_column"), ts, intSeq(p, "windows") match {
          case Nil => Seq(7, 28); case ws => ws
        })
      case "cohort_retention" =>
        require(s(p, "user_column") != null,
          "cohort_retention requires params.user_column")
        TimeSeriesLib.cohortRetention(df, s(p, "user_column"), ts, s(p, "period", "week"))
      case "funnel" =>
        require(s(p, "user_column") != null && seqOf(p, "steps").nonEmpty,
          "funnel requires params.user_column and params.steps (ordered step values)")
        TimeSeriesLib.funnel(df, s(p, "user_column"), ts,
          s(p, "step_column", "event_type"), seqOf(p, "steps"))
      case "smooth" =>
        s(p, "method", "moving_average") match {
          case "moving_average" =>
            TimeSeriesLib.smoothMovingAverage(df, s(p, "column"), s(p, "window", "5").toInt,
              s(p, "order_by", ts), keys)
          case "exponential" =>
            TimeSeriesLib.smoothEwm(df, s(p, "column"), s(p, "alpha", "0.3").toDouble,
              s(p, "order_by", ts), keys)
          case "savgol" =>
            TimeSeriesLib.smoothSavgol(df, s(p, "column"), s(p, "window", "7").toInt,
              s(p, "polyorder", "2").toInt, s(p, "order_by", ts), keys)
        }
      case "changepoints" =>
        TimeSeriesLib.detectChangepoints(df, s(p, "column"), s(p, "window", "10").toInt,
          s(p, "order_by", ts), keys)
      case "decompose" =>
        TimeSeriesLib.seasonalDecompose(df, s(p, "column"), s(p, "period", "24").toInt,
          s(p, "order_by", ts), keys, s(p, "model", "additive"))
      case "sessionize" =>
        TimeSeriesLib.sessionize(df, ts, s(p, "gap_seconds", "1800").toLong, keys,
          s(p, "session_col", "session_id"))
      case "session_stats" =>
        TimeSeriesLib.sessionStats(df, ts, s(p, "gap_seconds", "1800").toLong, keys,
          pairs(p, "aggregations"))
      case other => throw new IllegalArgumentException(s"Unknown time_series operation: $other")
    }
  }

  /** Inline `validate` op: throws when an expectation's pass ratio is below
    * its min_ratio (this is deliberately an action — see OpSpec.Validate).
    */
  /** text_processing op: training-data ops dispatched by `operation`.
    * Column params default to the documents-table shape (text / doc_id).
    */
  private def applyTextProcessing(df: DataFrame, p: Map[String, Any],
                                  tables: String => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import graft.text.{Dedup, TextLib}
    val text = s(p, "text_column", "text")
    val id = s(p, "id_column", "doc_id")
    s(p, "operation") match {
      case "exact_dedup" =>
        val qc = s(p, "quality_column")
        if (qc == null) Dedup.exact(df, text, id)
        else Dedup.exactKeepBest(df, text, id, qc)
      case "near_dedup" =>
        // bands omitted → derived from the threshold via pickLshParams
        // (state the dedup threshold, get the S-curve-optimal LSH shape);
        // an explicit bands: still wins
        val ndHashes = s(p, "num_hashes", "64").toInt
        val ndThreshold = s(p, "threshold", "0.8").toDouble
        val ndBands = Dedup.bandsFor(ndHashes, ndThreshold, Option(s(p, "bands")).map(_.toInt))
        val qc = s(p, "quality_column")
        if (qc == null)
          Dedup.nearDedup(df, text, id,
            s(p, "shingle_n", "3").toInt, ndHashes,
            ndBands, ndThreshold,
            s(p, "max_bucket_size", "1000").toInt)
        else // keep-best survivor election (round 11) — exact_dedup parity
          Dedup.nearDedupKeepBest(df, text, id, qc,
            s(p, "shingle_n", "3").toInt, ndHashes,
            ndBands, ndThreshold,
            s(p, "max_bucket_size", "1000").toInt)
      case "fuzzy_pairs" => // edit-distance self-join (replaces the frame with pairs)
        graft.text.Fuzzy.fuzzyPairs(df, id, text,
          s(p, "max_dist", "2").toInt, s(p, "q", "2").toInt,
          s(p, "max_gram_df", Long.MaxValue.toString).toLong)
      case "quality_features" => TextLib.qualityFeatures(df, text)
      case "quality_score"    => TextLib.qualityScore(df, text)
      case "rpv2_extras" => // RPV2 residual signals: native unigram
        // entropy, lorem-ipsum ratio, curly-bracket ratio
        TextLib.rpv2Extras(df, text)
      case "soft_dedup" => // reweight-instead-of-drop exact dedup
        TextLib.softDedupWeights(df, text)
      case "fix_mojibake" => // ftfy-style one-layer encoding repair, in place
        df.withColumn(text, TextLib.fixMojibake(col(text)))
      case "seen_corpus_apply" => // flag/drop against a FROZEN corpus bloom
        require(s(p, "bloom_path") != null,
          "seen_corpus_apply requires params.bloom_path (written by Dedup.saveSeenBloom)")
        val flagged = Dedup.seenCorpusApply(df, text,
          Dedup.loadSeenBloom(df.sparkSession, s(p, "bloom_path")))
        if (s(p, "drop", "false").toBoolean)
          flagged.filter(!col("maybe_seen")).drop("maybe_seen")
        else flagged
      case "repetition_signals" => // Gopher A1.1 repetition fractions
        TextLib.repetitionSignals(df, text, id,
          s(p, "top_n", "2").toInt, s(p, "dup_n", "5").toInt)
      case "deflate_ratio" => // compression-ratio quality signal
        df.withColumn(s(p, "output_column", "deflate_ratio"),
          graft.expr.DeflateRatio(col(text)))
      case "lang_id"          => TextLib.langId(df, text)
      case "lang_id_apply" => // classify against a FROZEN char-n-gram model
        require(s(p, "model_path") != null,
          "lang_id_apply requires params.model_path (written by TextLib.saveLangIdModel)")
        TextLib.langIdApply(df, text,
          TextLib.loadLangIdModel(df.sparkSession, s(p, "model_path")),
          s(p, "output_column", "lang_pred"))
      case "token_counts" =>
        df.withColumn(s(p, "output_column", "n_tokens"), TextLib.tokenCountWs(col(text)))
      case "chunk" =>
        TextLib.chunkDocuments(df, text,
          s(p, "chunk_size", "512").toInt, s(p, "overlap", "64").toInt)
      case "fingerprint" =>
        df.withColumn(s(p, "output_column", "fingerprint"),
          TextLib.fingerprint(col(text), s(p, "shingle_n", "3").toInt))
      case "readability" => // Flesch reading-ease + word/sentence/syllable counts
        TextLib.readability(df, text)
      case "kwic" => // keyword-in-context occurrences with ±window tokens
        require(s(p, "term") != null, "kwic requires params.term (the keyword to locate)")
        TextLib.keywordInContext(df, text, id, s(p, "term"),
          s(p, "window", "5").toInt)
      case "pseudonymize" => // salted sha2 tokenization of identifier columns
        require(seqOf(p, "columns").nonEmpty && s(p, "salt") != null,
          "pseudonymize requires params.columns and params.salt")
        graft.functions.CleanLib.pseudonymize(df, seqOf(p, "columns"), s(p, "salt"))
      case "consolidate_values" => // fold typo-splintered categoricals onto the frequent canonical
        require(s(p, "column") != null, "consolidate_values requires params.column")
        graft.text.Fuzzy.consolidateValues(df, s(p, "column"),
          s(p, "max_dist", "2").toInt, s(p, "output_column"))
      case "redact_pii" =>
        df.withColumn(text, TextLib.redactPii(col(text),
          s(p, "email_token", "<EMAIL>"), s(p, "phone_token", "<PHONE>"), s(p, "ip_token", "<IP>")))
      case "repetition_ratio" =>
        df.withColumn(s(p, "output_column", "repetition_ratio"),
          TextLib.repetitionRatio(col(text), s(p, "shingle_n", "3").toInt))
      case "normalize_unicode" =>
        df.withColumn(text, TextLib.normalizeUnicode(col(text), s(p, "form", "NFC")))
      case "html_to_text" => // strip tags/scripts, decode entities, keep paragraphs
        df.withColumn(s(p, "output_column", text), TextLib.htmlToText(col(text)))
      case "pack" =>
        TextLib.packDocuments(df, text, s(p, "budget_tokens", "1024").toInt,
          s(p, "partition_by", "lang").split(",").map(_.trim).toSeq,
          s(p, "order_by", id).split(",").map(_.trim).toSeq)
      case "pack_concat" =>
        require(df.columns.contains("pack_id") && df.columns.contains("pack_offset"),
          "pack_concat requires pack_id/pack_offset columns — run a `pack` op first")
        TextLib.materializePacks(df, text,
          s(p, "partition_by", "lang").split(",").map(_.trim).toSeq,
          s(p, "separator", "\n\n"))
      case "sample_hash" =>
        graft.ops.Scale.sampleByHash(df, s(p, "key_column", id),
          s(p, "fraction").toDouble, s(p, "salt", "42").toInt)
      case "sample_weighted" =>
        require(s(p, "weight_column") != null,
          "sample_weighted requires params.weight_column (e.g. a quality or length score)")
        require(s(p, "k") != null, "sample_weighted requires params.k (rows kept)")
        graft.ops.Scale.weightedSample(df, s(p, "weight_column"), s(p, "key_column", id),
          s(p, "k").toInt, seqOf(p, "group_by"), s(p, "salt", "42").toInt)
      case "sample_budget" =>
        require(s(p, "group_column") != null,
          "sample_budget requires params.group_column (e.g. the domain/source column)")
        require(s(p, "budget") != null,
          "sample_budget requires params.budget (target weight kept per group)")
        // YAML "3e9" arrives as a Double rendering ("3.0E9") — accept both
        // integer and float spellings of the budget
        val budgetStr = s(p, "budget")
        val budget = try budgetStr.toLong catch {
          case _: NumberFormatException => budgetStr.toDouble.toLong
        }
        graft.ops.Scale.sampleToBudget(df, s(p, "weight_column", "n_tokens"),
          s(p, "group_column"), s(p, "key_column", id),
          budget, s(p, "salt", "42").toInt)
      case "decontaminate" =>
        require(tables != null, "decontaminate requires a table catalog")
        require(s(p, "eval_table") != null,
          "decontaminate requires params.eval_table (name of the held-out eval suite table)")
        graft.text.Contamination.decontaminate(df, text, id,
          tables(s(p, "eval_table")),
          s(p, "eval_text_column", text), s(p, "eval_id_column", id),
          s(p, "ngram_n", "8").toInt, s(p, "min_overlap", "1").toInt)
      case "semantic_contamination" =>
        require(tables != null, "semantic_contamination requires a table catalog")
        require(s(p, "eval_table") != null,
          "semantic_contamination requires params.eval_table (name of the held-out eval suite table)")
        graft.text.Contamination.semanticContamination(df, id,
          s(p, "vector_column", "embedding"),
          tables(s(p, "eval_table")),
          s(p, "eval_id_column", id),
          s(p, "eval_vector_column", s(p, "vector_column", "embedding")),
          s(p, "threshold", "0.95").toDouble)
      case "bm25_search" =>
        require(tables != null, "bm25_search requires a table catalog")
        require(s(p, "query_table") != null,
          "bm25_search requires params.query_table (the small query/probe table)")
        graft.text.Search.bm25TopK(df, text, id,
          tables(s(p, "query_table")),
          s(p, "query_id_column", "query_id"), s(p, "query_text_column", "query_text"),
          s(p, "k", "10").toInt, s(p, "k1", "1.2").toDouble, s(p, "b", "0.75").toDouble)
      case "quota_per_group" =>
        require(s(p, "group_column") != null,
          "quota_per_group requires params.group_column (e.g. the domain/source column)")
        require(s(p, "quota") != null,
          "quota_per_group requires params.quota (max rows kept per group)")
        graft.ops.Scale.quotaPerGroup(df, s(p, "group_column"), s(p, "key_column", id),
          s(p, "quota").toInt, preBuckets = s(p, "pre_buckets", "64").toInt)
      case "assign_split" =>
        val labels = seqOf(p, "labels")
        val weights = seqOf(p, "weights").map(_.toDouble)
        require(labels.nonEmpty && labels.length == weights.length,
          "assign_split requires params.labels and params.weights of equal length")
        Option(s(p, "clusters_table")) match {
          case Some(ct) => // leakage-safe: gate on the duplicate-cluster key
            require(tables != null, "assign_split with clusters_table requires a table catalog")
            graft.ops.Scale.assignSplitLeakageSafe(df, s(p, "key_column", id),
              tables(ct), labels.zip(weights),
              s(p, "salt", "42").toInt, s(p, "output_column", "split"))
          case None =>
            graft.ops.Scale.assignSplit(df, s(p, "key_column", id), labels.zip(weights),
              s(p, "salt", "42").toInt, s(p, "output_column", "split"))
        }
      case "repeat_epochs" =>
        require(s(p, "group_column") != null,
          "repeat_epochs requires params.group_column (the mixture/domain column)")
        val eps = p.get("epochs") match {
          case Some(m: java.util.Map[_, _]) =>
            scala.jdk.CollectionConverters.MapHasAsScala(m).asScala
              .map { case (k, v) => k.toString -> v.toString.toDouble }.toMap
          case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString.toDouble }
          case _ => throw new IllegalArgumentException(
            "repeat_epochs requires params.epochs (a {group: epoch-count} mapping)")
        }
        graft.ops.Scale.repeatEpochs(df, s(p, "group_column"), s(p, "key_column", id),
          eps, s(p, "salt", "42").toInt)
      case "sample_temperature" =>
        require(s(p, "group_column") != null,
          "sample_temperature requires params.group_column (the mixture/domain column)")
        require(s(p, "total_rows") != null,
          "sample_temperature requires params.total_rows (approximate kept-row target)")
        graft.ops.Scale.temperatureSample(df, s(p, "group_column"), s(p, "key_column", id),
          s(p, "alpha", "0.5").toDouble, s(p, "total_rows").toDouble.toLong,
          s(p, "salt", "42").toInt)
      case "dedup_lines" =>
        // within-document repeated-line removal (keep-first; short lines
        // exempt so blank-line paragraph breaks survive)
        TextLib.dedupLines(df, text, s(p, "min_chars", "1").toInt)
      case "c4_rules" =>
        // audit mode: rewritten text + c4_n_lines_kept/c4_n_sentences/c4_keep
        TextLib.c4Rules(df, text,
          s(p, "min_words_per_line", "3").toInt, s(p, "min_sentences", "5").toInt,
          seqOf(p, "badwords"))
      case "c4_filter" =>
        // the gate applied: survivors only, audit columns dropped (same
        // param-parity discipline as gopher_rules/gopher_filter)
        TextLib.c4Rules(df, text,
          s(p, "min_words_per_line", "3").toInt, s(p, "min_sentences", "5").toInt,
          seqOf(p, "badwords"))
          .filter(col("c4_keep"))
          .drop("c4_n_lines_kept", "c4_n_sentences", "c4_keep")
      case "gopher_rules" =>
        // audit mode: per-rule booleans + gopher_keep + gopher_fail_reasons.
        // With lang_column (round 12): the two anglocentric rules dispatch
        // per language (unknown lang → neutral); min_alpha_ratio/
        // min_stopwords override the floors uniformly across languages
        // (ADVICE r12 — previously silently ignored under lang dispatch).
        if (s(p, "lang_column") != null)
          TextLib.gopherRulesByLang(df, text, s(p, "lang_column"),
            TextLib.gopherLangParamsWithFloors(
              s(p, "min_alpha_ratio", "0.8").toDouble, s(p, "min_stopwords", "2").toInt),
            s(p, "min_words", "50").toInt, s(p, "max_words", "100000").toInt,
            s(p, "min_mean_word_len", "3.0").toDouble, s(p, "max_mean_word_len", "10.0").toDouble,
            s(p, "max_symbol_ratio", "0.1").toDouble, s(p, "max_bullet_ratio", "0.9").toDouble,
            s(p, "max_ellipsis_ratio", "0.3").toDouble)
        else TextLib.gopherRules(df, text,
          s(p, "min_words", "50").toInt, s(p, "max_words", "100000").toInt,
          s(p, "min_mean_word_len", "3.0").toDouble, s(p, "max_mean_word_len", "10.0").toDouble,
          s(p, "max_symbol_ratio", "0.1").toDouble, s(p, "max_bullet_ratio", "0.9").toDouble,
          s(p, "max_ellipsis_ratio", "0.3").toDouble, s(p, "min_alpha_ratio", "0.8").toDouble,
          s(p, "min_stopwords", "2").toInt)
      case "gopher_filter" =>
        // the gate applied: survivors only, audit columns dropped. The
        // threshold parsing deliberately REPEATS gopher_rules' above —
        // OpsDocSpec mechanically pins both case arms to identical param
        // lists (the doc generator reads each arm's source), so a missed
        // edit in one arm fails the build instead of gating silently
        // differently in audit vs filter mode.
        (if (s(p, "lang_column") != null)
          TextLib.gopherRulesByLang(df, text, s(p, "lang_column"),
            TextLib.gopherLangParamsWithFloors(
              s(p, "min_alpha_ratio", "0.8").toDouble, s(p, "min_stopwords", "2").toInt),
            s(p, "min_words", "50").toInt, s(p, "max_words", "100000").toInt,
            s(p, "min_mean_word_len", "3.0").toDouble, s(p, "max_mean_word_len", "10.0").toDouble,
            s(p, "max_symbol_ratio", "0.1").toDouble, s(p, "max_bullet_ratio", "0.9").toDouble,
            s(p, "max_ellipsis_ratio", "0.3").toDouble)
        else TextLib.gopherRules(df, text,
          s(p, "min_words", "50").toInt, s(p, "max_words", "100000").toInt,
          s(p, "min_mean_word_len", "3.0").toDouble, s(p, "max_mean_word_len", "10.0").toDouble,
          s(p, "max_symbol_ratio", "0.1").toDouble, s(p, "max_bullet_ratio", "0.9").toDouble,
          s(p, "max_ellipsis_ratio", "0.3").toDouble, s(p, "min_alpha_ratio", "0.8").toDouble,
          s(p, "min_stopwords", "2").toInt))
          .filter(col("gopher_keep"))
          .drop("gopher_word_count_ok", "gopher_mean_word_len_ok", "gopher_symbol_ratio_ok",
            "gopher_bullet_lines_ok", "gopher_ellipsis_lines_ok", "gopher_alpha_words_ok",
            "gopher_stopwords_ok", "gopher_keep", "gopher_fail_reasons")
      case "unimax_sample" =>
        require(s(p, "group_column") != null,
          "unimax_sample requires params.group_column (the language/domain column)")
        require(s(p, "weight_column") != null,
          "unimax_sample requires params.weight_column (chars/tokens per row)")
        require(s(p, "budget") != null,
          "unimax_sample requires params.budget (total weight units to allocate)")
        val uxBudgetStr = s(p, "budget")
        val uxBudget = try uxBudgetStr.toLong catch {
          case _: NumberFormatException => uxBudgetStr.toDouble.toLong
        }
        graft.ops.Scale.unimaxSample(df, s(p, "group_column"), s(p, "weight_column"),
          s(p, "key_column", id), uxBudget,
          s(p, "max_epochs", "4.0").toDouble, s(p, "salt", "42").toInt)
      case "unimax_apply" =>
        require(s(p, "allocation_path") != null,
          "unimax_apply requires params.allocation_path (a saved unimaxAllocation parquet)")
        graft.ops.Scale.unimaxApply(df,
          df.sparkSession.read.parquet(s(p, "allocation_path")),
          s(p, "group_column", "lang"), s(p, "key_column", id), s(p, "salt", "42").toInt)
      case "shard_assign" =>
        require(s(p, "num_shards") != null,
          "shard_assign requires params.num_shards (number of output shards)")
        graft.ops.Scale.shardAssign(df, s(p, "key_column", id),
          s(p, "num_shards").toInt, s(p, "salt", "42").toInt)
      case "length_histogram" =>
        TextLib.lengthHistogram(df, s(p, "length_column", "n_chars"))
      case "token_divergence" =>
        require(tables != null, "token_divergence requires a table catalog")
        require(s(p, "other_table") != null,
          "token_divergence requires params.other_table (corpus to compare against)")
        TextLib.tokenDivergence(df, text,
          tables(s(p, "other_table")), s(p, "other_text_column", text),
          s(p, "smoothing", "0.5").toDouble)
      case "psi_drift" => // feature drift vs a reference snapshot
        require(tables != null, "psi_drift requires a table catalog")
        require(s(p, "reference_table") != null,
          "psi_drift requires params.reference_table (the reference snapshot)")
        require(s(p, "value_column") != null,
          "psi_drift requires params.value_column (column to compare)")
        val refT = tables(s(p, "reference_table"))
        s(p, "kind", "numeric") match {
          case "numeric" => graft.quality.Profiler.psiBins(
            refT, df, s(p, "value_column"),
            s(p, "bins", "10").toInt, s(p, "epsilon", "1e-6").toDouble)
          case "categorical" => graft.quality.Profiler.psiCategorical(
            refT, df, s(p, "value_column"),
            s(p, "top_k", "20").toInt, s(p, "epsilon", "1e-6").toDouble)
          case other => throw new IllegalArgumentException(
            s"psi_drift kind must be numeric|categorical, got '$other'")
        }
      case "bpe_merges" =>
        graft.text.Bpe.mergesDF(df, text,
          s(p, "num_merges", "1000").toInt,
          s(p, "max_words", "1000000").toInt,
          s(p, "min_pair_count", "2").toLong)
      case "lm_score" =>
        val lmCorpus = s(p, "corpus_table")
        if (lmCorpus != null)
          require(tables != null, "lm_score with corpus_table requires a table catalog")
        TextLib.unigramScore(df, text, id,
          corpus = if (lmCorpus == null) null else tables(lmCorpus),
          corpusTextCol = s(p, "corpus_text_column", text),
          vocabSize = s(p, "vocab_size", "50000").toInt)
      case "lm_bigram_score" =>
        val lm2Corpus = s(p, "corpus_table")
        if (lm2Corpus != null)
          require(tables != null, "lm_bigram_score with corpus_table requires a table catalog")
        TextLib.bigramScore(df, text, id,
          corpus = if (lm2Corpus == null) null else tables(lm2Corpus),
          corpusTextCol = s(p, "corpus_text_column", text),
          vocabSize = s(p, "vocab_size", "50000").toInt,
          bigramSize = s(p, "bigram_size", "200000").toInt)
      case "script_profile" =>
        TextLib.scriptProfile(df, text)
      case "quality_classifier" =>
        val feats = seqOf(p, "feature_columns")
        require(feats.nonEmpty,
          "quality_classifier requires params.feature_columns (numeric feature list)")
        val labelCol = s(p, "label_column")
        val signal = s(p, "signal_column")
        require(labelCol != null || signal != null,
          "quality_classifier requires params.label_column (0/1 labels) or " +
            "params.signal_column (pseudo-label from a ranking signal)")
        val labeled =
          if (labelCol != null) df
          else graft.quality.QualityClassifier.pseudoLabelByQuantile(df, signal,
            s(p, "lo_quantile", "0.3").toDouble, s(p, "hi_quantile", "0.7").toDouble)
        val m = graft.quality.QualityClassifier.train(labeled,
          Option(labelCol).getOrElse("quality_label"), feats,
          s(p, "max_iter", "50").toInt, s(p, "reg_param", "0.01").toDouble)
        graft.quality.QualityClassifier.score(labeled, m,
          s(p, "output_column", "quality_prob"))
      case "winnow" =>
        df.withColumn(s(p, "output_column", "fingerprints"),
          TextLib.winnowFingerprint(col(text),
            s(p, "gram_tokens", "5").toInt, s(p, "window", "4").toInt))
      case "url_canonicalize" => // canonical + host + registered-domain cols
        graft.text.UrlLib.withUrlColumns(df, s(p, "url_column", "url"),
          s(p, "prefix", "url"))
      case "url_dedup" => // keep-first per canonical URL
        graft.text.UrlLib.dedupByUrl(df, s(p, "url_column", "url"), id)
      case "para_dedup" =>
        Dedup.paragraphDedup(df, text, id,
          s(p, "separator", "\n\n"), s(p, "min_chars", "1").toInt)
      case "dup_spans" =>
        Dedup.duplicateSpans(df, text, id,
          s(p, "gram_tokens", "5").toInt, s(p, "min_count", "2").toInt)
      case "cut_dup_spans" => // ExactSubstr CUT: rewrite texts, keep-first canonical span
        Dedup.cutDuplicateSpans(df, text, id,
          s(p, "gram_tokens", "5").toInt, s(p, "min_count", "2").toInt)
      case "cut_contaminated" => // surgical span decontamination vs an eval corpus
        require(tables != null, "cut_contaminated requires a table catalog")
        require(s(p, "eval_table") != null,
          "cut_contaminated requires params.eval_table (the benchmark/eval corpus)")
        graft.text.Contamination.cutContaminatedSpans(df, text, id,
          tables(s(p, "eval_table")), s(p, "eval_text_column", text),
          s(p, "gram_tokens", "8").toInt)
      case "dsir_weights" => // DSIR importance log-weights vs a target corpus (Xie 2023)
        require(tables != null, "dsir_weights requires a table catalog")
        require(s(p, "target_table") != null,
          "dsir_weights requires params.target_table (the target-distribution corpus)")
        val target = tables(s(p, "target_table"))
          .withColumnRenamed(s(p, "target_text_column", text), text)
        val ns = { val o = intSeq(p, "gram_orders"); if (o.isEmpty) Seq(1, 2) else o }
        val buckets = s(p, "hashed_buckets", "0").toInt
        if (buckets > 0)
          graft.text.Dsir.logWeightsHashed(df, target, text, id, ns,
            s(p, "alpha", "1.0").toDouble, buckets)
        else graft.text.Dsir.logWeights(df, target, text, id, ns,
          s(p, "alpha", "1.0").toDouble)
      case "dsir_select" => // the paper's resampling step: k docs ∝ exp(weight)
        require(tables != null, "dsir_select requires a table catalog")
        require(s(p, "target_table") != null,
          "dsir_select requires params.target_table (the target-distribution corpus)")
        require(s(p, "k") != null, "dsir_select requires params.k (sample size)")
        val target = tables(s(p, "target_table"))
          .withColumnRenamed(s(p, "target_text_column", text), text)
        val ns = { val o = intSeq(p, "gram_orders"); if (o.isEmpty) Seq(1, 2) else o }
        graft.text.Dsir.select(df, target, text, id, s(p, "k").toInt, ns,
          s(p, "alpha", "1.0").toDouble, s(p, "hashed_buckets", "0").toInt,
          s(p, "salt", "42").toInt)
      case "ppl_apply" => // gate against a FROZEN CCNet model (pplFit + savePplModel)
        require(s(p, "model_path") != null,
          "ppl_apply requires params.model_path (written by TextLib.savePplModel)")
        TextLib.pplApply(df, text,
          TextLib.loadPplModel(df.sparkSession, s(p, "model_path")))
      case "dsir_apply" => // score against a FROZEN hashed DSIR model (pure map)
        require(s(p, "model_path") != null,
          "dsir_apply requires params.model_path (written by Dsir.saveModel)")
        val ns = { val o = intSeq(p, "gram_orders"); if (o.isEmpty) Seq(1, 2) else o }
        graft.text.Dsir.applyHashed(df, text,
          graft.text.Dsir.loadModel(df.sparkSession, s(p, "model_path")), ns)
      case "perplexity_buckets" => // CCNet head/middle/tail per group
        val corpusTable = s(p, "corpus_table")
        val corpus = if (corpusTable == null) null else {
          require(tables != null, "perplexity_buckets with corpus_table requires a table catalog")
          tables(corpusTable)
        }
        TextLib.perplexityBuckets(df, text, id,
          seqOf(p, "group_columns"), s(p, "n_buckets", "3").toInt,
          corpus, s(p, "corpus_text_column", text),
          s(p, "vocab_size", "50000").toInt)
      case "snapshot_diff" =>
        require(tables != null, "snapshot_diff requires a table catalog")
        require(s(p, "old_table") != null,
          "snapshot_diff requires params.old_table (the previous snapshot; the primary frame is the new one)")
        Dedup.snapshotDiff(tables(s(p, "old_table")), df, id, text)
      case "dedup_against" =>
        require(tables != null, "dedup_against requires a table catalog")
        require(s(p, "corpus_table") != null,
          "dedup_against requires params.corpus_table (name of the accepted-snapshot table)")
        Dedup.dedupAgainstCorpus(df, text,
          tables(s(p, "corpus_table")), s(p, "corpus_text_column", text),
          s(p, "fpp", "0.001").toDouble,
          s(p, "expected_batch_rows", "-1").toLong)
      case "near_dedup_against" =>
        // incremental NEAR-dup: drop batch rows whose MinHash-estimated
        // Jaccard against any accepted-snapshot doc reaches the threshold
        // (dedup_against's exact-hash sibling; ref signatures scale with
        // the snapshot ONCE, the join with the batch)
        require(tables != null, "near_dedup_against requires a table catalog")
        require(s(p, "corpus_table") != null,
          "near_dedup_against requires params.corpus_table (name of the accepted-snapshot table)")
        // column-name parity with dedup_against: a snapshot whose text/id
        // columns are named differently maps them here (round-6 review)
        val snapshot = tables(s(p, "corpus_table"))
          .withColumnRenamed(s(p, "corpus_text_column", text), text)
          .withColumnRenamed(s(p, "corpus_id_column", id), id)
        val naHashes = s(p, "num_hashes", "64").toInt
        val naThreshold = s(p, "threshold", "0.8").toDouble
        val dupIds = Dedup.minhashCandidatesAgainst(df, snapshot,
            text, id,
            s(p, "shingle_n", "3").toInt, naHashes,
            Dedup.bandsFor(naHashes, naThreshold, Option(s(p, "bands")).map(_.toInt)),
            naThreshold)
          .select(col("new_id").as(id)).distinct()
        df.join(dupIds, Seq(id), "left_anti")
      case "mmr_select" =>
        // diversify a bounded retrieval candidate frame (per-query lists)
        graft.text.Search.mmrSelect(df, s(p, "query_id_column", "query_id"), id,
          s(p, "relevance_column", "relevance"), s(p, "vector_column", "embedding"),
          s(p, "k", "10").toInt, s(p, "lambda", "0.5").toDouble)
      case "rrf_fuse" =>
        // hybrid-retrieval fusion: the primary frame is the first ranked
        // list; params.lists names further lists in the table catalog
        require(tables != null || seqOf(p, "lists").isEmpty,
          "rrf_fuse with params.lists requires a table catalog")
        graft.text.Search.rrfFuse(df +: seqOf(p, "lists").map(tables),
          s(p, "query_id_column", "query_id"), id,
          s(p, "rank_column", "rank"),
          s(p, "k_rrf", "60").toInt, s(p, "k", "10").toInt)
      case "quantize_int8" =>
        graft.vec.VectorOps.quantizeInt8(df, s(p, "vector_column", "embedding"),
          s(p, "output_column", "q"), s(p, "scale_column", "q_scale"))
      case "l2_normalize" =>
        graft.vec.VectorOps.l2Normalize(df, s(p, "vector_column", "embedding"),
          s(p, "output_column", "unit"))
      case "embed_meanpool" => // chunk→doc pooling: weighted positional
        // mean per group (+ optional renorm); REPLACES the frame with one
        // row per group
        require(seqOf(p, "group_by").nonEmpty,
          "embed_meanpool requires params.group_by (key columns)")
        graft.vec.VectorOps.meanPool(df, seqOf(p, "group_by"),
          s(p, "vector_column", "embedding"), s(p, "output_column", "pooled"),
          Option(s(p, "weight_column")), s(p, "renorm", "false").toBoolean)
      case "mrl_truncate" => // Matryoshka prefix truncation + renorm
        require(s(p, "dims") != null, "mrl_truncate requires params.dims")
        graft.vec.VectorOps.truncateRenorm(df, s(p, "vector_column", "embedding"),
          s(p, "dims").toInt, s(p, "output_column", "trunc"))
      case "semantic_dedup" => // SemDeDup: embedding-space dedup, one survivor/group
        graft.vec.SemDedup.semanticDedup(df, s(p, "id_column", "vec_id"),
          s(p, "vector_column", "embedding"),
          threshold = s(p, "threshold", "0.95").toDouble,
          nClusters = s(p, "n_clusters", "64").toInt,
          keep = s(p, "keep", "far_from_centroid"))
      case "proto_prune" => // SSL prototypes (Sorscher et al. 2022): drop
        // the most-prototypical prune_fraction of every embedding cluster
        // (keep the hard tail). centroid_ids pins centroids to data rows
        // (the oracle-replayable path); otherwise a deterministic Lloyd
        // fit on the incoming frame (k/seed/max_train_rows).
        val ppVec = s(p, "vector_column", "embedding")
        val ppId = s(p, "id_column", "vec_id")
        graft.vec.Prototypes.protoApply(df, ppId, ppVec,
          protoCentroidsFor(df, centroidIds(p), ppId, ppVec,
            s(p, "k", "64").toInt, s(p, "seed", "42").toLong,
            s(p, "max_train_rows", "100000").toInt,
            s(p, "centroids_path"), s(p, "save_centroids_path")),
          s(p, "prune_fraction", "0.3").toDouble)
      case "d4_select" => // D4 (Tirumala et al. 2023): SemDeDup, then
        // prototype-prune the survivors; centroids resolve AFTER the
        // semantic stage (the paper re-clusters deduped data — duplicate
        // mass must not drag centroids toward itself)
        val d4Vec = s(p, "vector_column", "embedding")
        val d4Id = s(p, "id_column", "vec_id")
        val d4Surv = graft.vec.SemDedup.semanticDedup(df, d4Id, d4Vec,
          threshold = s(p, "threshold", "0.95").toDouble,
          nClusters = s(p, "n_clusters", "64").toInt,
          keep = s(p, "keep", "far_from_centroid"))
        graft.vec.Prototypes.protoApply(d4Surv, d4Id, d4Vec,
          protoCentroidsFor(d4Surv, centroidIds(p), d4Id, d4Vec,
            s(p, "k", "64").toInt, s(p, "seed", "42").toLong,
            s(p, "max_train_rows", "100000").toInt,
            s(p, "centroids_path"), s(p, "save_centroids_path")),
          s(p, "prune_fraction", "0.3").toDouble)
      case "semantic_gate" => // frozen semantic gate (round 13): batch
        // counterpart of the stream transform — audit mode adds
        // sem_cell/sem_max_cos/sem_dup against a saved accepted-corpus
        // model; pair with a filter op (or use the stream form) to gate.
        // Commissioning (round 14, VERDICT r13 #6 — the pq_encode
        // model_path/save_model_path discipline): model_path loads
        // YESTERDAY'S fit; without it the op fits on `accepted_table`
        // (a catalog table holding the frozen accepted corpus — NEVER
        // the incoming frame itself, whose every row would gate itself
        // out at cosine 1.0) and save_model_path persists the result
        // for tomorrow's batch runs and the stream transform.
        val sgModel = Option(s(p, "model_path")) match {
          case Some(mp) => graft.vec.SemGate.loadSemGate(df.sparkSession, mp)
          case None =>
            require(tables != null && s(p, "accepted_table") != null,
              "semantic_gate requires params.model_path (a saved " +
                "SemGate.saveSemGate directory) or params.accepted_table " +
                "(catalog table with the frozen accepted corpus) to fit")
            val m = graft.vec.SemGate.semGateFit(
              tables(s(p, "accepted_table")),
              s(p, "id_column", "vec_id"), s(p, "vector_column", "embedding"),
              nCells = s(p, "n_cells", "16").toInt,
              seed = s(p, "seed", "42").toLong,
              maxTrainRows = s(p, "max_train_rows", "100000").toInt,
              maxReps = s(p, "max_reps", "1000000").toInt,
              centroids = Option(s(p, "centroids_path"))
                .map(graft.vec.Prototypes.loadCentroids(df.sparkSession, _)).orNull)
            Option(s(p, "save_model_path"))
              .foreach(graft.vec.SemGate.saveSemGate(df.sparkSession, m, _))
            m
        }
        graft.vec.SemGate.semGateApply(df, s(p, "vector_column", "embedding"),
          sgModel, s(p, "threshold", "0.95").toDouble)
      case "pq_encode" => // encode with a stored model, or train-on-the-frame
        // model_path: ENCODE WITH YESTERDAY'S CODEBOOK (appendable index);
        // without it the op trains on the incoming frame (deterministic)
        // and save_model_path optionally persists the result for tomorrow
        val model = Option(s(p, "model_path")) match {
          case Some(mp) => graft.vec.Pq.loadModel(df.sparkSession, mp)
          case None =>
            val m = graft.vec.Pq.train(df, s(p, "vector_column", "embedding"),
              s(p, "id_column", "vec_id"), m = s(p, "m", "8").toInt,
              nbits = s(p, "nbits", "8").toInt, seed = s(p, "seed", "42").toLong)
            Option(s(p, "save_model_path"))
              .foreach(graft.vec.Pq.saveModel(df.sparkSession, m, _))
            m
        }
        graft.vec.Pq.encode(df, s(p, "vector_column", "embedding"), model,
          s(p, "output_column", "pq_code"))
      case "bloom_exclude" =>
        require(tables != null, "bloom_exclude requires a table catalog")
        require(s(p, "blocklist_table") != null,
          "bloom_exclude requires params.blocklist_table (name of a catalog table)")
        require(s(p, "blocklist_key") != null,
          "bloom_exclude requires params.blocklist_key (key column in the blocklist table)")
        graft.ops.Scale.excludeKeysBloom(df, s(p, "key_column", id),
          tables(s(p, "blocklist_table")), s(p, "blocklist_key"),
          s(p, "fpp", "0.01").toDouble)
      case other => throw new IllegalArgumentException(s"Unknown text_processing operation: $other")
    }
  }

  private def applyValidate(df: DataFrame, p: Map[String, Any]): DataFrame = {
    import org.apache.spark.sql.functions._
    val exps: Seq[(String, Double)] = p.get("expectations") match {
      case Some(l: java.util.List[_]) =>
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq.map {
          case m: java.util.Map[_, _] =>
            val mm = scala.jdk.CollectionConverters.MapHasAsScala(m).asScala
              .map { case (k, v) => k.toString -> v }.toMap
            (mm("expression").toString, mm.get("min_ratio").map(_.toString.toDouble).getOrElse(1.0))
        }
      case _ => Seq((s(p, "expression"), s(p, "min_ratio", "1.0").toDouble))
    }
    // No persist: caching here would pin a cache entry for the session's
    // lifetime (nothing downstream can know to unpersist it). The price is
    // one extra upstream computation when the pipeline later materializes —
    // same trade Pipeline.execute's validation stage makes; callers who
    // want reuse should persist upstream explicitly.
    val aggs = exps.zipWithIndex.map { case ((e, _), i) =>
      avg(when(expr(e), 1.0).otherwise(0.0)).as(s"r$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    exps.zipWithIndex.foreach { case ((e, minR), i) =>
      val ratio = if (row.isNullAt(i)) 1.0 else row.getDouble(i)
      require(ratio >= minR, f"validation failed: '$e' pass ratio $ratio%.4f < $minR")
    }
    df
  }

  /** multimodal op: media-column ops dispatched by `operation`. */
  private def applyMultimodal(df: DataFrame, p: Map[String, Any]): DataFrame = {
    import graft.multimodal.Multimodal
    s(p, "operation") match {
      case "as_media" =>
        Multimodal.asMedia(df, s(p, "id_column", "doc_id"), s(p, "payload_column", "payload"),
          s(p, "format", "application/octet-stream"), s(p, "width", "0").toInt,
          s(p, "height", "0").toInt, s(p, "duration_ms", "0").toLong)
      case "decode_image_stats" =>
        Multimodal.decodeImageStats(df, s(p, "payload_column", "payload"),
          s(p, "output_column", "image_stats"), s(p, "batch_size", "256").toInt)
      case "resize_images" =>
        require(s(p, "width") != null && s(p, "height") != null,
          "multimodal resize_images requires params.width and params.height (target dims)")
        Multimodal.resizeImages(df, s(p, "width").toInt, s(p, "height").toInt,
          s(p, "batch_size", "256").toInt)
      case "image_dhash" => // REAL decode → perceptual 64-bit difference hash
        Multimodal.imageDHash(df, s(p, "payload_column", "payload"),
          s(p, "output_column", "dhash"), s(p, "batch_size", "256").toInt)
      case "image_neardup" => // Hamming-banded image near-dup pairs over a dhash column
        Multimodal.imageNearDupPairs(df, s(p, "id_column", "media_id"),
          s(p, "hash_column", "dhash"), s(p, "max_hamming", "3").toInt,
          s(p, "max_bucket_size", "1000").toInt)
      case "decode_audio_stats" =>
        Multimodal.decodeAudioStats(df, s(p, "payload_column", "payload"),
          s(p, "output_column", "audio_stats"), s(p, "batch_size", "256").toInt)
      case "trim_audio" =>
        Multimodal.trimAudio(df, s(p, "max_ms", "60000").toLong,
          s(p, "batch_size", "256").toInt)
      case "sample_gif_frames" => // REAL multi-frame decode (animated GIF)
        Multimodal.sampleGifFrames(df, s(p, "every_n", "1").toInt,
          s(p, "batch_size", "64").toInt)
      case "sample_frames" =>
        Multimodal.sampleFrames(df, s(p, "every_ms", "1000").toLong)
      case "decode_features_stub" => // video/compressed audio: no codec here
        Multimodal.decodeToFeatures(df, s(p, "payload_column", "payload"),
          s(p, "dim", "16").toInt, s(p, "output_column", "features"))
      case other => throw new IllegalArgumentException(s"Unknown multimodal operation: $other")
    }
  }

  /** quality_monitor op: replaces the frame with its metrics relation
    * (`emit: metrics`, default) or the WARN/FAIL alerts (`emit: alerts`).
    * `as_of` (any to_timestamp-parsable string) pins timeliness for
    * reproducible runs; `at_epoch` pins the alert ids.
    */
  private def applyQualityMonitor(df: DataFrame, p: Map[String, Any]): DataFrame = {
    import org.apache.spark.sql.functions.{current_timestamp, lit, to_timestamp}
    import graft.quality.QualityMonitor
    val asOf = Option(s(p, "as_of")).map(v => to_timestamp(lit(v))).getOrElse(current_timestamp())
    val metrics = QualityMonitor.runChecks(df, s(p, "table_name", "input"),
      QualityMonitor.defaultChecks(df), asOf)
    s(p, "emit", "metrics") match {
      case "metrics" => metrics
      case "alerts"  => QualityMonitor.alerts(metrics, s(p, "at_epoch", "0").toLong)
      case other     => throw new IllegalArgumentException(
        s"quality_monitor: emit must be metrics|alerts, got '$other'")
    }
  }
}
