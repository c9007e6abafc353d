package graft.core

import scala.jdk.CollectionConverters._
import java.{util => ju}

/** YAML pipeline config → typed model, mirroring the reference's config
  * surface (core/config.py:83-139, the shipped pipeline YAMLs): name, source,
  * operations[], validation, storage — with `${VAR:default}` environment
  * substitution (config.py:123-139).
  *
  * Parsed with SnakeYAML (ships with Spark) into the OpSpec AST, so the
  * whole pipeline compiles to ONE lazy Catalyst plan (§3.1 port note:
  * "the op compiler replaces the interpreter").
  *
  * Implements the union of the dispatched op surface AND the op types the
  * reference's shipped YAMLs declare but its dispatcher never handles
  * (SURVEY §2.A gap note): `feature_engineering`, `time_series_processing`,
  * `validate`, plus transform params `column_mappings` / `type_conversions` /
  * `calculated_columns` / `date_columns`.
  */
object PipelineConfig {

  final case class SourceConf(typ: String, path: String, options: Map[String, String], table: String)
  final case class StorageConf(typ: String, path: String, mode: String,
                               partitionBy: Seq[String], options: Map[String, String])
  final case class ExpectationConf(name: String, expression: String, minRatio: Double)
  /** `attrition:` block (round 11): per-stage rows/weight in-out
    * accounting via observe() — `weight_column` is summed wherever it
    * exists in the chain; `report_path` optionally persists the report as
    * parquet next to the run. */
  final case class AttritionConf(weightColumn: Option[String],
                                 reportPath: Option[String])

  final case class PipelineConf(
      name: String,
      sources: Seq[SourceConf],           // first = primary; others joinable by table name
      operations: Seq[OpSpec],
      expectations: Seq[ExpectationConf], // validation stage
      storage: Option[StorageConf],
      attrition: Option[AttritionConf] = None)

  /** `${VAR}` / `${VAR:default}` substitution (config.py:123-139). */
  def substituteEnv(raw: String, env: String => Option[String] = sys.env.get): String =
    "\\$\\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\\}".r.replaceAllIn(raw, m =>
      scala.util.matching.Regex.quoteReplacement(
        env(m.group(1)).orElse(Option(m.group(2))).getOrElse("")))

  def fromYaml(yaml: String): PipelineConf = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[ju.Map[String, AnyRef]](substituteEnv(yaml))
    fromMap(root.asScala.toMap)
  }

  // ------------------------------------------------------------- internals

  private def str(m: Map[String, Any], k: String, dflt: String = null): String =
    m.get(k).map(_.toString).getOrElse(dflt)

  private def strSeq(m: Map[String, Any], k: String): Seq[String] = m.get(k) match {
    case Some(l: ju.List[_]) => l.asScala.map(_.toString).toSeq
    case Some(s: String)     => Seq(s)
    case _                   => Nil
  }

  private def anySeq(m: Map[String, Any], k: String): Seq[Any] = m.get(k) match {
    case Some(l: ju.List[_]) => l.asScala.toSeq
    case Some(v)             => Seq(v)
    case _                   => Nil
  }

  private def subMap(v: Any): Map[String, Any] = v match {
    case m: ju.Map[_, _] => m.asScala.map { case (k, x) => k.toString -> (x: Any) }.toMap
    case _               => Map.empty
  }

  /** Order-preserving variant: SnakeYAML hands us LinkedHashMaps, but a
    * scala immutable Map loses declaration order past 4 entries — fatal for
    * transform chains where step N reads step N-1's output.
    */
  private def subMapOrdered(v: Any): Seq[(String, Any)] = v match {
    case m: ju.Map[_, _] => m.asScala.toSeq.map { case (k, x) => k.toString -> (x: Any) }
    case _               => Nil
  }

  private def fromMap(root: Map[String, Any]): PipelineConf = {
    val name = str(root, "name", "pipeline")
    val sources: Seq[SourceConf] = root.get("source").map(subMap).map(parseSource).toSeq ++
      (root.get("sources") match {
        case Some(l: ju.List[_]) => l.asScala.map(v => parseSource(subMap(v))).toSeq
        case _                   => Nil
      })
    val ops = root.get("operations") match {
      case Some(l: ju.List[_]) => l.asScala.map(v => parseOp(subMap(v))).toSeq
      case _                   => Nil
    }
    val expectations = root.get("validation").map(subMap).toSeq.flatMap { v =>
      v.get("expectations") match {
        case Some(l: ju.List[_]) => l.asScala.map { e =>
          val em = subMap(e)
          ExpectationConf(str(em, "name", str(em, "expression", "expectation")),
            str(em, "expression"), str(em, "min_ratio", "1.0").toDouble)
        }.toSeq
        case _ => Nil
      }
    }
    val storage = root.get("storage").map(subMap).map { s =>
      StorageConf(str(s, "type", "parquet"), str(s, "path"), str(s, "mode", "overwrite"),
        strSeq(s, "partition_by"),
        subMap(s.getOrElse("options", null)).map { case (k, v) => k -> v.toString })
    }
    val attrition = root.get("attrition").map(subMap).map { a =>
      AttritionConf(Option(str(a, "weight_column")), Option(str(a, "report_path")))
    }
    PipelineConf(name, sources, ops, expectations, storage, attrition)
  }

  private def parseSource(m: Map[String, Any]): SourceConf =
    SourceConf(str(m, "type", "parquet"), str(m, "path"),
      subMap(m.getOrElse("options", null)).map { case (k, v) => k -> v.toString },
      str(m, "table", "main"))

  private[graft] def parseOp(m: Map[String, Any]): OpSpec = {
    import OpSpec._
    val params = if (m.contains("params")) subMap(m("params")) else m
    str(m, "type") match {
      case "filter" =>
        if (params.contains("condition")) FilterCondition(str(params, "condition"))
        else FilterColumn(str(params, "column"), str(params, "operator", "=="), params.getOrElse("value", null))
      case "select" => Select(strSeq(params, "columns"), strSeq(params, "exclude"))
      case "transform" => parseTransform(params)
      case "aggregate" =>
        Aggregate(strSeq(params, "group_by"), parseAggregations(params.getOrElse("aggregations", null)))
      case "join" =>
        // `using` aliases `on`: bare `on:` is a YAML 1.1 BOOLEAN token, so
        // an unquoted `on: [k]` silently parses as key `true` and the join
        // "loses" its keys — accept the unambiguous spelling too
        val joinOn = { val o = strSeq(params, "on"); if (o.nonEmpty) o else strSeq(params, "using") }
        Join(str(params, "right_table"), joinOn, str(params, "condition"),
          str(params, "join_type", "inner"), str(params, "broadcast", "false").toBoolean)
      case "sort" =>
        val asc = params.get("ascending") match {
          case Some(l: ju.List[_]) => l.asScala.map(_.toString.toBoolean).toSeq
          case Some(b)             => Seq(b.toString.toBoolean)
          case None                => Nil
        }
        Sort(strSeq(params, "columns"), asc)
      case "limit"  => Limit(str(params, "n", "1000").toInt)
      case "sample" => Sample(str(params, "fraction", "0.1").toDouble, str(params, "seed", "42").toLong)
      case "deduplicate" =>
        Deduplicate(strSeq(params, "subset"), strSeq(params, "order_by"), str(params, "keep", "first"))
      case "clean" =>
        Clean(strSeq(params, "operations"))
      case "pivot" =>
        // pivot_values: declared pivot domain — skips the distinct pre-scan
        // and bounds output width (the SURVEY §7 scale knob)
        Pivot(strSeq(params, "group_cols"), str(params, "pivot_col"), str(params, "value_col"),
          str(params, "agg_func", "sum"), anySeq(params, "pivot_values"))
      case "melt" =>
        Melt(strSeq(params, "id_vars"), strSeq(params, "value_vars"),
          str(params, "var_name", "variable"), str(params, "value_name", "value"))
      case "window" => parseWindow(params)
      case "custom_sql" =>
        CustomSql(str(params, "query"), str(params, "temp_view_name", "temp_table"))
      case "feature_engineering"     => FeatureEngineering(params)
      case "time_series_processing"  => TimeSeriesProcessing(params)
      case "text_processing"         => TextProcessing(params)
      case "multimodal"              => MultimodalOp(params)
      case "quality_monitor"         => QualityMonitorOp(params)
      case "scd2"                    => Scd2Op(params)
      case "layout"                  => LayoutOp(params)
      case "windowed_aggregation"    => TimeSeriesProcessing(params + ("operation" -> "resample"))
      case "validate"                => Validate(params)
      // in-run result cache (performance/cache.py:98-256; "persist" is the
      // Spark-native spelling of the same op)
      case "cache"                   => CacheOp(str(params, "storage_level", "MEMORY_AND_DISK"))
      case "persist"                 => CacheOp(str(params, "storage_level", "MEMORY_AND_DISK"))
      case other => throw new IllegalArgumentException(s"Unknown operation type: $other")
    }
  }

  /** transform supports the dispatched shape (`transformations` map) AND the
    * declared-but-never-dispatched param spellings from the shipped YAMLs
    * (column_mappings / type_conversions / calculated_columns / date_columns,
    * ecommerce_pipeline.yaml:19-27).
    */
  private def parseTransform(params: Map[String, Any]): OpSpec = {
    import OpSpec._
    val steps = scala.collection.mutable.ArrayBuffer.empty[OpSpec]
    params.get("transformations").map(subMapOrdered).foreach { ts =>
      ts.foreach { case (column, conf) =>
        val cm = subMap(conf)
        val p = subMap(cm.getOrElse("params", null))
        steps += (str(cm, "type") match {
          case "rename"    => Rename(Map(column -> str(p, "new_name")))
          case "cast"      => Cast(Map(column -> str(p, "dtype")))
          case "fill_null" => FillNull(column, str(p, "method", "value"), p.getOrElse("value", null),
                                strSeq(p, "order_by"), strSeq(p, "partition_by"))
          case "calculate" => Calculate(column, str(p, "expression"))
          case "extract_date_parts" =>
            ExtractDateParts(column, p.get("year").forall(_.toString.toBoolean),
              p.get("month").forall(_.toString.toBoolean), p.get("day").forall(_.toString.toBoolean),
              p.get("weekday").exists(_.toString.toBoolean))
          case "regex_extract" => RegexExtract(column, str(p, "pattern"), str(p, "group_idx", "1").toInt)
          case "string_operations" =>
            StringOperation(column, str(p, "operation"), str(p, "old_value"), str(p, "new_value"))
          case other => throw new IllegalArgumentException(s"Unknown transform type: $other")
        })
      }
    }
    params.get("column_mappings").map(subMap).foreach { m2 =>
      steps += Rename(m2.map { case (k, v) => k -> v.toString })
    }
    params.get("type_conversions").map(subMap).foreach { m2 =>
      steps += Cast(m2.map { case (k, v) => k -> v.toString })
    }
    params.get("date_columns").foreach { v =>
      strSeq(Map("c" -> v), "c").foreach(c => steps += Cast(Map(c -> "timestamp")))
    }
    params.get("calculated_columns").map(subMapOrdered).foreach { m2 =>
      m2.foreach { case (colName, exprStr) => steps += Calculate(colName, exprStr.toString) }
    }
    if (steps.size == 1) steps.head else OpSpec.Sequence(steps.toSeq)
  }

  private def parseAggregations(v: Any): Seq[(String, String)] = subMap(v).toSeq.flatMap {
    case (c, fn: ju.List[_]) => fn.asScala.map(f => c -> f.toString)
    case (c, fn)             => Seq(c -> fn.toString)
  }

  private def parseWindow(params: Map[String, Any]): OpSpec = {
    import OpSpec._
    val spec = subMap(params.getOrElse("window_spec", null))
    val orderBy = strSeq(spec, "order_by").map(_ -> true)
    def frame(k: String): Option[(Long, Long)] = spec.get(k) match {
      case Some(l: ju.List[_]) if l.size == 2 =>
        Some((l.get(0).toString.toLong, l.get(1).toString.toLong))
      case _ => None
    }
    val fns = params.get("functions") match {
      case Some(l: ju.List[_]) => l.asScala.map { f =>
        val fm = subMap(f)
        WindowFuncSpec(str(fm, "type"), str(fm, "column"), str(fm, "alias"),
          str(fm, "offset", "1").toInt, fm.getOrElse("default", null), str(fm, "n", "1").toInt,
          str(fm, "min_periods", "1").toInt)
      }.toSeq
      case _ => Nil
    }
    WindowOp(strSeq(spec, "partition_by"), orderBy, fns, frame("rows_between"), frame("range_between"))
  }
}
