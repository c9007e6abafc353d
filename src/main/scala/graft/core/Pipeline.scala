package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Readers, Sinks}

/** Config-compiled pipeline runtime — the §3.1 lifecycle
  * (core/pipeline.py:187-285): load → process → validate → store, as ONE
  * lazy Catalyst plan up to the validation/storage actions. Errors are
  * collected into a result map exactly like the reference (:279-284).
  */
object Pipeline {

  final case class Result(
      name: String,
      status: String, // success | validation_failed | failed
      rowsWritten: Long,
      validation: Map[String, Double],
      errors: Seq[String],
      // per-stage rows/weight in-out when the YAML declared an `attrition:`
      // block (round 11) — populated from observe() metrics, zero extra
      // corpus passes
      attrition: Seq[OpCompiler.StageAttrition] = Nil)

  def fromYaml(yaml: String): PipelineConfig.PipelineConf = PipelineConfig.fromYaml(yaml)

  /** Load all declared sources; returns (primary frame, table catalog). */
  def load(spark: SparkSession, conf: PipelineConfig.PipelineConf): (DataFrame, String => DataFrame) = {
    require(conf.sources.nonEmpty, "pipeline needs at least one source")
    // make every named graft function available to expr()/custom_sql in
    // THIS pipeline's YAML — without this, the documented "callable from
    // pipeline config" contract only held for callers who registered
    // manually. All three are idempotent (create-or-replace).
    graft.expr.GraftFunctions.register(spark)
    graft.functions.CleanLib.registerUdfs(spark)
    graft.multimodal.Multimodal.registerUdfs(spark)
    // duplicate table names would last-wins-overwrite the primary frame in
    // the map below and silently run the pipeline on the wrong input
    val dupes = conf.sources.groupBy(_.table).collect { case (t, ss) if ss.size > 1 => t }
    require(dupes.isEmpty,
      s"duplicate source table name(s): ${dupes.mkString(", ")} — give each source a distinct `table:`")
    val frames: Map[String, DataFrame] = conf.sources.map { s =>
      val df = s.typ match {
        case "csv" =>
          Readers.csv(spark, s.path,
            header = s.options.getOrElse("header", "true").toBoolean,
            delimiter = s.options.getOrElse("delimiter", ","),
            encoding = s.options.getOrElse("encoding", "UTF-8"))
        case "json"    => Readers.json(spark, s.path,
          linesFormat = s.options.getOrElse("lines_format", "true").toBoolean,
          flattenTopLevel = s.options.getOrElse("flatten", "false").toBoolean)
        case "parquet" => Readers.parquet(spark, s.path)
        case "orc"     => Readers.orc(spark, s.path)
        case "text"    => Readers.text(spark, s.path)
        case "s3"      => Readers.objectStore(spark, s.path, s.options.getOrElse("format", "parquet"))
        case "jdbc"    => Readers.jdbc(spark, s.options("url"), s.path, s.options)
        case other     => throw new IllegalArgumentException(s"Unknown source type: $other")
      }
      s.table -> df
    }.toMap
    (frames(conf.sources.head.table), name =>
      frames.getOrElse(name, throw new IllegalArgumentException(s"Unknown table: $name")))
  }

  /** Execute the full lifecycle. */
  def execute(spark: SparkSession, conf: PipelineConfig.PipelineConf): Result =
    execute(spark, conf, None)

  /** Execute with structured event logging (monitoring/structured_logging.py
    * parity): pipeline_start/end, per-stage step events, one
    * data_quality_check event per expectation, a data_write event for the
    * storage stage — all correlated by the logger's (pipeline_name,
    * run_id) context. `plog = None` is the no-logging fast path.
    */
  def execute(spark: SparkSession, conf: PipelineConfig.PipelineConf,
              plog: Option[StructuredLog.PipelineLogger]): Result = {
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // frames persisted by `cache` ops — unpersisted when the run ends
    // (success, validation failure, or crash): an in-run cache must not
    // squat in executor storage after its pipeline is gone
    val caches = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    var stage = "load"
    try {
      plog.foreach(_.startPipeline(Map(
        "sources" -> conf.sources.map(s => s"${s.typ}:${s.path}"),
        "operations" -> conf.operations.size,
        "expectations" -> conf.expectations.size,
        "storage" -> conf.storage.map(_.typ).getOrElse("none"))))
      plog.foreach(_.startStep("load"))
      val (primary, catalog) = load(spark, conf)
      plog.foreach(_.endStep("load"))
      stage = "process"
      plog.foreach(_.startStep("process"))
      val (processed, attritionThunk) = conf.attrition match {
        case Some(a) =>
          val (out, rep) = OpCompiler.compileObserved(
            conf.operations, catalog, caches, a.weightColumn)(primary)
          (out, Some(rep))
        case None =>
          (OpCompiler.compile(conf.operations, catalog, caches)(primary), None)
      }
      // observe() metrics ride the run's own validation/storage actions —
      // zero extra passes; a run with neither gets one cheap noop drive
      def attritionReport(actionRan: Boolean): Seq[OpCompiler.StageAttrition] =
        attritionThunk.map { rep =>
          if (!actionRan) processed.write.format("noop").mode("overwrite").save()
          val report = rep()
          conf.attrition.flatMap(_.reportPath).foreach { rp =>
            import spark.implicits._
            report.map(sa => (sa.stage, sa.op, sa.rowsIn, sa.rowsOut,
                sa.rowsDropped, sa.weightIn, sa.weightOut))
              .toDF("stage", "op", "rows_in", "rows_out", "rows_dropped",
                "weight_in", "weight_out")
              .coalesce(1).write.mode("overwrite").parquet(rp)
          }
          report
        }.getOrElse(Nil)
      plog.foreach(_.endStep("process"))
      stage = "validate"

      // validation stage (pipeline.py:234-256): one aggregate pass
      val ratios: Seq[Double] =
        if (conf.expectations.isEmpty) Nil
        else {
          val aggs = conf.expectations.zipWithIndex.map { case (e, i) =>
            avg(when(expr(e.expression), 1.0).otherwise(0.0)).as(s"r$i")
          }
          val row = processed.agg(aggs.head, aggs.tail: _*).collect()(0)
          conf.expectations.indices.map(i => if (row.isNullAt(i)) 1.0 else row.getDouble(i))
        }
      // check by INDEX: the name-keyed report map collapses duplicate names
      // (last wins), and checking through it would let a failing expectation
      // hide behind a passing namesake
      val validation: Map[String, Double] =
        conf.expectations.zip(ratios).map { case (e, r) => e.name -> r }.toMap
      val failed = conf.expectations.zip(ratios).collect {
        case (e, r) if r < e.minRatio => e
      }
      plog.foreach { p =>
        conf.expectations.zip(ratios).foreach { case (e, r) =>
          p.logger.logDataQualityCheck(conf.name, e.name, r, e.minRatio,
            if (r < e.minRatio) "fail" else "pass")
        }
      }
      if (failed.nonEmpty) {
        plog.foreach(_.endPipeline("validation_failed"))
        // the validation aggregate WAS an action, so the attrition metrics
        // fired — a failing run's drop profile is exactly when the report
        // matters most
        return Result(conf.name, "validation_failed", 0L,
          validation, failed.map(e => s"expectation '${e.name}' below min_ratio"),
          attritionReport(actionRan = true))
      }

      // storage stage
      stage = "store"
      val storeT0 = System.currentTimeMillis()
      val rows = conf.storage match {
        case Some(st) =>
          val counted = processed.persist()
          val n = counted.count()
          st.typ match {
            case "parquet" =>
              if (st.partitionBy.nonEmpty) Sinks.parquetPartitioned(counted, st.path, st.partitionBy, st.mode)
              else counted.write.mode(st.mode).parquet(st.path)
            case "csv"  => counted.write.mode(st.mode).option("header", "true").csv(st.path)
            case "orc"  => counted.write.mode(st.mode).orc(st.path)
            case "jdbc" => Sinks.jdbcWrite(counted, st.options("url"), st.path, st.mode)
            case "noop" => counted.write.format("noop").mode("overwrite").save()
            case other  => throw new IllegalArgumentException(s"Unknown storage type: $other")
          }
          // storage.options.catalog_dir: register the written dataset into
          // the DataCatalog (utils/data_catalog.py parity — the reference
          // catalogs its DB tables; graft catalogs the written dataset).
          // The analysis runs over the still-persisted frame — one cheap
          // aggregate; catalog_table/catalog_tags override the defaults.
          st.options.get("catalog_dir").foreach { catDir =>
            val cat = new DataCatalog(catDir)
            cat.registerTable(counted,
              table = st.options.getOrElse("catalog_table", conf.name),
              description = Some(s"output of pipeline '${conf.name}'"),
              tags = st.options.get("catalog_tags").map(_.split(",").toSeq).getOrElse(Nil),
              path = if (st.typ == "jdbc" || st.typ == "noop") None else Some(st.path))
            plog.foreach(_.logger.logDataLineage(
              conf.sources.map(_.table).mkString(","),
              st.options.getOrElse("catalog_table", conf.name), "pipeline", conf.name))
          }
          // storage.options.lineage_dir: persist the cross-run lineage
          // edges (lineage_tracker.py parity — every source table → the
          // written table, attributed to this pipeline)
          st.options.get("lineage_dir").foreach { ld =>
            new LineageTracker(ld).trackTransformation(
              conf.sources.map(_.table),
              st.options.getOrElse("catalog_table", conf.name),
              "pipeline", conf.name,
              Map("storage_type" -> st.typ, "path" -> st.path))
          }
          counted.unpersist()
          n
        case None => -1L
      }
      plog.foreach { p =>
        conf.storage.foreach(st => p.logDataWrite(s"${st.typ}:${st.path}",
          math.max(rows, 0L), (System.currentTimeMillis() - storeT0) / 1000.0))
        p.endPipeline("success", recordsProcessed = math.max(rows, 0L))
      }
      Result(conf.name, "success", rows, validation, errors.toSeq,
        attritionReport(actionRan = conf.storage.nonEmpty || conf.expectations.nonEmpty))
    } catch {
      case t: Throwable =>
        errors += t.getMessage
        plog.foreach { p =>
          p.logStepError(stage, t)
          p.endPipeline("failed", errorMessage = Option(t.getMessage))
        }
        Result(conf.name, "failed", 0L, Map.empty, errors.toSeq)
    } finally {
      caches.foreach(c => try c.unpersist(blocking = false) catch { case _: Throwable => () })
    }
  }
}
