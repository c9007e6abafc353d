package graft.tools

import graft.SparkEntry
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dump the FORMATTED physical plan of named queries to files — the
  * committed before/after evidence for optimization rounds
  * (plans/r<N>/<query>_<suffix>.txt). Unlike [[PlanAudit]] (stdout,
  * SimpleMode, red-flag scan), this writes `explain("formatted")` including
  * PushedFilters/ReadSchema per scan and per-operator detail, AFTER
  * executing the query so AQE's final plan (real join strategies) is what
  * lands in the file.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [query ...]
  * (no query names = the Bench headline set). SPARK_GRAFT_SF_DIR picks the
  * data (default sf0.1 — plans should be captured at the bench SF so AQE
  * decisions match what the bench times).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else graft.Bench.headline
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.core.Sessions.local(cpus, cpus, "plan-dump")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          val df = fn(spark, dir)
          // execute THIS df's own QueryExecution so the AQE final plan exists
          try df.collect()
          catch { case e: Throwable => System.err.println(s"[plandump] $name failed: ${e.getMessage}") }
          val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
          System.err.println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      }
      // measurement hygiene between queries: drop caches a query's operator
      // may have pinned so the next plan capture starts clean
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
