package graft.tools

import graft.SparkEntry

/** Plan auditor: prints the formatted physical plan for the headline queries
  * and flags scale red-flags (CartesianProduct, un-pushed filters, full-scan
  * ReadSchema). Run per-round after correctness is green (builder prompt:
  * ".explain the plan and iterate until it's the plan you'd want").
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.headline
    val spark = graft.core.Sessions.local(8, 8, "plan-audit")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val df = fn(spark, dir)
        // execute THIS df's own QueryExecution (collect, not a write command —
        // a write plans a separate QE): with AQE the final plan (real join
        // strategies, WholeStageCodegen spans) only exists after the action
        try df.collect()
        catch { case e: Throwable => println(s"[audit] $name failed: ${e.getMessage}") }
        val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoop"),
          "no-codegen" -> !plan.contains("*(") // SimpleMode marks codegen stages with *(id)
        ).collect { case (f, true) => f }
        println(s"\n########## $name  ${if (flags.isEmpty) "OK" else "FLAGS: " + flags.mkString(",")}")
        println(plan)
      }
    }
    spark.stop()
  }
}
