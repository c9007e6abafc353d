package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Static scale-guardrail over a query's physical plan: flags the shapes
  * that work at test SF but collapse at cluster scale. The reference has no
  * analogue (its pandas engine is single-node by construction); on Spark
  * these are exactly the plans a 100 TB run cannot survive:
  *
  *  - `cartesian_product` — an O(n·m) all-pairs join (join with no equi
  *    keys between two non-broadcast sides).
  *  - `broadcast_nested_loop` — a non-equi join that ships one whole side
  *    to every executor and loops; fine only when that side is provably
  *    tiny (a scalar aggregate, a literal frame), fatal otherwise.
  *  - `global_window` — a window function with an empty PARTITION BY:
  *    every row funnels through ONE task regardless of cluster size (and
  *    AQE cannot split a skewed window partition). The exception is a
  *    rank-based top-k window that Spark's limit pushdown de-skews
  *    (TakeOrderedAndProject / WindowGroupLimit before the window) —
  *    those are reported under the separate `global_window_limited`
  *    rule so callers can allow them independently.
  *
  * Inspection uses `queryExecution.sparkPlan` (the pre-AQE physical plan):
  * planning only, no job runs. AQE can later rescue a skewed equi-join but
  * never a cartesian/global-window shape, so linting the static plan is
  * the right conservatism. Used by `Cli run --lint` and by PlanLintSpec,
  * which holds every registered gate query to an explicit allow-list.
  */
object PlanLint {

  final case class Finding(rule: String, node: String) {
    override def toString: String = s"$rule: $node"
  }

  /** Lint one frame. `Finding.node` carries the plan node's one-line
    * `simpleString` for the report; `rule` is the stable key callers
    * allow-list on.
    */
  def lint(df: DataFrame): Seq[Finding] = {
    val plan: SparkPlan = df.queryExecution.sparkPlan
    plan.collect {
      case c: CartesianProductExec =>
        Seq(Finding("cartesian_product", c.simpleString(120)))
      case b: BroadcastNestedLoopJoinExec =>
        Seq(Finding("broadcast_nested_loop", b.simpleString(120)))
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        // `expensive_scan_filter` — filter pushdown substituted an
        // EXPENSIVE computed alias into the scan's residual data filters,
        // where expressions run interpreted per row (no whole-stage
        // codegen, no subexpression sharing with the projection that
        // computes the same alias again). Measured: a null-check on a
        // nearest-centroid column re-ran its whole 17-subexpression tree
        // interpreted per scan row — 57 s vs 2 s on 400k rows. Screen such
        // rows with cheap structural predicates (size, isnotnull on the
        // STORED column) instead. A single custom kernel in a filter
        // (e.g. `isnotnull(graft_unitize(v))` — unitFrame's null screen)
        // is a deliberate, priced pattern and stays allowed; a
        // higher-order function (always interpreted, per-element lambda
        // dispatch) or a stack of two or more custom kernels is not.
        s.dataFilters.filter { f =>
          var graftNodes = 0
          var hof = false
          f.foreach {
            case _: org.apache.spark.sql.catalyst.expressions.HigherOrderFunction => hof = true
            case e if e.getClass.getName.startsWith("graft.expr.") => graftNodes += 1
            case _ => ()
          }
          hof || graftNodes >= 2
        }.map(f => Finding("expensive_scan_filter", f.toString.take(160)))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        // rank-pushdown rescue: Spark bounds a `row_number over (order by
        // …) <= k` window before it runs — an empty partition spec plans a
        // TakeOrderedAndProject (distributed partial top-k) or GlobalLimit
        // under the window, and a per-group spec plans WindowGroupLimit —
        // so the window's input is ≤ k rows, not the corpus. Those are
        // reported under the softer rule so callers can allow them
        // independently of true corpus-wide windows. The walk follows only
        // the UNARY chain feeding the window (sort/exchange/project): a
        // limit buried inside a join branch bounds that branch, not the
        // window's input, and must not soften the finding.
        @annotation.tailrec
        def boundedInput(p: SparkPlan): Boolean = p match {
          case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
          case _: org.apache.spark.sql.execution.GlobalLimitExec => true
          case _: WindowGroupLimitExec => true
          case u if u.children.size == 1 => boundedInput(u.children.head)
          case _ => false
        }
        val rule = if (boundedInput(w.child)) "global_window_limited" else "global_window"
        Seq(Finding(rule, w.simpleString(120)))
    }.flatten
  }

  /** Human/JSON-friendly report: rule → distinct node strings. */
  def report(df: DataFrame): Map[String, Seq[String]] =
    lint(df).groupBy(_.rule).map { case (r, fs) => r -> fs.map(_.node).distinct }
}
