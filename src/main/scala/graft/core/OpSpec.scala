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

  /** One window-function application inside a WindowOp
    * (spark_processor.py:244-263 function specs). */
  final case class WindowFuncSpec(funcType: String, column: String = null,
                                  alias: String = null, offset: Int = 1,
                                  default: Any = null, n: Int = 1)
}

/** Compile an op list into a single lazy transformation. `tables` resolves
  * join right-hand sides by name (the reference passes materialized frames;
  * graft passes a catalog function so joins stay lazy too).
  */
object OpCompiler {
  import OpSpec._

  def compile(ops: Seq[OpSpec], tables: String => DataFrame = null): DataFrame => DataFrame =
    df => ops.foldLeft(df)((d, op) => applyOp(d, op, tables))

  def applyOp(df: DataFrame, op: OpSpec, tables: String => DataFrame = null): DataFrame = op match {
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
  }
}
