package graft.expr

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace-delimited tokens whose lowercase form is in `words` —
  * the numerator of every stopword-ratio / language-marker score.
  *
  * Replaces the interpreted HOF chain
  * `size(filter(transform(split(text, "\\s+"), lower), isin(words)))`:
  * one closure dispatch + UTF8String allocation per (token, comparison) in
  * Spark 4.1 vs one tokenize pass + hash-set probe per token here.
  * Tokenization is the same `\s+` Java regex `split` uses; lowercasing goes
  * through UTF8String.toLowerCase — bit-compatible with Spark's `lower()`.
  */
case class WordSetCount(child: Expression, words: Vector[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(w))
    s
  }

  override protected def nullSafeEval(input: Any): Any = count(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (the codegen emits a call on a
    * reference to this expression instance — the child stays codegen'd,
    * unlike CodegenFallback which re-evaluates the subtree interpreted
    * from a materialized InternalRow).
    *
    * No String.trim here: it strips ALL chars <= U+0020, so a leading
    * control char would be peeled off its token and diverge from the
    * \s+-split oracles; empty split artifacts match no set entry and are
    * skipped naturally.
    */
  def count(input: UTF8String): Int = {
    val toks = ws.split(input.toString)
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty &&
        set.contains(UTF8String.fromString(toks(i)).toLowerCase.toString)) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSetCount", this, classOf[WordSetCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
    copy(child = newChild)

  override def prettyName: String = "graft_word_set_count"
}

object WordSetCount {
  def apply(text: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(WordSetCount(GraftColumnBridge.expression(text), words.toVector))
}

/** Occurrence counts for SEVERAL word sets in one tokenize pass —
  * array<int> aligned with `sets`. Language ID probes 6 marker sets; doing
  * it per-set re-tokenizes the text 6 times.
  */
case class WordSetCounts(child: Expression, sets: Vector[Vector[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val ws: Pattern = Pattern.compile("\\s+")
  @transient private lazy val hashSets: Array[java.util.HashSet[String]] =
    sets.map { s =>
      val h = new java.util.HashSet[String](s.size * 2)
      s.foreach(h.add)
      h
    }.toArray

  override protected def nullSafeEval(input: Any): Any = counts(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code — see WordSetCount.count. */
  def counts(input: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = new Array[Int](hashSets.length)
    // see WordSetCount: no String.trim (control-char divergence)
    val toks = ws.split(input.toString)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val low = UTF8String.fromString(toks(i)).toLowerCase.toString
        var k = 0
        while (k < hashSets.length) {
          if (hashSets(k).contains(low)) out(k) += 1
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSetCounts", this, classOf[WordSetCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_word_set_counts"
}

object WordSetCounts {
  def apply(text: Column, sets: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(WordSetCounts(
      GraftColumnBridge.expression(text), sets.map(_.toVector).toVector))
}
