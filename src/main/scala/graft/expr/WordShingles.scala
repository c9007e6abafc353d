package graft.expr

import java.util.Locale
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a normalized (lowercase, whitespace-
  * collapsed) text — the hot inner op of every text-dedup pipeline here.
  *
  * Semantics match TextLib's original HOF formulation
  * (lower → split \s+ → n-grams joined by " " → distinct; texts with fewer
  * than n words yield one whole-text shingle), but as a single tight loop
  * per row instead of an interpreted transform/slice/concat_ws chain
  * (measured ~10× on the documents corpus).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    shingles(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def shingles(input: UTF8String): GenericArrayData = {
    val text = input.toString
    // no String.trim: it strips ALL chars <= U+0020, peeling control chars
    // off their tokens and diverging from the \s+-split oracle tokenization
    // (same rule as WordSetCount); empty artifacts of a leading separator
    // are filtered instead
    val rawWords = text.toLowerCase(Locale.ROOT).split("\\s+")
    val words0 = rawWords.filter(_.nonEmpty)
    val words = if (words0.isEmpty) Array("") else words0
    val out = new mutable.LinkedHashSet[String]
    if (words.length < n || (words.length == 1 && words(0).isEmpty)) {
      out += words.mkString(" ")
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out += sb.toString
        i += 1
      }
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.shingles($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_word_shingles"
}

object WordShingles {
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), n))
}

/** Positional word k-gram hashes: xxhash64 (seed 42, Spark's `xxhash64`
  * family) of each k-token window of the normalized text, in position
  * order — array<long> indexed by 0-based start position. The hot inner op
  * of duplicateSpans: the equivalent HOF chain
  * (`transform(sequence(...), i -> xxhash64(concat_ws(" ", slice(ws, i,
  * k))))`) is interpreted, re-slices the token array per position, and
  * runs TWICE (count pass + flag join) because the gram relation is
  * deliberately not cached. One tokenize pass + one rolling StringBuilder
  * here. Texts with fewer than k tokens yield an empty array (no grams).
  *
  * Token stream = lowercase → split Java `\s+` → drop empties, identical
  * to `split(TextLib.normalized(t), " ")` with empty-filter (the
  * collapse-then-split and split-\s+ formulations produce the same
  * tokens); lowercasing goes through UTF8String.toLowerCase, bit-
  * compatible with Spark's `lower()` and the DuckDB oracle's.
  */
case class WordGramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"WordGramHashes: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    gramHashes(input.asInstanceOf[UTF8String])

  /** Shared by eval and generated code (reference-call codegen). */
  def gramHashes(input: UTF8String): GenericArrayData = {
    val toks0 = input.toLowerCase.toString.split("\\s+")
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    val toks = if (nTok == toks0.length) toks0 else {
      val t = new Array[String](nTok); var j = 0; i = 0
      while (i < toks0.length) { if (toks0(i).nonEmpty) { t(j) = toks0(i); j += 1 }; i += 1 }
      t
    }
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i + k <= n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(sb.toString), org.apache.spark.sql.types.StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGramHashes", this, classOf[WordGramHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.gramHashes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_word_gram_hashes"
}

object WordGramHashes {
  def apply(text: Column, k: Int): Column =
    GraftColumnBridge.column(WordGramHashes(GraftColumnBridge.expression(text), k))
}

/** Sorted distinct sliding-`w`-window minima of an array<long> — the
  * winnowing reduction over WordGramHashes (Schleimer et al. 2003).
  * O(n) via a monotonic index deque; the interpreted
  * transform/sequence/slice/array_min chain it replaces is O(n·w) with a
  * per-window array allocation and sits outside whole-stage codegen.
  *
  * Semantics (pinned by DedupSimilaritySpec/AlgebraPropSpec): empty input
  * → empty; 0 < n < w → [global min]; else sorted distinct window minima.
  * Input elements must be non-null (WordGramHashes' output contract).
  */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, s"WinnowMins: window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  /** Shared by eval and generated code (reference-call codegen). */
  def winnow(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    // registered as the SQL function graft_winnow_mins, so arbitrary
    // array<bigint> input bypasses WordGramHashes' non-null contract — a
    // null element would otherwise NPE opaquely inside toLongArray()
    var ni = 0
    while (ni < n) {
      if (arr.isNullAt(ni)) throw new IllegalArgumentException(
        s"graft_winnow_mins: input array contains NULL at index $ni — " +
        "winnowing is defined over non-null 64-bit gram hashes " +
        "(e.g. graft_word_gram_hashes output); filter nulls first")
      ni += 1
    }
    val h = arr.toLongArray()
    if (n < w) {
      var m = h(0); var i = 1
      while (i < n) { if (h(i) < m) m = h(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    val dq = new Array[Int](n) // monotonic deque of indices, values increasing
    var head = 0; var tail = 0
    val out = new Array[Long](n - w + 1)
    var oi = 0; var i = 0
    while (i < n) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) { out(oi) = h(dq(head)); oi += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    var k = 0; var j = 1
    while (j < out.length) {
      if (out(j) != out(k)) { k += 1; out(k) = out(j) }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(out, 0, k + 1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowMins", this, classOf[WinnowMins].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.winnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_mins"
}

object WinnowMins {
  def apply(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(WinnowMins(GraftColumnBridge.expression(hashes), w))
}
