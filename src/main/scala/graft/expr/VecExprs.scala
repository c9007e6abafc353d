package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity/ANN surface.
  *
  * Why custom Catalyst expressions: Spark 4.1 evaluates higher-order
  * functions (`aggregate`/`zip_with`/`transform`) interpreted — one closure
  * dispatch + boxed array allocation per element, and no common-subexpression
  * elimination across the 32 per-plane dot products an LSH signature needs.
  * These run one tight primitive loop per row (same rationale as MinHashSig
  * for the text path).
  *
  * All three implement real `doGenCode` (not CodegenFallback): the loop is
  * emitted as Java inside the whole-stage-codegen function, so an ANN scoring
  * projection stays one fused span with no per-row boxing or InternalRow
  * materialization. The interpreted `nullSafeEval` path stays bit-identical
  * (specs compare both).
  */
private object VecExprs {
  /** Read element i of a numeric array column as double (float or double
    * arrays accepted — embeddings are array<float>, plane literals double).
    */
  @inline def get(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got ${other.simpleString(10)}")
  }

  /** Java source for reading element `i` of array variable `v` as double. */
  def getJava(v: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** dot(a, b) over two numeric arrays — replaces the interpreted
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` plan shape.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on length mismatch (below), regardless of child nullability
  override def nullable: Boolean = true

  @transient private lazy val leftFloat = VecExprs.isFloatArray(left)
  @transient private lazy val rightFloat = VecExprs.isFloatArray(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // dimension mismatch → null, matching the zip_with formulation this
    // replaces (null-padded tail poisons the sum): a silently-truncated
    // dot would rank malformed vectors as plausible neighbors
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null element → null result, matching zip_with's null propagation:
      // a malformed vector must drop out of scoring, not contribute 0.0
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += VecExprs.get(a, i, leftFloat) * VecExprs.get(b, i, rightFloat)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ${VecExprs.getJava(a, i, leftFloat)} * ${VecExprs.getJava(b, i, rightFloat)};
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** L2 norm of a numeric array in one pass. */
case class L2NormExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  // null on null array element (below), regardless of child nullability
  override def nullable: Boolean = true

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null // null element poisons the norm (HOF parity)
      val x = VecExprs.get(a, i, isFloat)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = false;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  final double $x = ${VecExprs.getJava(a, i, isFloat)};
         |  $acc += $x * $x;
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2NormExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_l2norm"
}

object L2NormExpr {
  def apply(a: Column): Column =
    GraftColumnBridge.column(L2NormExpr(GraftColumnBridge.expression(a)))
}

/** Random-hyperplane LSH band hashes: for `nbits = bands × bitsPerBand`
  * hyperplanes (flattened [bit][dim] into `planes`), computes every sign bit
  * and packs them into one int per band — array<int> indexed by band.
  * One expression evaluation replaces 32 interpreted per-plane dot products.
  */
case class HyperplaneSig(child: Expression, planes: Vector[Double], bands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val nbits = bands * bitsPerBand
  private val dim = planes.length / nbits
  @transient private lazy val isFloat = VecExprs.isFloatArray(child)
  @transient private lazy val flat: Array[Double] = planes.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](bands)
    // wrong-dimension vector → all-zero band hashes (the per-plane HOF dot
    // was null there, so every sign test failed → bit 0); a truncated dot
    // would instead hash garbage into real buckets
    if (v.numElements() != dim) return new GenericArrayData(out)
    var i0 = 0
    while (i0 < dim) {
      // null element → every per-plane HOF dot was null → every sign test
      // failed → all-zero bands, same as the wrong-dimension case above
      if (v.isNullAt(i0)) return new GenericArrayData(out)
      i0 += 1
    }
    var bit = 0
    while (bit < nbits) {
      val base = bit * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += VecExprs.get(v, i, isFloat) * flat(base + i)
        i += 1
      }
      if (acc >= 0) out(bit / bitsPerBand) |= 1 << (bit % bitsPerBand)
      bit += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("planes", flat, "double[]")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      s"""
         |final int[] $out = new int[$bands];
         |boolean $ok = $v.numElements() == $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if ($ok) {
         |  for (int $bit = 0; $bit < $nbits; $bit++) {
         |    final int $base = $bit * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += ${VecExprs.getJava(v, i, isFloat)} * $p[$base + $i];
         |    }
         |    if ($acc >= 0) $out[$bit / $bitsPerBand] |= 1 << ($bit % $bitsPerBand);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_sig"
}

object HyperplaneSig {
  /** Column API: band-hash array for a vector column under `planes`
    * (row-major [bit][dim]).
    */
  def apply(vec: Column, planes: Array[Array[Double]], bands: Int, bitsPerBand: Int): Column =
    GraftColumnBridge.column(HyperplaneSig(
      GraftColumnBridge.expression(vec), planes.flatten.toVector, bands, bitsPerBand))
}

/** One-pass L2 normalization of a numeric array into array<double> —
  * replaces the interpreted `aggregate` (norm) + `transform` (divide) +
  * `exists` (null screen) HOF chain that cost ~350 µs/row on the
  * unit-vector path under every ANN/PQ/SemDedup/contamination operator
  * (profiled at sf0.1: 1.4 s of a 4 000-row sample collect was this
  * chain). Bit-identical arithmetic to the HOF formulation: sequential
  * left-to-right Σx² accumulation, sqrt in double, x/norm per element,
  * zero-norm vectors pass through as casts.
  *
  * `dropIfAnyNull = false` (the public l2Normalize contract): null
  * elements are preserved positionally and excluded from the norm.
  * `dropIfAnyNull = true` (the unitFrame screen): a null element nulls
  * the whole result — the row then falls to the existing isNotNull
  * filter, replacing the interpreted `exists` pass.
  */
case class UnitizeExpr(child: Expression, dropIfAnyNull: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = !dropIfAnyNull)
  override def nullable: Boolean = true

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) { if (dropIfAnyNull) return null }
      else { val x = VecExprs.get(a, i, isFloat); acc += x * x }
      i += 1
    }
    val norm = math.sqrt(acc)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = VecExprs.get(a, i, isFloat)
        out(i) = if (norm == 0.0) x else x / norm
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val norm = ctx.freshName("norm")
      val vals = ctx.freshName("vals")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = false;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { if ($dropIfAnyNull) { $bad = true; break; } }
         |  else { final double $x = ${VecExprs.getJava(a, i, isFloat)}; $acc += $x * $x; }
         |}
         |if (!$bad) {
         |  final double $norm = java.lang.Math.sqrt($acc);
         |  final Object[] $vals = new Object[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$a.isNullAt($j)) {
         |      final double $x = ${VecExprs.getJava(a, j, isFloat)};
         |      $vals[$j] = ($norm == 0.0) ? $x : $x / $norm;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
         |}
         |${ev.isNull} = $bad;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitizeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_unitize"
}

object UnitizeExpr {
  def apply(a: Column, dropIfAnyNull: Boolean): Column =
    GraftColumnBridge.column(UnitizeExpr(GraftColumnBridge.expression(a), dropIfAnyNull))
}
