package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native product-quantization kernels (vec/Pq.scala is the module API).
  *
  * PQ splits a d-dim vector into `m` subvectors of `ds = d/m` dims and
  * replaces each with the index of its nearest codebook centroid — an
  * m-byte code standing in for 4·d bytes of floats (16-64× compression),
  * which is what makes billion-vector ANN scans memory-feasible. The
  * codebook rides into the expressions as a flat reference object
  * ([subspace][centroid][dim] row-major), same embedding technique as
  * HyperplaneSig's plane matrix.
  *
  * All expressions implement real `doGenCode` — the encode runs over the
  * full corpus, and an interpreted HOF formulation would pay a closure
  * dispatch per (subspace × centroid × dim) element.
  */
/** pq_encode(vec) → m-byte binary code: per subspace, the index of the
  * L2-nearest centroid (ties → smallest index). Wrong dimension or a null
  * element → null code (a malformed vector must drop out of the index, not
  * encode as garbage).
  */
case class PqEncode(child: Expression, codebook: Vector[Double], m: Int, ksub: Int, ds: Int)
    extends UnaryExpression {

  require(codebook.length == m * ksub * ds, "codebook shape mismatch")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)
  @transient private lazy val flat: Array[Double] = codebook.toArray
  private val dim = m * ds

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * ds
        var d2 = 0.0
        var j = 0
        while (j < ds) {
          val diff = VecExprs.get(v, s * ds + j, isFloat) - flat(base + j)
          d2 += diff * diff
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = c } // strict < keeps smallest tie index
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |byte[] $out = null;
         |if ($ok) {
         |  $out = new byte[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      final int $base = ($s * $ksub + $c) * $ds;
         |      double $d2 = 0.0;
         |      for (int $j = 0; $j < $ds; $j++) {
         |        final double $diff = ${VecExprs.getJava(v, s"($s * $ds + $j)", isFloat)} - $cb[$base + $j];
         |        $d2 += $diff * $diff;
         |      }
         |      if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
         |    }
         |    $out[$s] = (byte) $best;
         |  }
         |}
         |${ev.isNull} = !$ok;
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_encode"
}

object PqEncode {
  def apply(vec: Column, codebook: Array[Double], m: Int, ksub: Int, ds: Int): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec),
      codebook.toVector, m, ksub, ds))
}

/** pq_lut(queryVec) → array<double> of m·ksub squared L2 distances between
  * each query subvector and each centroid — the asymmetric-distance lookup
  * table, computed ONCE per query row (the query side is tiny; candidates
  * then score via [[PqAdcScore]] table lookups only). Wrong dim / null
  * element → null.
  */
case class PqLut(child: Expression, codebook: Vector[Double], m: Int, ksub: Int, ds: Int)
    extends UnaryExpression {

  require(codebook.length == m * ksub * ds, "codebook shape mismatch")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)
  @transient private lazy val flat: Array[Double] = codebook.toArray
  private val dim = m * ds

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * ds
        var d2 = 0.0
        var j = 0
        while (j < ds) {
          val diff = VecExprs.get(v, s * ds + j, isFloat) - flat(base + j)
          d2 += diff * diff
          j += 1
        }
        out(s * ksub + c) = d2
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |double[] $out = null;
         |if ($ok) {
         |  $out = new double[$m * $ksub];
         |  for (int $s = 0; $s < $m; $s++) {
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      final int $base = ($s * $ksub + $c) * $ds;
         |      double $d2 = 0.0;
         |      for (int $j = 0; $j < $ds; $j++) {
         |        final double $diff = ${VecExprs.getJava(v, s"($s * $ds + $j)", isFloat)} - $cb[$base + $j];
         |        $d2 += $diff * $diff;
         |      }
         |      $out[$s * $ksub + $c] = $d2;
         |    }
         |  }
         |}
         |${ev.isNull} = !$ok;
         |${ev.value} = $ok ? new org.apache.spark.sql.catalyst.util.GenericArrayData($out) : null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_lut"
}

object PqLut {
  def apply(vec: Column, codebook: Array[Double], m: Int, ksub: Int, ds: Int): Column =
    GraftColumnBridge.column(PqLut(GraftColumnBridge.expression(vec),
      codebook.toVector, m, ksub, ds))
}

/** pq_adc(code, lut) → the asymmetric distance: Σ_s lut[s·ksub + code[s]].
  * Code bytes are unsigned. Null / length-mismatched inputs → null (a
  * malformed candidate must not rank).
  */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val code = l.asInstanceOf[Array[Byte]]
    val lut = r.asInstanceOf[ArrayData]
    if (lut.numElements() != code.length * ksub) return null
    var acc = 0.0
    var s = 0
    while (s < code.length) {
      val ci = code(s) & 0xFF
      // a byte outside the model's centroid range (code from a different
      // model) must NOT rank: UnsafeArrayData.getDouble has no bounds
      // check, so an unchecked lookup reads adjacent memory as a distance
      if (ci >= ksub) return null
      acc += lut.getDouble(s * ksub + ci)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lut) => {
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val ci = ctx.freshName("ci")
      val bad = ctx.freshName("bad")
      s"""
         |boolean $bad = $lut.numElements() != $code.length * $ksub;
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $s = 0; $s < $code.length; $s++) {
         |    final int $ci = $code[$s] & 0xFF;
         |    if ($ci >= $ksub) { $bad = true; break; }
         |    $acc += $lut.getDouble($s * $ksub + $ci);
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_pq_adc"
}

object PqAdcScore {
  def apply(code: Column, lut: Column, ksub: Int): Column =
    GraftColumnBridge.column(PqAdcScore(
      GraftColumnBridge.expression(code), GraftColumnBridge.expression(lut), ksub))
}
