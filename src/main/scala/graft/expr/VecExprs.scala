package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
}

/** dot(a, b) over two numeric arrays — replaces the interpreted
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` plan shape.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

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

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** L2 norm of a numeric array in one pass. */
case class L2NormExpr(child: Expression) extends UnaryExpression with CodegenFallback {

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
    extends UnaryExpression with CodegenFallback {

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
