package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact interpolated percentile as a TypedImperativeAggregate — the custom-
  * aggregate vehicle SURVEY §2.M names for exact streaming percentiles
  * (Spark's built-in `percentile` covers batch; this is the graft-native
  * form usable where a custom buffer is required, and the template for
  * sketch aggregates).
  *
  * Buffer = growing Array[Double] (exactness costs O(n) memory per group —
  * that's inherent; use percentile_approx when groups are unbounded).
  * Same linear-interpolation definition as Spark/DuckDB quantile_cont.
  */
case class ExactPercentile(
    child: Expression,
    percentage: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  // validate eagerly like the built-in percentile: out-of-range p would
  // otherwise surface as an opaque executor ArrayIndexOutOfBounds mid-agg
  require(percentage >= 0.0 && percentage <= 1.0,
    s"percentage must be in [0, 1], got $percentage")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): ArrayBuffer[Double] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Number].doubleValue()
    buf
  }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b1 ++= b2; b1
  }

  override def eval(buf: ArrayBuffer[Double]): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val pos = percentage * (sorted.length - 1)
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 < sorted.length) sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
    else sorted(lo)
  }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ExactPercentile =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ExactPercentile =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ExactPercentile =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_exact_percentile"
}

object ExactPercentile {
  def apply(c: Column, p: Double): Column =
    GraftColumnBridge.column(
      ExactPercentile(GraftColumnBridge.expression(c), p).toAggregateExpression())
}
