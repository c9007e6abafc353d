package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The k SMALLEST long values of a group, as a sorted-ascending array —
  * a BOUNDED collect_list for skew-safe duplicate-group expansion.
  *
  * `collect_list` holds every member in the aggregation buffer, so a
  * million-deep exact-duplicate group materializes a million-element
  * array in one buffer — the per-key blow-up this codebase's skew rules
  * exist to prevent. This aggregate's buffer is a max-heap capped at k:
  * O(k) memory per group NO MATTER the group size, deterministic across
  * partitionings (the k smallest of a multiset are partitioning-
  * independent; merge = pour one heap into the other under the same
  * bound). Used by the identical-signature collapse in minhash/simhash
  * candidate generation, where groups at or under the bucket cap need
  * full membership in-row (no join-back shuffle) and deeper groups fall
  * back to a join that touches only them.
  *
  * Duplicate values are kept (multiset semantics, like collect_list);
  * nulls are skipped; an empty group evaluates to an empty array.
  */
case class BoundedMinList(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.PriorityQueue[Long]] {

  require(k > 0, s"bounded min-list: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // mutable.PriorityQueue under natural Long ordering is a MAX-heap:
  // head is the largest retained value, the one a smaller arrival evicts
  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long]

  private def insert(buf: mutable.PriorityQueue[Long], v: Long): Unit = {
    if (buf.size < k) buf.enqueue(v)
    else if (v < buf.head) { buf.dequeue(); buf.enqueue(v) }
  }

  override def update(buf: mutable.PriorityQueue[Long], input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.PriorityQueue[Long], b2: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[Long]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.PriorityQueue.empty[Long]
    var i = 0
    while (i < n) { buf.enqueue(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedMinList =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedMinList =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedMinList =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_bounded_min_list"
}

object BoundedMinList {
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      BoundedMinList(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
