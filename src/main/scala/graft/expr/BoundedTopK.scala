package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** The k best (score, id) pairs of a group, as a best-first-sorted
  * array<struct<score: double, id: idType>> — a BOUNDED top-k for the
  * ANN/retrieval rank tails (round 8).
  *
  * Every ANN operator used to finish with
  * `row_number().over(Window.partitionBy(query_id).orderBy(score, id))
  * .filter(rn <= k)` — which SHUFFLES the full candidate relation (corpus ×
  * queries for the exact baseline) and concentrates each query's entire
  * candidate stream into one window task for a full sort, to keep k≈10
  * rows. This aggregate keeps an O(k) heap per (query) group with map-side
  * partial aggregation: the exchange carries ≤ k rows per query per map
  * task, and no candidate stream is ever sorted whole. At 100 TB that is
  * the difference between a harmless rank tail and |queries| straggler
  * sorts over the corpus.
  *
  * Ordering replicates the window EXACTLY, Spark null placement included:
  * score descending (or ascending for distance tails) with the default
  * NullsLast-on-desc / NullsFirst-on-asc, ties by id ascending NullsFirst.
  * The top-k SET under this total order is partitioning-independent, so
  * results — including the q_ann_lsh golden — are byte-identical to the
  * window formulation. Ids are copied on insert (UTF8String buffers are
  * reused by the scan) and carried through partial-buffer serialization
  * via an UnsafeProjection on the element schema.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    scoreDesc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  require(k > 0, s"bounded top-k: k must be positive, got $k")

  // cmp pattern-matches java.lang.Double — a non-double score must fail at
  // analysis time, not as a MatchError inside the aggregate (ADVICE r8).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE score, got ${score.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  private def elemType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = true),
    StructField("id", id.dataType, nullable = true)))
  override def dataType: DataType = ArrayType(elemType, containsNull = false)

  @transient private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(id.dataType)

  /** negative ⇒ a ranks BETTER (earlier) than b. Null placement mirrors
    * the window's default: score desc → nulls last, score asc → nulls
    * first; id tie-break asc → nulls first. */
  private def cmp(a: (Any, Any), b: (Any, Any)): Int = {
    val sc = (a._1, b._1) match {
      case (null, null) => 0
      case (null, _)    => if (scoreDesc) 1 else -1
      case (_, null)    => if (scoreDesc) -1 else 1
      case (x: java.lang.Double, y: java.lang.Double) =>
        val c = java.lang.Double.compare(x, y) // total order: NaN > +Inf, matching Spark sorts
        if (scoreDesc) -c else c
    }
    if (sc != 0) sc
    else (a._2, b._2) match {
      case (null, null) => 0
      case (null, _)    => -1
      case (_, null)    => 1
      case (x, y)       => idOrdering.compare(x, y)
    }
  }

  // PriorityQueue head = the WORST retained element (max under cmp), the
  // one a better arrival evicts
  private def newBuffer: mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty[(Any, Any)](Ordering.fromLessThan((a, b) => cmp(a, b) < 0))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] = newBuffer

  private def insert(buf: mutable.PriorityQueue[(Any, Any)], e: (Any, Any)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (cmp(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Any, Any)], input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val s = score.eval(input)
    val i = InternalRow.copyValue(id.eval(input)) // scan buffers are reused
    insert(buf, (s, i))
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Any, Any)], b2: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Any, Any)]): Any = {
    val arr = buf.toArray.sortWith((a, b) => cmp(a, b) < 0)
    new GenericArrayData(arr.map { case (s, i) =>
      val row = new GenericInternalRow(2)
      row.update(0, s); row.update(1, i)
      row
    }.asInstanceOf[Array[Any]])
  }

  @transient private lazy val proj = UnsafeProjection.create(elemType)

  override def serialize(buf: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val row = new GenericInternalRow(2)
    buf.foreach { case (s, i) =>
      row.update(0, s); row.update(1, i)
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = newBuffer
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val u = new UnsafeRow(2)
      u.pointTo(arr, len) // arr is freshly owned — values may reference it
      val s = if (u.isNullAt(0)) null else java.lang.Double.valueOf(u.getDouble(0))
      val idV = if (u.isNullAt(1)) null else InternalRow.copyValue(u.get(1, id.dataType))
      buf.enqueue((s, idV))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "graft_bounded_top_k"
}

object BoundedTopK {
  def apply(score: Column, id: Column, k: Int, scoreDesc: Boolean): Column =
    GraftColumnBridge.column(
      BoundedTopK(GraftColumnBridge.expression(score), GraftColumnBridge.expression(id),
        k, scoreDesc).toAggregateExpression())
}
