package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Grouped top-k as a bounded-heap aggregate (`graft_topk_agg`) — the
  * scale-superior form of the `row_number() OVER (PARTITION BY …) <= k`
  * idiom (w3). The window form shuffles EVERY row of every group and
  * sorts each partition; this aggregate keeps at most k values of
  * state per group, partial-combines map-side like any other agg, and
  * moves only k-sized heaps through the exchange. At 100 TB the
  * difference is the whole fact table crossing the wire versus
  * |groups|·k rows — the same partial-vs-full argument as map-side
  * combine, applied to ranking.
  *
  * Ordering is the natural Catalyst ordering of the child type,
  * LARGEST first. Callers encode direction and tie-breaks
  * structurally: `struct(price, id)` ranks by price then id —
  * providing a unique trailing field is what makes results
  * deterministic (the w3 discipline). Returns `array<childType>` of
  * the ≤k largest values in descending order.
  *
  * Reference behavior covered: the per-group head/rank patterns in
  * the mart layer (`gmaps/d_gmaps_mart_*` top-N reviews per place)
  * re-expressed without a per-group full sort.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
    with UnaryLike[Expression] {

  require(k > 0, s"graft_topk_agg: k must be positive, got $k")

  override def prettyName: String = "graft_topk_agg"

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // heap dequeues its ordering's MAX; with the ordering reversed the
  // head is the SMALLEST retained value — the eviction victim when a
  // (k+1)-th larger value arrives
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ord.reverse)

  private def add(buf: mutable.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) {
      buf.enqueue(InternalRow.copyValue(v))
    } else if (ord.compare(v, buf.head) > 0) {
      buf.dequeue()
      buf.enqueue(InternalRow.copyValue(v))
    }
  }

  override def update(buf: mutable.PriorityQueue[Any],
      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) add(buf, v)
    buf
  }

  override def merge(a: mutable.PriorityQueue[Any],
      b: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    b.foreach { v =>
      if (a.size < k) a.enqueue(v)
      else if (ord.compare(v, a.head) > 0) { a.dequeue(); a.enqueue(v) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord.reverse))

  // ---- buffer spill format: length-prefixed UnsafeRow(1 field) ----

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { v =>
      val r = proj.apply(InternalRow(v))
      dos.writeInt(r.getSizeInBytes)
      dos.write(r.getBytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      row.pointTo(arr, len)
      buf.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKAgg =
    copy(child = c)
}

object TopKAgg {
  /** Top-k largest values of `c` per group, descending (ties and
    * direction are encoded structurally — pass `struct(...)`). */
  def topK(c: Column, k: Int): Column =
    Bridge.toCol(TopKAgg(Bridge.toExpr(c), k).toAggregateExpression())
}
