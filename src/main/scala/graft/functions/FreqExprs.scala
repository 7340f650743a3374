package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitter) sketch state as native Catalyst
  * aggregates — the third leg of the mergeable-sketch tier: theta
  * answers "how many DISTINCT" (SketchExprs), KLL answers "how are
  * values DISTRIBUTED", this answers "WHICH items dominate" with
  * per-slice state that persists and rolls up without rescanning
  * history. Algorithm: the Misra-Gries / Space-Saving family as
  * implemented by DataSketches' frequencies ItemsSketch (Anderson et
  * al., "A high-performance algorithm for identifying frequent items
  * in data streams", IMC'17): maxMapSize counters, purge on overflow,
  * guaranteed deterministic bounds getLowerBound ≤ true ≤
  * getUpperBound for EVERY item regardless of stream or merge order.
  *
  * That bound guarantee is the oracle strategy: estimates after a
  * lossy purge depend on partial-aggregation merge ORDER (which Spark
  * does not fix — shuffle fetch order races), so oracled queries gate
  * on the order-INDEPENDENT facts: exact counts (computed exactly by
  * both engines) falling inside the sketch's [lb, ub], never on raw
  * estimates. With maxMapSize ≥ ~0.75·distinct-items the sketch never
  * purges, bounds collapse onto the exact count, and the same query
  * is a full hash check — the theta exact-mode discipline.
  *
  * At 100 TB: per-(source, day) token sketches are KBs that ride the
  * ingest scan's aggregation (partial map-side combine moves sketch
  * bytes, not token rows); "what dominates slice X ∪ Y" merges ledger
  * rows instead of re-scanning text. The exact form is a full
  * token-grain groupBy whose shuffle carries every token occurrence.
  */
abstract class FreqAggBase extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

  def maxMapSize: Int

  @transient protected lazy val serde = new ArrayOfStringsSerDe

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false

  final override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  final override def merge(a: ItemsSketch[String],
                           b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  final override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(serde)

  final override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)

  final override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)
}

/** `graft_freq_agg(item[, maxMapSize])` — heavy-hitter sketch of raw
  * string items. `maxMapSize` must be a power of 2 (DataSketches
  * contract; error bound ∝ streamLength / maxMapSize). */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends FreqAggBase {

  override def prettyName: String = "graft_freq_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_agg needs string items, got $dt")
  }

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsAgg =
    copy(child = c)
}

/** `graft_freq_merge_agg(sketch[, maxMapSize])` — merge serialized
  * frequent-items sketches (the ledger rollup path). */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends FreqAggBase {

  override def prettyName: String = "graft_freq_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_merge_agg needs binary sketches, got $dt")
  }

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
}

/** `graft_freq_bound(sketch, item, which)` — per-item count bound from
  * a serialized sketch: which = 0 lower bound, 1 estimate, 2 upper
  * bound. lb/ub are DETERMINISTIC guarantees (hold for any stream and
  * merge order); the estimate is only order-independent pre-purge. */
case class FreqBoundExpr(left: Expression, right: Expression, which: Int)
    extends BinaryExpression {

  require(which >= 0 && which <= 2, s"which out of range: $which")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_freq_bound"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_freq_bound needs (binary, string), got ($a, $b)")
    }

  override def nullSafeEval(sketch: Any, item: Any): Any =
    FreqFns.bound(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String].toString, which)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (s, i) =>
      s"graft.functions.FreqFns.bound($s, $i.toString(), $which)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqBoundExpr =
    copy(left = newLeft, right = newRight)
}

object FreqFns {

  private val serde = new ArrayOfStringsSerDe

  def bound(bytes: Array[Byte], item: String, which: Int): Long = {
    val sk = ItemsSketch.getInstance[String](Memory.wrap(bytes), serde)
    which match {
      case 0 => sk.getLowerBound(item)
      case 1 => sk.getEstimate(item)
      case 2 => sk.getUpperBound(item)
    }
  }

  // ---- DataFrame API surface ----

  /** Aggregate raw string items into a serialized heavy-hitter sketch. */
  def freqAgg(item: Column, maxMapSize: Int = 1024): Column =
    Bridge.toCol(FreqItemsAgg(Bridge.toExpr(item), maxMapSize)
      .toAggregateExpression())

  /** Merge serialized sketches (the rollup path). */
  def freqMergeAgg(sketch: Column, maxMapSize: Int = 1024): Column =
    Bridge.toCol(FreqMergeAgg(Bridge.toExpr(sketch), maxMapSize)
      .toAggregateExpression())

  def freqLowerBound(sketch: Column, item: Column): Column =
    Bridge.toCol(FreqBoundExpr(Bridge.toExpr(sketch),
      Bridge.toExpr(item), 0))

  def freqEstimate(sketch: Column, item: Column): Column =
    Bridge.toCol(FreqBoundExpr(Bridge.toExpr(sketch),
      Bridge.toExpr(item), 1))

  def freqUpperBound(sketch: Column, item: Column): Column =
    Bridge.toCol(FreqBoundExpr(Bridge.toExpr(sketch),
      Bridge.toExpr(item), 2))
}
