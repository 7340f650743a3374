package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta and KLL sketch state as native Catalyst aggregates + scalar
  * estimators (DataSketches), extension-ladder rung (b/c): the
  * mergeable-state family m8/st13 started with HLL, completed.
  *
  * Why theta when Spark already ships `hll_sketch_agg`: HLL state
  * answers ONLY |A| and |A∪B|. A training-data warehouse also audits
  * overlap and churn between corpus slices — |A∩B| (cross-source
  * audience/content overlap, contamination screens) and |A\B| (net-new
  * per ingest batch) — and at 100 TB the exact forms are key-equi-joins
  * over the full history. Theta sketch state (Dasgupta et al., "Theta
  * Sketch Framework", KDD'16) stays a few KB per slice, merges
  * associatively (so per-slice sketches persist and roll up without
  * rescanning history, exactly like m5's additive sums), and closes
  * under union / intersection / a-not-b.
  *
  * Why KLL: `percentile_approx` (GK) answers one query in one pass but
  * its state is not exposed for persistence; a standing quantile ledger
  * (daily latency/price/length distributions, merged on demand into
  * any date range) needs a serialized, MERGEABLE sketch column. KLL
  * (Karnin-Lang-Liberty, FOCS'16) has ~1.3% rank error at k=200 with
  * proven merge bounds.
  *
  * All expressions here are deterministic: DataSketches hashing is
  * seeded (default seed), so the same input set always yields the same
  * sketch bytes and estimates — which is what lets the oracle gate
  * them with exact-value + tolerance-flag contracts (the a4/m8
  * pattern). SQL names are registered by [[graft.plans.GraftExtensions]]
  * (`graft_theta_agg`, `graft_theta_intersect_est`, `graft_kll_agg`,
  * …).
  */
object SketchFns {

  // ---- driver-side compute helpers (shared by eval and codegen) ----

  def thetaEstimate(bytes: Array[Byte]): Double =
    Sketches.heapifySketch(Memory.wrap(bytes)).getEstimate

  private def heap(b: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(b))

  def thetaIntersectEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildIntersection()
      .intersect(heap(a), heap(b)).getEstimate

  def thetaAnotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB().aNotB(heap(a), heap(b)).getEstimate

  def thetaBound(bytes: Array[Byte], numStdDev: Int, upper: Boolean): Double = {
    val sk = heap(bytes)
    if (upper) sk.getUpperBound(numStdDev) else sk.getLowerBound(numStdDev)
  }

  def kllQuantile(bytes: Array[Byte], q: Double): Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  }

  def kllRank(bytes: Array[Byte], v: Double): Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) Double.NaN
    else sk.getRank(v, QuantileSearchCriteria.INCLUSIVE)
  }

  /** The SCALE.md theta sizing rule as code: the smallest lgk whose
    * nominal entry count resolves an intersection of `minOverlap`
    * distinct keys to `relErr` relative error at `numStdDev` σ, when
    * the largest sketched set holds `maxDistinct` keys.
    *
    * Derivation (measured at the sf1 rehearsal, SCALE.md "Contract
    * flags at sf1"): intersection relative error ≈ numStdDev /
    * √(overlap·θ) with θ ≈ k/n for the larger set, so the bound needs
    * overlap·θ ≥ (numStdDev/relErr)² — the "o·θ ≳ 1600" rule at the
    * 5%/2σ defaults — i.e. k ≥ (numStdDev/relErr)²·n/overlap. When
    * that k reaches n the sketch is exact-mode and error is zero, so
    * the formula degrades gracefully for small sets. Feed `maxDistinct`
    * from an x80-style preflight estimate (pad HLL's own ~2% error
    * before calling). Result clamped to DataSketches' valid lgk range.
    */
  def lgkFor(minOverlap: Long, maxDistinct: Long, relErr: Double = 0.05,
             numStdDev: Int = 2): Int = {
    require(minOverlap > 0, s"minOverlap must be positive: $minOverlap")
    require(maxDistinct > 0, s"maxDistinct must be positive: $maxDistinct")
    require(relErr > 0.0 && relErr < 1.0, s"relErr out of (0,1): $relErr")
    val needK = math.pow(numStdDev / relErr, 2) * maxDistinct / minOverlap
    val lgk = math.ceil(math.log(math.max(needK, 16.0)) / math.log(2.0)).toInt
    math.min(math.max(lgk, 5), 26)
  }

  // ---- DataFrame API surface ----

  /** Aggregate raw keys into a serialized theta sketch (binary). */
  def thetaAgg(key: Column, lgNomEntries: Int = 12): Column =
    Bridge.toCol(ThetaSketchAgg(Bridge.toExpr(key), lgNomEntries)
      .toAggregateExpression())

  /** Merge serialized theta sketches (the rollup path — per-slice
    * sketches persist; range queries union them without rescanning). */
  def thetaUnionAgg(sketch: Column, lgNomEntries: Int = 12): Column =
    Bridge.toCol(ThetaUnionAgg(Bridge.toExpr(sketch), lgNomEntries)
      .toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    Bridge.toCol(ThetaEstimate(Bridge.toExpr(sketch)))

  /** Lower/upper confidence bound at `numStdDev` ∈ {1,2,3} — the
    * error bar that turns any sketch estimate into an auditable
    * interval (exact-mode sketches collapse it to the estimate). */
  def thetaLowerBound(sketch: Column, numStdDev: Int = 2): Column =
    Bridge.toCol(ThetaBound(Bridge.toExpr(sketch), numStdDev, upper = false))

  def thetaUpperBound(sketch: Column, numStdDev: Int = 2): Column =
    Bridge.toCol(ThetaBound(Bridge.toExpr(sketch), numStdDev, upper = true))

  def thetaIntersectEstimate(a: Column, b: Column): Column =
    Bridge.toCol(ThetaSetEstimate(Bridge.toExpr(a), Bridge.toExpr(b),
      intersect = true))

  def thetaAnotBEstimate(a: Column, b: Column): Column =
    Bridge.toCol(ThetaSetEstimate(Bridge.toExpr(a), Bridge.toExpr(b),
      intersect = false))

  /** Aggregate a double column into a serialized KLL quantile sketch. */
  def kllAgg(value: Column, k: Int = 200): Column =
    Bridge.toCol(KllDoublesAgg(Bridge.toExpr(value), k)
      .toAggregateExpression())

  /** Merge serialized KLL sketches. */
  def kllMergeAgg(sketch: Column, k: Int = 200): Column =
    Bridge.toCol(KllMergeAgg(Bridge.toExpr(sketch), k)
      .toAggregateExpression())

  def kllQuantile(sketch: Column, q: Column): Column =
    Bridge.toCol(KllQuantileExpr(Bridge.toExpr(sketch), Bridge.toExpr(q)))

  def kllRank(sketch: Column, v: Column): Column =
    Bridge.toCol(KllRankExpr(Bridge.toExpr(sketch), Bridge.toExpr(v)))
}

/** Shared shell for the two theta aggregates: buffer is a theta
  * `Union`; partial state travels as compact-sketch bytes (the same
  * bytes [[eval]] emits, so a persisted sketch column and an in-flight
  * aggregation buffer are interchangeable — that equivalence IS the
  * ledger pattern). */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  def lgNomEntries: Int

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false

  final override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()

  final override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  final override def eval(buf: Union): Any = buf.getResult.toByteArray

  final override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  final override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }
}

/** `graft_theta_agg(key[, lgk])` — distinct-set sketch of raw keys. */
case class ThetaSketchAgg(
    child: Expression,
    lgNomEntries: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def prettyName: String = "graft_theta_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_agg needs long/int/string/binary key, got $dt")
  }

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      // UTF8String bytes == String.getBytes(UTF_8), so this matches
      // DataSketches' update(String) hashing
      case StringType  => buf.update(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType  => buf.update(v.asInstanceOf[Array[Byte]])
      case dt => throw new IllegalStateException(s"unreachable: $dt")
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** `graft_theta_union_agg(sketch[, lgk])` — union serialized sketches. */
case class ThetaUnionAgg(
    child: Expression,
    lgNomEntries: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def prettyName: String = "graft_theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_union_agg needs binary sketches, got $dt")
  }

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketches.heapifySketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** `graft_theta_estimate(sketch)` — distinct estimate of a sketch. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_estimate needs binary sketch, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    SketchFns.thetaEstimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchFns.thetaEstimate($c)")

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** `graft_theta_lb(sketch, nsd)` / `graft_theta_ub(sketch, nsd)` —
  * confidence bounds on a sketch's distinct estimate. */
case class ThetaBound(child: Expression, numStdDev: Int, upper: Boolean)
    extends UnaryExpression {

  require(numStdDev >= 1 && numStdDev <= 3,
    s"numStdDev must be 1..3, got $numStdDev")

  override def prettyName: String =
    if (upper) "graft_theta_ub" else "graft_theta_lb"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary sketch, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    SketchFns.thetaBound(input.asInstanceOf[Array[Byte]], numStdDev, upper)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchFns.thetaBound($c, $numStdDev, $upper)")

  override protected def withNewChildInternal(c: Expression): ThetaBound =
    copy(child = c)
}

/** `graft_theta_intersect_est(a, b)` / `graft_theta_anotb_est(a, b)` —
  * set-operation estimates over two serialized sketches. These run
  * per-GROUP (a handful of rows), never per-datum, so the set-op
  * object allocation is off the hot path. */
case class ThetaSetEstimate(left: Expression, right: Expression,
    intersect: Boolean) extends BinaryExpression {

  override def prettyName: String =
    if (intersect) "graft_theta_intersect_est" else "graft_theta_anotb_est"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary, binary) sketches, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (intersect)
      SketchFns.thetaIntersectEstimate(
        a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    else
      SketchFns.thetaAnotBEstimate(
        a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (intersect) "thetaIntersectEstimate" else "thetaAnotBEstimate"
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SketchFns.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaSetEstimate =
    copy(left = l, right = r)
}

/** Shared shell for the two KLL aggregates (raw doubles / serialized
  * sketches), mirroring [[ThetaAggBase]]. */
abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  def k: Int

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false

  final override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  final override def merge(a: KllDoublesSketch,
      b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  final override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  final override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  final override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `graft_kll_agg(x[, k])` — quantile sketch over a double column. */
case class KllDoublesAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {

  override def prettyName: String = "graft_kll_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_agg needs double (cast upstream), got $dt")
  }

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllDoublesAgg =
    copy(child = c)
}

/** `graft_kll_merge_agg(sketch[, k])` — merge serialized KLL sketches. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {

  override def prettyName: String = "graft_kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge_agg needs binary sketches, got $dt")
  }

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** `graft_kll_quantile(sketch, q)` — estimated value at rank q
  * (INCLUSIVE search, matching `frac(x <= v)` as the exact dual). */
case class KllQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_kll_quantile"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_quantile needs (binary, double), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchFns.kllQuantile(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SketchFns.kllQuantile($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantileExpr =
    copy(left = l, right = r)
}

/** `graft_kll_rank(sketch, v)` — estimated rank of a value. */
case class KllRankExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_kll_rank"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_rank needs (binary, double), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchFns.kllRank(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SketchFns.kllRank($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllRankExpr =
    copy(left = l, right = r)
}
