package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native LSH band keys over a shingle array — bit-identical to the
  * composed form in [[graft.operators.Dedup.lshBandKeysDirect]] over
  * pre-hashed shingles (it calls Spark's own `XXH64` primitives, so
  * every hash matches the `xxhash64(...)` built-in exactly), but all
  * `k` permutation minima come from ONE traversal of the array in a
  * primitive loop. The composed form plans k=32 separate
  * `array_min(transform(...))` scans per row; this is the
  * custom-Expression rung of the extension ladder (compose built-ins →
  * native Expression → custom plan) pulled because the pairs path is
  * the hottest per-row work in the dedup stack.
  *
  * Semantics per permutation j (seed chain of the composed
  * `xxhash64(lit(j), h)`): candidate = hashLong(h, hashInt(j, 42)),
  * h = hashUnsafeBytes(shingle, 42); a null shingle hashes to the bare
  * seed VALUE 42 (`xxhash64(null)` returns its seed), which then
  * remixes like any other h. Band key b = seed-chain of
  * `xxhash64(lit(b), min_0…)`.
  */
case class MinHashBands64Expr(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  require(k > 0 && bands > 0 && k % bands == 0,
    s"k ($k) must be a positive multiple of bands ($bands)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_bands needs array<string>, got $dt")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashBands64Expr.compute(input.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashBands64Expr.compute($c, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashBands64Expr = copy(child = newChild)
}

object MinHashBands64Expr {

  private val SEED = 42L

  def compute(tokens: ArrayData, k: Int, bands: Int): ArrayData = {
    val r = k / bands
    // permutation seeds: hashInt(j, 42) — the seed state after the
    // built-in hashes the literal j
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { seeds(j) = XXH64.hashInt(j, SEED); j += 1 }
    val n = tokens.numElements()
    val keys = new Array[Long](bands)
    if (n == 0) {
      // empty array ⇒ all minima null ⇒ the composed chain reduces to
      // hashing the band literal alone
      var b = 0
      while (b < bands) { keys(b) = XXH64.hashInt(b, SEED); b += 1 }
      return new GenericArrayData(keys)
    }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var t = 0
    while (t < n) {
      // null element: xxhash64(null) = its seed (42), then remixed
      // like any real hash — matches the composed pre-hashed form
      val h = if (tokens.isNullAt(t)) SEED
      else {
        val s = tokens.getUTF8String(t)
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), SEED)
      }
      var p = 0
      while (p < k) {
        val cand = XXH64.hashLong(h, seeds(p))
        if (cand < mins(p)) mins(p) = cand
        p += 1
      }
      t += 1
    }
    var b = 0
    while (b < bands) {
      var key = XXH64.hashInt(b, SEED)
      var i = b * r
      while (i < (b + 1) * r) { key = XXH64.hashLong(mins(i), key); i += 1 }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Column builder over a shingle-array column. */
  def minhashBands(shingles: Column, k: Int = 32, bands: Int = 8): Column =
    Bridge.toCol(MinHashBands64Expr(Bridge.toExpr(shingles), k, bands))
}
