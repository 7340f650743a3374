package graft.functions

import java.text.Normalizer
import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Dedup preprocessing needs canonical text BEFORE hashing: 'é' as
  * U+00E9 and as 'e'+U+0301 are the same user-visible string but
  * different shingle sets, so un-normalized corpora under-deduplicate
  * exactly on the multilingual slices where near-dup detection matters
  * most (the reference's zh-TW sources are full of fullwidth/composed
  * variants — `etl/utils/udfs.py` normalizes per-field by hand; this
  * is the engine-level form). Spark has no normalization built-in, so
  * this is extension-ladder rung (b): a scalar `Expression` with
  * `doGenCode`, not a UDF. NFC (composition) matches DuckDB's
  * `nfc_normalize`, which is what lets the oracle hash-check the
  * result rather than settling for a contract row.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * almost always true on real corpora (ASCII is trivially NFC), so the
  * rewrite cost is paid only by the rows that need it.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc needs string, got $dt")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalizeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column = Bridge.toCol(NfcNormalizeExpr(Bridge.toExpr(c)))
}

/** DEFLATE compression ratio of a string's UTF-8 bytes — the
  * model-free repetitiveness signal used by large-corpus quality
  * filters (RefinedWeb/MassiveText-style pipelines drop documents that
  * compress "too well": boilerplate, tag soup, keyword stuffing, and
  * generator loops all land far below natural prose, which deflates to
  * roughly 0.3–0.6 of its raw size). Complements the exact n-gram
  * repetition counters in [[graft.operators.TextOps.repetitionStats]]:
  * those catch literal repeats; the ratio also catches approximate and
  * structural redundancy that no fixed n-gram length sees.
  *
  * Returns compressedBytes / rawBytes as double (empty string → 1.0).
  * Level 6 (zlib default) pinned explicitly so the signal is stable
  * across JDK default changes. One `Deflater` per thread, `reset`
  * between rows — allocation-free on the hot path.
  */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_ratio needs string, got $dt")
    }

  override def nullSafeEval(input: Any): Any =
    DeflateRatioExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateRatioExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

object DeflateRatioExpr {

  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0d
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val b = buf.get()
    while (!d.finished()) total += d.deflate(b)
    total.toDouble / bytes.length
  }

  def deflateRatio(c: Column): Column =
    Bridge.toCol(DeflateRatioExpr(Bridge.toExpr(c)))
}
