package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash over a token array — bit-identical to the
  * composed Catalyst form in [[graft.operators.Dedup.simhash60]]
  * (md5-derived per-token hashes, ±1 votes per bit, ties set the bit)
  * but evaluated as one primitive loop instead of O(tokens × 60)
  * interpreted higher-order-function steps per document. The per-token
  * hash is the top 60 bits of md5 (== the first 15 hex digits parsed
  * base-16, i.e. [[ColFns.portableHash60]] of the token), so the
  * fingerprint stays engine-portable and the DuckDB oracle unchanged.
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 needs array<string>, got $dt")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash60Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash60Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}

object SimHash60Expr {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes): first 8 digest bytes big-endian,
    * unsigned-shifted right 4 — equal to parsing the first 15 hex
    * digits base-16. */
  private def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Votes over distinct-ified token arrays; ties (vote = 0) set the
    * bit — exactly the composed form's semantics. Callers pass the
    * already-distinct token array (the builder applies array_distinct). */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = hash60(tokens.getUTF8String(t).getBytes)
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) >= 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** Column builder over a token-array column. */
  def simhash60(tokens: Column): Column =
    Bridge.toCol(SimHash60Expr(Bridge.toExpr(tokens)))
}
