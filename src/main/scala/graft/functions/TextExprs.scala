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
  * most. The reference's zh-TW pipeline normalizes per-field by hand —
  * fb_scraper/normalization.py:7-66 rewrites each scraped date string
  * case-by-case — rather than canonicalizing text once at the engine
  * level; this expression is that engine-level form for Unicode
  * composition. Spark has no normalization built-in, so
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

  // Lifecycle note: the per-thread Deflater holds native zlib memory
  // that is only reclaimed when the THREAD dies (ThreadLocal offers no
  // close hook; Deflater's Cleaner runs at GC of the Java object, which
  // the ThreadLocal pins while the thread lives). Executor task-thread
  // pools are long-lived and bounded, so steady state is
  // O(pool size × ~256 KB) — acceptable. Under heavy thread churn
  // (repeated short-lived sessions in one JVM) prefer a pooled
  // Deflater with explicit end().
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

/** Jaro-Winkler similarity as a native codegen'd expression — the
  * entity-resolution string metric Spark lacks (its built-in is
  * levenshtein, an edit DISTANCE; ER blocking/verify wants a
  * normalized similarity that rewards shared prefixes, which is why
  * every MDM product defaults to Jaro-Winkler for person/org names).
  * Complements the er1/j7 fuzzy-match family: levenshtein gates the
  * SNM verify, this scores the survivors.
  *
  * Exact semantics pinned to the standard algorithm so DuckDB's
  * `jaro_winkler_similarity` can hash-check it (probed empirically:
  * match window ⌊max(n1,n2)/2⌋−1, transpositions halved, Winkler
  * boost p=0.1 over ≤4 prefix chars applied only when jaro > 0.7,
  * and 0.0 when either string is empty — including both-empty).
  * Arithmetic is the same small rational sums in IEEE double in the
  * same order, so equality survives round(·, 4) oracles with ulps to
  * spare.
  *
  * Character model: UTF-16 code units (String.charAt). Identical to
  * codepoint-based implementations for all BMP text; strings with
  * surrogate pairs (emoji, rare CJK extensions) may count lengths
  * differently than a codepoint engine — normalize such data before
  * ER matching (which name-matching pipelines do anyway). */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "graft_jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler needs (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinklerExpr =
    copy(left = l, right = r)
}

object JaroWinklerExpr {

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val n1 = a.length
    val n2 = b.length
    if (n1 == 0 || n2 == 0) return 0.0d
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val ma = new Array[Boolean](n1)
    val mb = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0d
    // transpositions: matched chars out of order, halved
    var t = 0
    var j = 0
    i = 0
    while (i < n1) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / n1 + md / n2 + (md - t / 2) / md) / 3.0d
    if (jaro <= 0.7d) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n1, n2))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1d * (1.0d - jaro)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.toCol(JaroWinklerExpr(Bridge.toExpr(a), Bridge.toExpr(b)))
}
