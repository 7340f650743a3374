package graft

import org.apache.spark.sql.functions._
import graft.functions.{DeflateRatioExpr, NfcNormalizeExpr}
import graft.operators.Similarity

/** Round-9 additions: NFC normalization + deflate-ratio native
  * expressions, SQ8 int8-shortlist ANN, derived-lake scale-up
  * invariants.
  */
class Round9Spec extends GraftSuite {

  test("NfcNormalizeExpr: composes decomposed forms; identity on NFC text") {
    import spark.implicits._
    val rows = Seq(
      ("ascii only", "ascii only"),
      ("Café", "Café"),                 // combining acute
      ("가", "가"),                  // Hangul jamo → 가
      ("Ångström", "Ångström"), // ring + diaeresis
      ("already é가Å", "already é가Å"),
      ("", "")).toDF("raw", "expected")
    val out = rows.select(col("expected"),
      NfcNormalizeExpr.nfc(col("raw")).as("got")).collect()
    out.foreach(r => assert(r.getString(1) === r.getString(0),
      s"NFC mismatch: got ${r.getString(1)}, want ${r.getString(0)}"))
    // null propagates (UnaryExpression null-safety)
    val n = rows.select(NfcNormalizeExpr.nfc(lit(null).cast("string")))
      .first()
    assert(n.isNullAt(0))
  }

  test("NfcNormalizeExpr: SQL surface via graft_nfc matches the column API") {
    graft.plans.GraftExtensions.registerAll(spark)
    // the combining mark goes in as a literal: Spark's chr() is
    // mod-256 ASCII (unlike DuckDB's codepoint chr), so chr(769)
    // would silently produce  here
    val got = spark.sql(s"SELECT graft_nfc('Café') AS s")
      .first().getString(0)
    assert(got === "Café")
  }

  test("DeflateRatioExpr: repetitive text compresses far below prose; bounds hold") {
    import spark.implicits._
    val prose = "It was the best of times, it was the worst of times, " +
      "it was the age of wisdom, it was the age of foolishness."
    val rows = Seq(
      ("rep", "spam ham " * 200),
      ("prose", prose * 3),
      ("short", "xy"),
      ("empty", "")).toDF("k", "s")
    val got = rows.select(col("k"), DeflateRatioExpr.deflateRatio(col("s"))
      .as("r")).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("rep") < 0.05, s"repeated text should crush: ${got("rep")}")
    assert(got("prose") > got("rep") * 3)
    assert(got("empty") === 1.0d)
    // tiny inputs sit ABOVE 1.0 (zlib header+checksum overhead
    // dominates: "xy" → ~5.0) — the signal is only meaningful for
    // real documents, which is why x70's range contract applies to
    // the corpus, not to arbitrary strings
    assert(got("short") > 1.0)
    got.values.foreach(v => assert(v > 0.0))
    assert(got("prose") <= 1.0)
    // deterministic across evaluations (thread-local deflater reset)
    val again = rows.select(DeflateRatioExpr.deflateRatio(col("s")).as("r"))
      .collect().map(_.getDouble(0)).sorted
    assert(again.toSeq === got.values.toSeq.sorted)
  }

  test("sq8TopK: shortlist >= corpus degenerates to exact brute force") {
    import spark.implicits._
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(16)(d =>
        (math.sin(i * 2.17 + d * 0.71) * (1.0 + d * 0.05)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 5)
    val sq = Similarity.sq8TopK(q, vecs, "vec_id", "embedding",
      k = 4, shortlist = Int.MaxValue)
    val brute = Similarity.bruteTopK(q, vecs, "vec_id", "embedding", 4)
    assert(sq.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(sq).count() === 0L)
  }

  test("sq8TopK: tight shortlist keeps high recall on clustered vectors") {
    import spark.implicits._
    // 8 clusters of 10 near-identical vectors: int8 rounding must not
    // scramble within-cluster ordering out of a 12-wide shortlist
    val vecs = (0L until 80L).map { i =>
      val c = (i % 8).toInt
      (i, Array.tabulate(16)(d =>
        (math.cos(c * 1.3 + d) + 0.001 * ((i / 8) % 10)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 4)
    val sq = Similarity.sq8TopK(q, vecs, "vec_id", "embedding",
      k = 5, shortlist = 12)
    val brute = Similarity.bruteTopK(q, vecs, "vec_id", "embedding", 5)
    val hit = brute.as("b").join(sq.as("l"),
      col("b.query_id") === col("l.query_id") &&
        col("b.neighbor_id") === col("l.neighbor_id")).count()
    assert(hit >= 18, s"recall ${hit}/20 below 0.9")
  }

  test("ScaleRehearsal.copyOf: keys offset, dims fixed, text/vec decorrelated") {
    val sfDir = SparkTestBase.sfDir
    val li0 = ScaleRehearsal.copyOf(spark, sfDir, "lineitem", 0)
    val li3 = ScaleRehearsal.copyOf(spark, sfDir, "lineitem", 3)
    // copy-3 keys live in the 3e11 band; row counts identical
    assert(li3.agg(min(col("l_orderkey"))).first().getLong(0) >=
      3L * ScaleRehearsal.KeyOffset)
    assert(li0.count() === li3.count())
    // join relationships survive the offset: every copy-3 lineitem
    // still finds its copy-3 order
    val o3 = ScaleRehearsal.copyOf(spark, sfDir, "orders", 3)
    assert(li3.join(o3, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() === 0L)
    // documents: cross-copy token overlap collapses (Caesar rotation)
    val d0 = ScaleRehearsal.copyOf(spark, sfDir, "documents", 0)
      .limit(30).select(explode(split(lower(col("text")), "\\s+")).as("t"))
    val d1 = ScaleRehearsal.copyOf(spark, sfDir, "documents", 1)
      .limit(30).select(explode(split(lower(col("text")), "\\s+")).as("t"))
    val overlap = d0.distinct().join(d1.distinct(), Seq("t")).count()
    val base = d0.distinct().count()
    assert(overlap.toDouble / base < 0.1,
      s"cross-copy shingle overlap too high: $overlap/$base")
    // n_chars metadata stays truthful under rotation
    val bad = ScaleRehearsal.copyOf(spark, sfDir, "documents", 2)
      .filter(length(col("text")) =!= col("n_chars")).count()
    val bad0 = ScaleRehearsal.copyOf(spark, sfDir, "documents", 0)
      .filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad === bad0, "rotation must not change text lengths")
  }
}
