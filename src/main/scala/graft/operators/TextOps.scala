package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.ColFns

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. All pure Catalyst
  * column expressions — per-row, shuffle-free, codegen'd, so they stream
  * through a 100 TB scan at parquet-read speed.
  */
object TextOps {

  /** Marker lexicons for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny and deterministic; ties resolve by the fixed
    * language order below (en first). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "y"),
  )

  private def markerHits(text: Column, words: Seq[String]): Column = {
    // count whole-word occurrences of any marker
    val pat = words.mkString("\\b(", "|", ")\\b")
    size(regexp_extract_all(lower(text), lit(pat), lit(0)))
  }

  /** Heuristic language ID: CJK characters ⇒ zh; otherwise the language
    * with the most marker-word hits (en on all-zero / ties earlier in
    * [[langMarkers]] order). */
  def langId(text: Column): Column = {
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val scores = langMarkers.map { case (l, ws) => (l, markerHits(text, ws)) }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (l, s)) =>
        when(s > acc.getField("score"),
          struct(s.as("score"), lit(l).as("lang"))).otherwise(acc)
    }
    when(cjk > 0, "zh").otherwise(best.getField("lang"))
  }

  /** Quality features + a composite score in [0,1]:
    * length, token count, mean token length, punctuation ratio, stopword
    * ratio. Score = weighted mix the way heuristic quality filters (C4,
    * Gopher rules) combine evidence. */
  def qualityFeatures(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = ColFns.tokenCount(text)
    df.select(
      id.as("id"),
      length(text).as("n_chars"),
      toks.as("n_tokens"),
      round(when(toks === 0, 0.0d)
        .otherwise(length(regexp_replace(text, "\\s+", "")).cast(DoubleType) /
          toks.cast(DoubleType)), 4).as("mean_token_len"),
      round(ColFns.punctRatio(text), 4).as("punct_ratio"),
      round(ColFns.stopwordRatio(text), 4).as("stopword_ratio"))
      .withColumn("quality_score", round(
        least(lit(1.0d), col("n_tokens").cast(DoubleType) / 100.0d) * 0.4d
          + (lit(1.0d) - least(lit(1.0d), col("punct_ratio") * 5.0d)) * 0.3d
          + least(lit(1.0d), col("stopword_ratio") * 4.0d) * 0.3d, 4))
  }

  /** Token counts, whitespace + BPE-ish. */
  def tokenCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"),
      ColFns.tokenCount(text).as("ws_tokens"),
      ColFns.bpeTokenCount(text).as("bpe_tokens"))

  /** Content fingerprints: normalized md5 + 64-bit xxhash. */
  def fingerprints(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"),
      ColFns.fingerprint(text).as("md5_fp"),
      xxhash64(regexp_replace(trim(lower(text)), "\\s+", " ")).as("xx64_fp"))
}
