package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine BPE tokenizer TRAINING (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the terminal model-side artifact of an LLM data pipeline, learned
  * as DataFrame algebra with no driver-side corpus state.
  *
  * Industrial BPE trainers are two-phase, and so is this one:
  *
  *   1. ONE corpus-scale pass builds the word-frequency table — at
  *      100 TB this is the only heavy scan, a single hash aggregation
  *      on `lower`-cased whitespace tokens (the same `\S+` tokenizer
  *      the whole selection stack shares).
  *   2. Merge rounds run on the word-TYPE table (millions of rows on
  *      a web corpus, never the corpus itself). Each round is one
  *      flatMap+hash-agg to count adjacent symbol pairs weighted by
  *      word frequency, a 1-row argmax (cnt desc, pair asc — the
  *      deterministic tie-break), and a broadcast `replace` applying
  *      the merge. No collect: the chosen pair rides a 1-row
  *      localCheckpoint + broadcast crossJoin (the b2 scalar idiom),
  *      so k merges are k linear passes over the type table.
  *
  * Symbol representation (the oracle contract): a word's symbol
  * sequence is a single string with ONE sentinel space at each end
  * and TWO spaces between symbols, e.g. "ab" → " a  b ". Applying a
  * merge is then plain left-to-right non-overlapping
  * `replace(syms, " x  y ", " xy ")` — and the double-space interior
  * is load-bearing: each match consumes only the FIRST of the two
  * trailing spaces, so the remainder still starts with a space and
  * an immediately following occurrence ("a b a b") is merged too,
  * exactly BPE's greedy semantics. With single spaces the first
  * replacement would swallow the separator and silently skip every
  * adjacent occurrence. Both Spark's `replace` and DuckDB's
  * `replace` scan leftmost non-overlapping, so one recurrence
  * definition serves engine and oracle (the x97 generated-oracle
  * discipline).
  */
object Tokenize {

  /** Phase 1: the corpus-scale pass. (word, freq) over lowercased
    * `\S+` tokens — one hash aggregation, the only stage that ever
    * touches the full corpus. */
  def wordFreq(df: DataFrame, text: Column): DataFrame =
    df.select(explode(
        regexp_extract_all(lower(text), lit("\\S+"), lit(0)))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** " a  b " initial symbol string for a word: one char per symbol,
    * double-space interior, single-space sentinels. */
  private def initSyms(word: Column): Column =
    concat(lit(" "),
      rtrim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** Adjacent symbol pairs of a syms string, exploded, one row per
    * occurrence, carrying the word's freq. Pair display form is
    * "x y" (single space). */
  private def pairsOf(syms: DataFrame): DataFrame =
    syms
      .withColumn("arr", split(trim(col("syms")), "  "))
      .filter(size(col("arr")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(arr) - 1), " +
          "i -> concat(element_at(arr, i), ' ', " +
          "element_at(arr, i + 1)))")).as("pair"))

  /** Phase 2: `merges` BPE merge rounds over the (word, freq) type
    * table. Returns one row per round:
    * (rank, pair, merged, cnt, corpus_tokens) where `cnt` is the
    * frequency-weighted occurrence count that won the round and
    * `corpus_tokens` the total corpus token count AFTER applying the
    * merge — the training curve a tokenizer build publishes.
    *
    * Fails fast if the corpus runs out of mergeable pairs before
    * `merges` rounds (an empty argmax would silently empty every
    * later round through the crossJoin; callers size `merges` to the
    * corpus, exactly like lgkFor sizes sketches). */
  def bpeTrain(words: DataFrame, merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    var syms = words
      .select(initSyms(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    var out: DataFrame = null
    for (r <- 1 to merges) {
      // 1-row argmax, materialized executor-side (never collected)
      val best = pairsOf(syms)
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1)
        .localCheckpoint()
      require(!best.isEmpty,
        s"bpeTrain: no adjacent pairs left at round $r — corpus " +
          s"supports fewer than $merges merges")
      // apply the merge: " x  y " → " xy " everywhere
      syms = syms.crossJoin(broadcast(best.select(col("pair"))))
        .withColumn("syms", expr(
          "replace(syms, concat(' ', replace(pair, ' ', '  '), ' '), " +
            "concat(' ', replace(pair, ' ', ''), ' '))"))
        .select(col("syms"), col("freq"))
        .localCheckpoint()
      val ct = syms.agg(
        sum(col("freq") *
          size(split(trim(col("syms")), "  "))).as("corpus_tokens"))
      val row = best.crossJoin(ct)
        .select(lit(r).as("rank"), col("pair"),
          regexp_replace(col("pair"), " ", "").as("merged"),
          col("cnt"), col("corpus_tokens"))
      out = if (out == null) row else out.unionByName(row)
    }
    out
  }

  /** The ENCODE step: apply a trained merge table to the word-TYPE
    * table, returning the (word, n_sub) subword-count dictionary.
    * Encoding a corpus is then ONE broadcast join of this dictionary
    * into the doc→word stream — the dictionary-encode shape (p17):
    * per-type work happens once, corpus-grain work is a join, never
    * a per-document merge loop.
    *
    * `merges` is the k-row trained model ([[bpeTrain]] output);
    * fetching it to the driver is the b2 bloom-bytes model-fetch
    * idiom — the model is KBs by construction (k pairs), and it
    * folds into ONE k-deep replace() column expression, fully
    * codegen'd, applied in rank order (BPE's apply-in-training-order
    * rule). */
  def bpeSubwordCounts(words: DataFrame, merges: DataFrame): DataFrame = {
    val pairs = merges.orderBy(col("rank")).collect()
      .map(_.getAs[String]("pair"))
    val symsFinal = pairs.foldLeft(initSyms(col("word"))) { (c, p) =>
      call_function("replace", c,
        lit(" " + p.replace(" ", "  ") + " "),
        lit(" " + p.replace(" ", "") + " "))
    }
    words.select(col("word"), col("freq"),
      size(split(trim(symsFinal), "  ")).as("n_sub"))
  }
}
