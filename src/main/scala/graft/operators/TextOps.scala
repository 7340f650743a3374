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

  /** The published Gopher r7 stopword probe list (Rae et al. 2021,
    * Appendix A): eight high-frequency ENGLISH function words. On a
    * corpus whose vocabulary lacks ≥ 2 of them (non-English, domain
    * jargon, synthetic), r7 is constant-false and the whole bundle
    * silently gates out everything — which is why [[gopherRules]]
    * takes the probes as a parameter and [[corpusProbes]] exists. */
  val gopherProbes: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Corpus-calibrated probe set for [[gopherRules]]' r7: the top-`k`
    * tokens by corpus frequency, as a 1-row DataFrame with an array
    * column `probes`. Zipf's law makes the most frequent tokens of any
    * natural-language corpus its function words — exactly the role the
    * published English list plays — so deriving the probes from the
    * corpus itself generalizes the rule to any language or domain
    * instead of hard-failing off-English. One token-grain aggregation
    * riding the same scan grain as the rules themselves; the result is
    * k strings, broadcast with the 1-row scalar idiom. Ties break by
    * token asc; array sorted for determinism (membership is
    * order-independent). */
  def corpusProbes(df: DataFrame, text: Column, k: Int = 8): DataFrame = {
    val toks = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    df.select(explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(k)
      .agg(sort_array(collect_list(col("tok"))).as("probes"))
  }

  /** Per-GROUP corpus probes — [[corpusProbes]] partitioned (one
    * probe set per language, per source, …). FineWeb-style pipelines
    * are per-language for exactly this reason: a single global probe
    * list cannot serve a multilingual corpus — measured on the
    * 10-rotation sf1 rehearsal lake, GLOBAL top-8 probes pass 0 of
    * 50k docs (rotations tie in frequency and the winners scatter
    * across rotations) while per-language probes pass 99%. Output is
    * one (`grp`, `probes`) row per group — |groups| rows,
    * broadcastable. The rank window partitions on the group over
    * VOCAB-grain rows (per-group distinct tokens), not doc grain. */
  def corpusProbesBy(df: DataFrame, group: Column, text: Column,
                     k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    val tf = df.select(group.as("grp"), explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("n").desc, col("tok").asc)
    tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(col("tok"))).as("probes"))
  }

  /** The Gopher quality-rule bundle (Rae et al., "Scaling Language
    * Models: ... Gopher", 2021, Appendix A — the published heuristic
    * set most corpus pipelines start from), per doc as one flag per
    * rule plus the conjunction:
    *  r1 word count ∈ [50, 100k]; r2 mean word length ∈ [3, 10];
    *  r3 (hash + ellipsis) to word ratio ≤ 0.1; r4 < 90% of lines
    *  bullet-led; r5 < 30% of lines ellipsis-terminated; r6 ≥ 80% of
    *  words contain an alphabetic char; r7 ≥ 2 distinct hits from the
    *  stopword probe list (default: the published 8-word English
    *  list; pass a corpus-appropriate array — e.g. [[corpusProbes]] —
    *  for any other corpus, or r7 goes constant-false).
    * Pure column arithmetic — every ratio is a single division on both
    * engines so the flags hash-match; zero-word/zero-line docs guard
    * to false/true per the rule's direction rather than dividing. */
  def gopherRules(df: DataFrame, id: Column, text: Column): DataFrame =
    gopherRules(df, id, text, array(gopherProbes.map(lit): _*))

  /** [[gopherRules]] with an explicit r7 probe ARRAY COLUMN — either a
    * literal list or a corpus-derived one joined in per-row (the
    * [[corpusProbes]] 1-row broadcast). */
  def gopherRules(df: DataFrame, id: Column, text: Column,
                  probesCol: Column): DataFrame = {
    val w0 = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    val w = filter(w0, x => length(x) > 0)
    val nw = size(w)
    val nwD = nw.cast(DoubleType)
    val meanLen = length(regexp_replace(text, "\\s+", ""))
      .cast(DoubleType) / nwD
    val nHash = length(text) - length(translate(text, "#", ""))
    val nEll = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    val nl = size(lines)
    val bulletFrac = size(filter(lines, l => l.rlike("^[-*•]")))
      .cast(DoubleType) / nl.cast(DoubleType)
    val ellFrac = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$")))
      .cast(DoubleType) / nl.cast(DoubleType)
    val alphaFrac = size(filter(w, x => x.rlike("[a-z]")))
      .cast(DoubleType) / nwD
    val stopHits = size(filter(probesCol, s => array_contains(w, s)))
    df.select(id.as("id"), nw.as("n_words"),
      (nw >= 50 && nw <= 100000).as("r1_wordcount"),
      (nw > 0 && meanLen >= 3.0d && meanLen <= 10.0d).as("r2_wordlen"),
      (nw > 0 && (nHash + nEll).cast(DoubleType) / nwD <= 0.1d)
        .as("r3_symbols"),
      (nl === 0 || bulletFrac < 0.9d).as("r4_bullets"),
      (nl === 0 || ellFrac < 0.3d).as("r5_ellipsis"),
      (nw > 0 && alphaFrac >= 0.8d).as("r6_alpha"),
      (stopHits >= 2).as("r7_stopwords"))
      .withColumn("pass", col("r1_wordcount") && col("r2_wordlen") &&
        col("r3_symbols") && col("r4_bullets") && col("r5_ellipsis") &&
        col("r6_alpha") && col("r7_stopwords"))
  }

  /** The heavy-hitter ledger CONTRACT shared by its batch (x89) and
    * streaming (st17) twins: probe the exactly-computed top-5 corpus
    * tokens against a merged frequent-items sketch's deterministic
    * lb ≤ true ≤ ub bounds. `merged` is one row of (sk binary,
    * n_sources) — produced by a batch aggregation or read back from
    * the streaming ledger; sharing this tail is what guarantees the
    * two twins can never silently diverge in tokenizer, tie-break, or
    * flag definition. */
  def freqBoundsContract(docs: DataFrame, merged: DataFrame): DataFrame = {
    import graft.functions.FreqFns
    val toks = split(trim(regexp_replace(lower(col("text")),
      "\\s+", " ")), " ")
    val tok = docs.select(explode(toks).as("tok"))
      .filter(length(col("tok")) > 0)
    val top = tok.groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok").asc).limit(5)
    top.crossJoin(broadcast(merged)) // 1-row scalar idiom
      .select(col("tok").as("token"), col("exact_n"), col("n_sources"),
        (FreqFns.freqLowerBound(col("sk"), col("tok")) <= col("exact_n")
          && col("exact_n") <= FreqFns.freqUpperBound(col("sk"),
            col("tok"))).as("bounds_ok"))
  }

  /** Token counts, whitespace + BPE-ish. */
  def tokenCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"),
      ColFns.tokenCount(text).as("ws_tokens"),
      ColFns.bpeTokenCount(text).as("bpe_tokens"))

  /** Content fingerprints: normalized md5 + a portable 60-bit integer
    * fingerprint ([[ColFns.portableHash60]] — engine-independent, so a
    * downstream system can re-derive and cross-check it). */
  def fingerprints(df: DataFrame, id: Column, text: Column): DataFrame = {
    val norm = regexp_replace(trim(lower(text)), "\\s+", " ")
    df.select(id.as("id"),
      ColFns.fingerprint(text).as("md5_fp"),
      ColFns.portableHash60(norm).as("fp60"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm): hash every token `k`-gram, slide a window of `w`
    * consecutive gram hashes, keep each window's MINIMUM hash. The kept
    * set is a deterministic ~2/(w+1)-density sample of the gram hashes
    * with the winnowing guarantee: any shared run of w+k-1 tokens
    * between two docs contributes at least one SHARED fingerprint —
    * the positional near-dup signal MinHash (set-level, order-blind)
    * cannot give.
    *
    * Shape: gram rows are (id, pos, hash) only — text never enters the
    * window shuffle (the x36 span discipline); one hash-partition per
    * doc id, frame min over w rows, distinct. Hashes are
    * [[ColFns.portableHash60]] so any engine with md5() re-derives the
    * identical fingerprint set.
    *
    * Returns (id, fp) distinct rows. Windows are anchored at positions
    * 1..max(G-w+1, 1) of the G = max(|toks|-k+1, 1) grams, so a doc
    * shorter than w+k-1 tokens still yields exactly one fingerprint
    * (the min over all its grams). */
  def winnowingFingerprints(df: DataFrame, id: Column, text: Column,
                            k: Int = 3, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, "k and w must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    val grams = df
      .select(id.as("id"), toks.as("__t"))
      .withColumn("__ng", greatest(size(col("__t")) - (k - 1), lit(1)))
      .select(col("id"), col("__ng"),
        explode(transform(sequence(lit(1), col("__ng")), i =>
          struct(i.as("pos"),
            ColFns.portableHash60(concat_ws(" ", slice(col("__t"), i, lit(k))))
              .as("h")))).as("g"))
      .select(col("id"), col("__ng"), col("g.pos").as("pos"),
        col("g.h").as("h"))
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min(col("h")).over(win))
      .filter(col("pos") <= greatest(col("__ng") - (w - 1), lit(1)))
      .select(col("id"), col("fp")).distinct()
  }

  /** Document pairs sharing winnowing fingerprints: postings equi-join
    * on the fingerprint (inverted index — only pairs sharing ≥1
    * fingerprint ever materialize), count shared per pair, overlap =
    * shared / min(|fps_a|, |fps_b|). Fingerprints in more than
    * `maxDocFreq` docs are dropped from candidate generation (the x4b
    * stop-shingle discipline — boilerplate fingerprints are the only
    * quadratic skew the postings join has). */
  def winnowingPairs(df: DataFrame, id: Column, text: Column,
                     k: Int = 3, w: Int = 4, minOverlap: Double = 0.5,
                     maxDocFreq: Long = 100L): DataFrame = {
    // the fingerprint set feeds four plan branches (per-doc counts,
    // doc-frequency cutoff, both postings sides) — truncate its
    // lineage once so the k-gram explode + window-min runs once, not
    // four times (the star-CC input discipline)
    val fps = winnowingFingerprints(df, id, text, k, w)
      .localCheckpoint(true)
    val cnt = fps.groupBy(col("id")).agg(count(lit(1)).as("nfp"))
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("dfreq")).filter(col("dfreq") <= maxDocFreq)
      .select("fp")
    val posts = fps.join(rare, Seq("fp"))
    posts.as("a")
      .join(posts.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(cnt.select(col("id").as("id_a"), col("nfp").as("nfp_a")), "id_a")
      .join(cnt.select(col("id").as("id_b"), col("nfp").as("nfp_b")), "id_b")
      .withColumn("overlap", col("shared").cast(DoubleType) /
        least(col("nfp_a"), col("nfp_b")).cast(DoubleType))
      .filter(col("overlap") >= minOverlap)
      .select(col("id_a"), col("id_b"), col("shared"),
        round(col("overlap"), 4).as("overlap"))
  }

  /** Unigram language-model scoring (KenLM-lite): train add-one-smoothed
    * token log-probabilities on the corpus itself, then score each doc
    * by its mean token log-prob — the cheap statistical-quality signal
    * (gibberish, boilerplate, wrong-language text all score far below
    * the corpus mode) a pipeline runs before paying for a neural
    * perplexity pass.
    *
    * Shape: one token-count aggregation (the vocab), one hash join of
    * token rows against it (keyed by token — skewed tokens like "the"
    * are handled by AQE; the joined payload is one double), one doc
    * aggregation. Nothing is driver-side: the vocab stays distributed,
    * so a 10M-type vocabulary at 100 TB never funnels anywhere.
    * ln() and round(…,4) keep the scores engine-reproducible. */
  def unigramLogProb(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tokens = df.select(id.as("id"),
      explode(regexp_extract_all(lower(text), lit("\\S+"), lit(0)))
        .as("tok"))
    val vocab = tokens.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val totals = vocab.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("vsize"))
    val logp = vocab.crossJoin(broadcast(totals)) // 1-row scalar totals
      .withColumn("logp",
        log((col("cnt") + 1.0d) /
          (col("total") + col("vsize")).cast(DoubleType)))
      .select(col("tok"), col("logp"))
    tokens.join(logp, Seq("tok"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"),
        round(avg(col("logp")), 4).as("avg_logp"))
  }

  /** Bigram add-one LM scoring — the context-aware step up from
    * [[unigramLogProb]] (KenLM-lite, order 2): docs scored by the mean
    * ln p(w₂|w₁) of their adjacent token pairs, with
    * p(w₂|w₁) = (c(w₁,w₂)+1) / (c(w₁)+V). A unigram LM scores word
    * CHOICE; the bigram conditional scores word ORDER, which is what
    * separates fluent text from shuffled-bag spam with a plausible
    * vocabulary (quality-filter stacks run both: CCNet/Wenzek for the
    * unigram tier, KenLM n-gram perplexity for this one).
    *
    * Scale shape: bigram pairs come from ARRAY-local adjacency
    * (zip_with over the token array — no per-doc window, no doc-grain
    * sort shuffle), then the same distributed-count + hash-join-back
    * discipline as unigramLogProb: bigram and unigram count tables
    * stay distributed, the only broadcast is the 1-row vocab size.
    * Docs with < 2 tokens have no bigrams and drop out (they carry no
    * order signal). ln() and round(…,4) keep scores
    * engine-reproducible. */
  def bigramLogProb(df: DataFrame, id: Column, text: Column): DataFrame = {
    val arr = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    val docs = df.select(id.as("id"), arr.as("__t"))
    val tokens = docs.select(col("id"), explode(col("__t")).as("tok"))
    val bigrams = docs.filter(size(col("__t")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = tokens.groupBy(col("tok").as("w1"))
      .agg(count(lit(1)).as("c1"))
    val vsize = tokens.agg(countDistinct(col("tok")).as("v"))
    val bi = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val logp = bi.join(uni, Seq("w1"))
      .crossJoin(broadcast(vsize)) // 1-row scalar vocab size
      .withColumn("logp", log((col("c12") + 1.0d) /
        (col("c1") + col("v")).cast(DoubleType)))
      .select(col("w1"), col("w2"), col("logp"))
    bigrams.join(logp, Seq("w1", "w2"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 4).as("avg_logp2"))
  }

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every
    * document by how target-like its hashed n-gram profile is,
    * log w(x) = Σ_b c_b(x)·(log p̂_b − log q̂_b), where c_b are the
    * doc's hashed unigram+bigram counts and p̂/q̂ are add-one-smoothed
    * bucket distributions of the target (`isTarget` rows — the curated
    * seed set) and the raw rest. The top-weighted raw docs are the
    * DSIR selection — the published cheap alternative to
    * classifier-based quality filtering.
    *
    * 100 TB shape: features ride the ingest scan (explode, no vocab
    * state); BOTH distributions train in the same single pass via
    * conditional aggregation on the bucket grain; the learned model is
    * `nBuckets` log-ratios — KBs, broadcast back; per-doc scoring is
    * one (id, bucket) partial agg + that broadcast join. No
    * vocabulary-sized shuffle anywhere; history never rescans if the
    * bucket counts persist as a ledger (m8 discipline — counts are
    * additive). Feature hashing uses portableHash60 (md5-derived) so
    * both engines bucket identically; log-ratios round to 6dp and ride
    * decimal sums so weights hash-match. Docs whose text is empty
    * carry weight 0. */
  def dsirWeights(df: DataFrame, id: Column, text: Column,
                  isTarget: Column, nBuckets: Int = 4096): DataFrame = {
    val feat = dsirFeatures(df, id, text, isTarget, nBuckets)
    dsirWeightsFrom(df, id, feat, dsirCounts(feat), nBuckets)
  }

  /** The (id, tgt, b) hashed feature stream — unigrams + bigrams
    * through portableHash60 mod nBuckets. Shared by the batch trainer
    * (x94), the scorer, and the streaming ledger fold (st18), so the
    * three can never diverge in tokenizer or hashing. */
  def dsirFeatures(df: DataFrame, id: Column, text: Column,
                   isTarget: Column, nBuckets: Int): DataFrame = {
    val arr = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    val docs = df.select(id.as("id"), isTarget.as("tgt"), arr.as("__t"))
    val uni = docs.select(col("id"), col("tgt"),
      explode(col("__t")).as("f"))
    val bi = docs.filter(size(col("__t")) >= 2)
      .select(col("id"), col("tgt"), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("f"))
    uni.unionByName(bi)
      .select(col("id"), col("tgt"),
        pmod(ColFns.portableHash60(col("f")), lit(nBuckets.toLong))
          .as("b"))
  }

  /** Bucket-grain (b, ct, cq) target/raw counts from a feature
    * stream — the DSIR model's SUFFICIENT STATISTIC, and additive:
    * counts from any partition of the corpus sum to the whole-corpus
    * counts, which is what lets st18 maintain them as a streaming
    * ledger whose final model equals the batch model regardless of
    * batching. */
  def dsirCounts(feat: DataFrame): DataFrame =
    feat.groupBy(col("b"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("tgt"), 1L).otherwise(0L)).as("cq"))

  /** Score every doc of `df` against a DSIR count model: smoothed
    * bucket log-ratios (nBuckets rows, broadcast) joined to the doc's
    * (id, bucket) counts; docs with no features weigh 0. `counts` may
    * come from [[dsirCounts]] in the same plan (x94) or from a
    * persisted ledger (st18). */
  def dsirWeightsFrom(df: DataFrame, id: Column, feat: DataFrame,
                      counts: DataFrame, nBuckets: Int): DataFrame = {
    val dec = DecimalType(28, 6)
    val totals = counts.agg(sum(col("ct")).as("nt"),
      sum(col("cq")).as("nq"))
    val ratio = counts.crossJoin(broadcast(totals)) // 1-row scalar idiom
      .select(col("b"), round(
        log((col("ct") + 1.0d) /
          (col("nt") + nBuckets).cast(DoubleType)) -
        log((col("cq") + 1.0d) /
          (col("nq") + nBuckets).cast(DoubleType)), 6).as("lr"))
    val perDoc = feat.groupBy(col("id"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col("id"))
      .agg(round(sum((col("cnt") * col("lr").cast(dec)).cast(dec))
        .cast(DoubleType), 4).as("w"))
    df.select(id.as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("w"), lit(0.0d)).as("w"))
  }

  /** Per-source token-distribution drift: KL(source ‖ corpus) over the
    * global top-`vocabSize` tokens — the mixture-monitoring statistic
    * that catches one source's vocabulary wandering away from the
    * blend (scrape drift, template floods, language creep). Restricting
    * to the corpus top-k makes the statistic robust (every source has
    * mass there after add-one smoothing) and keeps the joined state
    * tiny: top-k via TakeOrderedAndProject, then one (source × k)
    * aggregation — no full-vocab shuffle survives the limit. */
  def sourceTokenDrift(df: DataFrame, source: Column, text: Column,
                       vocabSize: Int = 50): DataFrame = {
    val tokens = df.select(source.as("source"),
      explode(regexp_extract_all(lower(text), lit("\\S+"), lit(0)))
        .as("tok"))
    val top = tokens.groupBy(col("tok")).agg(count(lit(1)).as("gcnt"))
      .orderBy(col("gcnt").desc, col("tok").asc).limit(vocabSize)
    val gTotal = top.agg(sum(col("gcnt")).as("gtotal"))
    val srcCnt = tokens.join(broadcast(top.select("tok")), Seq("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("scnt"))
    // dense (source × top-token) grid so absent tokens still smooth
    val grid = srcCnt.select(col("source")).distinct()
      .crossJoin(top.select(col("tok"), col("gcnt")))
      .join(srcCnt, Seq("source", "tok"), "left")
      .na.fill(0L, Seq("scnt"))
    val sTotal = grid.groupBy(col("source"))
      .agg(sum(col("scnt")).as("stotal"))
    grid.join(sTotal, Seq("source")).crossJoin(broadcast(gTotal))
      .withColumn("p", (col("scnt") + 1.0d) /
        (col("stotal") + lit(vocabSize)).cast(DoubleType))
      .withColumn("q", col("gcnt").cast(DoubleType) / col("gtotal"))
      .groupBy(col("source"))
      .agg(round(sum(col("p") * log(col("p") / col("q"))), 4)
        .as("kl_divergence"),
        max(col("stotal")).as("n_top_tokens"))
  }

  /** Cross-source leakage matrix: for every source pair, the number of
    * distinct token `n`-grams they share and that count normalized by
    * the smaller source's gram vocabulary — the source-pairwise form of
    * benchmark decontamination (x26), answering "which corpora copy
    * from each other" before a mixture treats them as independent.
    *
    * Shape: distinct (source, gram-hash) postings (grams travel as
    * portable 60-bit hashes, never strings), one postings self-join on
    * the hash — a gram's pair fan-out is bounded by the SOURCE count,
    * not the corpus —, and a (source × source) aggregation whose result
    * is at most |sources|² rows. Docs shorter than n tokens contribute
    * nothing (mirrors the empty gram range). */
  def crossSourceLeakage(df: DataFrame, source: Column, text: Column,
                         n: Int = 5): DataFrame = {
    require(n > 0, "n must be positive")
    val toks = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    val posts = df
      .select(source.as("source"), toks.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col("source"),
        explode_outer(transform(
          sequence(lit(1), size(col("__t")) - (n - 1)),
          i => ColFns.portableHash60(
            concat_ws(" ", slice(col("__t"), i, lit(n)))))).as("g"))
      .distinct()
      // three consumers (sizes, both join sides): compute the gram
      // explode + distinct once (the winnowing discipline)
      .localCheckpoint(true)
    val sizes = posts.groupBy(col("source"))
      .agg(count(lit(1)).as("ng"))
    posts.as("a")
      .join(posts.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(sizes.select(col("source").as("source_a"), col("ng").as("ng_a")),
        "source_a")
      .join(sizes.select(col("source").as("source_b"), col("ng").as("ng_b")),
        "source_b")
      .withColumn("leak_share", round(col("shared_grams").cast(DoubleType) /
        least(col("ng_a"), col("ng_b")).cast(DoubleType), 4))
      .select(col("source_a"), col("source_b"), col("shared_grams"),
        col("leak_share"))
  }

  /** PII patterns kept deliberately portable (no lookarounds) so the
    * same regex runs in any RE2/PCRE-ish engine a pipeline audits with. */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePat = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrub: masks emails / phone numbers / IPv4 literals and counts
    * what was masked. Pure per-row regexp — shuffle-free, scan-speed. */
  def scrubPii(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"),
      size(regexp_extract_all(text, lit(emailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(text, lit(phonePat), lit(0))).as("n_phones"),
      size(regexp_extract_all(text, lit(ipPat), lit(0))).as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailPat, "[EMAIL]"),
          phonePat, "[PHONE]"),
        ipPat, "[IP]").as("clean_text"))

  /** Fixed-size token chunking with overlap (training-window prep):
    * whitespace tokens, windows of `size` starting every `stride`
    * tokens, final partial window kept. One generator expression + an
    * explode — rows fan out ~n_tokens/stride with no shuffle. */
  def chunkTokens(df: DataFrame, id: Column, text: Column,
                  size: Int = 50, stride: Int = 40): DataFrame = {
    require(stride > 0 && size > 0, "size and stride must be positive")
    val toks = regexp_extract_all(text, lit("\\S+"), lit(0))
    df.select(id.as("id"), toks.as("__toks"))
      .withColumn("__starts",
        sequence(lit(0),
          greatest(org.apache.spark.sql.functions.size(col("__toks")) - 1,
            lit(0)),
          lit(stride)))
      .select(col("id"),
        posexplode(transform(col("__starts"),
          st => concat_ws(" ", slice(col("__toks"), st + 1, lit(size)))))
          .as(Seq("chunk_no", "chunk_text")))
      .withColumn("n_chunk_tokens",
        org.apache.spark.sql.functions.size(
          split(col("chunk_text"), " ")))
  }

  /** Benchmark decontamination: flag training docs sharing any word
    * `n`-gram with a held-out benchmark set — the overlap check every
    * LLM training pipeline runs before a data release. Inverted-index
    * shape: explode distinct n-grams on both sides, equi-join on the
    * gram, count distinct benchmark docs hit per training doc. The
    * gram join is the only data-scaling shuffle; the benchmark side is
    * tiny by construction (broadcast), so at 100 TB this is one
    * map-side-joined pass over the corpus. */
  def contaminationFlags(train: DataFrame, bench: DataFrame,
                         id: Column, text: Column, n: Int = 8): DataFrame = {
    // outer: shingles() never yields an empty array (short docs emit
    // the whole-token gram), and non-outer explode's inferred size()>0
    // guard re-evaluates the shingle expression per row (the
    // admitIncremental lesson); null grams fall out of the equi-join
    def grams(df: DataFrame, as: String) = df
      .select(id.as(as), explode_outer(Dedup.shingles(text, n)).as("gram"))
    // two-level aggregation instead of count + countDistinct in one
    // agg: the combined form doubles every matched row through Expand,
    // and a separate-aggs join would run the index join twice — the
    // pair-grain rollup gets both numbers in ONE pass (distinct bench
    // ids = count of pair groups, gram hits = sum of their sizes)
    grams(train, "train_id")
      .join(broadcast(grams(bench, "bench_id").distinct()), Seq("gram"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_bench_hits"),
        sum(col("c")).as("n_gram_hits"))
  }

  /** WITHIN-doc repeated-block removal (CCNet-style): the text splits
    * into non-overlapping `w`-token blocks and every block whose
    * content already appeared earlier in the SAME doc is dropped —
    * the intra-doc complement of [[graft.operators.Dedup.spanDuplication]]
    * (cross-doc) and [[decontaminateStrip]] (benchmark overlap).
    * First-occurrence keeping is expressed positionally
    * (`array_position(blocks, blocks[i]) == i`), not via
    * `array_distinct`, so the oracle can state the identical rule
    * without relying on any engine's distinct-ordering guarantee.
    * Entirely per-row array expressions: shuffle-free, scan-speed —
    * the blocks-per-doc count is small, so the positional lookup's
    * quadratic term is bounded per row, not per corpus. */
  def intraDocDedup(df: DataFrame, id: Column, text: Column,
                    w: Int = 8): DataFrame = {
    val toks = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    val base = df.select(id.as("id"), toks.as("t"))
      .withColumn("nb",
        ceil(size(col("t")).cast(DoubleType) / w).cast("int"))
    val blocks = transform(sequence(lit(0), col("nb") - 1),
      b => concat_ws(" ", slice(col("t"), b * w + 1, lit(w))))
    base.filter(col("nb") >= 1)
      .withColumn("bl", blocks)
      .withColumn("keep_idx",
        filter(sequence(lit(1), col("nb")),
          i => array_position(col("bl"), element_at(col("bl"), i)) === i))
      .select(col("id"), col("nb").as("n_blocks"),
        (col("nb") - size(col("keep_idx"))).as("n_dup_blocks"),
        concat_ws(" ", transform(col("keep_idx"),
          i => element_at(col("bl"), i))).as("clean_text"))
  }

  /** CCNet-style paragraph-hash boilerplate removal (Wenzek et al.
    * 2020, "CCNet: Extracting High Quality Monolingual Datasets from
    * Web Crawl Data", §4.1 deduplication: hash every paragraph, drop
    * the ones whose hash recurs across the corpus) — the step that
    * strips "subscribe / cookie banner / all rights reserved"
    * furniture from web text before any quality model sees it, and
    * the line-grain complement to the document-grain exact dedup
    * (Dedup) and block-grain [[intraDocDedup]]. A segment (`text`
    * split on the literal `sep`) is boilerplate when it appears in
    * MORE THAN `maxDocs` distinct documents, counted on the trimmed
    * segment.
    *
    * Scale shape: two linear corpus passes (CCNet's own discipline).
    * Pass 1 counts document frequency per xxhash64(trim(segment)) —
    * 8-byte keys ride the shuffle, never paragraph text, with
    * map-side combine — and keeps only hashes crossing `maxDocs`:
    * the blacklist, bounded above by total_segments / maxDocs, which
    * BROADCASTS. Pass 2 is a broadcast LEFT ANTI join plus one
    * doc-grain reassembly (position-ordered, the
    * [[decontaminateStrip]] pattern). The anti-join is deliberate: a
    * footer hash present in EVERY document is the hottest possible
    * shuffle-join key, but against a broadcast set there is no
    * shuffle and no hot partition at all. Returns
    * (id, clean_text, n_segs, n_removed); a fully-boilerplate
    * document survives as clean_text = "" rather than vanishing. */
  def boilerplateStrip(df: DataFrame, id: Column, text: Column,
                       sep: String = "\n",
                       maxDocs: Long = 10): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1: $maxDocs")
    val segs = segmentsOf(df, id, text, sep)
    val blacklist = segs.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("docfreq"))
      .filter(col("docfreq") > maxDocs)
      .select(col("h"))
    stripTail(df, id, text, segs, blacklist, sep)
  }

  /** [[boilerplateStrip]]'s pass 2 against a PRECOMPUTED blacklist of
    * xxhash64(trim(segment)) values — the standing-ledger form: st22
    * derives the blacklist from a streamed document-frequency ledger
    * and strips WITHOUT recomputing frequencies (no corpus rescan for
    * the decision, the x92 encode-only-admission shape applied to
    * text cleaning). `blacklist` must expose column `h`. */
  def boilerplateStripAgainst(df: DataFrame, id: Column, text: Column,
                              sep: String,
                              blacklist: DataFrame): DataFrame =
    stripTail(df, id, text, segmentsOf(df, id, text, sep),
      blacklist.select(col("h")), sep)

  /** One (id, pos, seg, h) row per segment of `text` split on the
    * LITERAL `sep`; `h` hashes the trimmed segment. */
  private def segmentsOf(df: DataFrame, id: Column, text: Column,
                         sep: String): DataFrame =
    df.select(id.as("id"),
        posexplode(split(text, java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "seg")))
      .withColumn("h", xxhash64(trim(col("seg"))))

  private def stripTail(df: DataFrame, id: Column, text: Column,
                        segs: DataFrame, blacklist: DataFrame,
                        sep: String): DataFrame = {
    val kept = segs.join(broadcast(blacklist), Seq("h"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(sep, transform(
          sort_array(collect_list(struct(col("pos"), col("seg")))),
          s => s.getField("seg"))).as("clean_text"))
    // per-doc totals come from size(split(...)) on the one-row-per-
    // doc relation (the decontaminateStrip idiom) — a third corpus
    // split/explode/aggregate just to count segments would break the
    // documented two-pass shape
    df.select(id.as("id"),
        size(split(text, java.util.regex.Pattern.quote(sep)))
          .cast("long").as("n_segs"))
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_segs"),
        (col("n_segs") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  /** Span-level decontamination: REMOVE every token covered by a word
    * n-gram that appears in the benchmark set, keep the rest — the
    * surgical alternative to dropping whole contaminated docs
    * ([[contaminationFlags]] flags, this strips). Benchmark n-grams
    * broadcast as md5 hashes (16 bytes per gram, never the text);
    * train windows carry (id, position, hash) only; covered token
    * positions come from exploding just the MATCHED windows; the
    * reassembly is one position-ordered aggregation per doc. The
    * window hashing is the only corpus-scale pass. */
  def decontaminateStrip(train: DataFrame, bench: DataFrame,
                         id: Column, text: Column, n: Int = 8): DataFrame = {
    val toks = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    val benchSpans = bench
      .select(explode_outer(Dedup.shingles(text, n)).as("gram"))
      .select(md5(col("gram")).as("h")).distinct()
    val base = train.select(id.as("id"), toks.as("t"))
      .withColumn("n_tokens", size(col("t")))
    val wins = base.select(col("id"),
        explode(when(col("n_tokens") >= n,
          sequence(lit(0), col("n_tokens") - n))
          .otherwise(array().cast("array<int>"))).as("i"),
        col("t"))
      .select(col("id"), col("i"),
        md5(concat_ws(" ", slice(col("t"), col("i") + 1, lit(n)))).as("h"))
    val covered = wins.join(broadcast(benchSpans), Seq("h"))
      .select(col("id"),
        explode(sequence(col("i") + 1, col("i") + n)).as("p"))
      .distinct()
    val tokens = base.select(col("id"),
        posexplode_outer(col("t")).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).as("p"), col("tok"))
    val kept = tokens.join(covered, Seq("id", "p"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens_after"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    base.select(col("id"), col("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_tokens_after"), lit(0L)).as("n_tokens_after"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Sequence packing: assign documents to fixed-capacity token bins —
    * the "concat-and-chunk" batching prep for LLM training. Greedy
    * contiguous fill in id order per shard: a doc starts a new bin when
    * the running token total would cross `capacity`... approximated by
    * the classic cumulative-sum bin index (bin = ⌊(cumsum−tok)/cap⌋),
    * which is deterministic, one window pass, and SQL-portable. Sharded
    * (`pmod(id, shards)`) so no global window: each shard packs
    * independently — exactly how a distributed packer works, because
    * bins never span workers anyway. */
  def packSequences(df: DataFrame, id: Column, text: Column,
                    capacity: Int, shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = ColFns.tokenCount(text)
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("id"), toks.as("n_tokens"))
      .withColumn("shard", pmod(col("id"), lit(shards)))
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / capacity))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
  }

  /** Gopher-style repetition signals per document: top-word fraction,
    * duplicate-word fraction (share of tokens whose word occurs ≥2
    * times), and top-bigram fraction — the repetitious-content filters
    * a pretraining cleanup runs after exact dedup. Two explode+agg
    * passes (words, bigrams) keyed by doc id: the shuffle grain is the
    * document, so the op scales linearly and never holds more than one
    * document's vocabulary per key. */
  def repetitionStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df.select(id.as("id"), split(lower(text), " ").as("w"))
      .withColumn("n_words", size(col("w")))
      // adjacent-pair bigrams via transform-with-index (no shuffle)
      .withColumn("bg", expr(
        "transform(slice(w, 1, size(w) - 1), " +
          "(x, i) -> concat(x, ' ', element_at(w, i + 2)))"))
    val wstats = base.select(col("id"), explode(col("w")).as("word"))
      .groupBy(col("id"), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("top_word_n"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_word_n"))
    val bstats = base.select(col("id"), explode(col("bg")).as("bgram"))
      .groupBy(col("id"), col("bgram")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(max(col("c")).as("top_bigram_n"))
    base.select(col("id"), col("n_words"))
      .join(wstats, Seq("id"))
      .join(bstats, Seq("id"), "left")
      .select(col("id"), col("n_words"),
        round(col("top_word_n").cast(DoubleType) / col("n_words"), 6)
          .as("top_word_frac"),
        round(col("dup_word_n").cast(DoubleType) / col("n_words"), 6)
          .as("dup_word_frac"),
        when(col("n_words") > 1,
          round(col("top_bigram_n").cast(DoubleType) / (col("n_words") - 1), 6))
          .otherwise(lit(0.0d)).as("top_bigram_frac"))
  }

  /** URL canonicalization: lowercase scheme+host, drop the fragment,
    * strip tracking query params (`utm_*`, `ref`), drop a trailing
    * slash — the normalize step before crawl dedup. Pure per-row
    * string/array expressions (regexp splits + a higher-order filter),
    * deliberately lookaround-free so any regex engine agrees. */
  /** Corpus-level collocation mining: adjacent word pairs scored by
    * LIFT — p(xy) / (p(x)·p(y)) = n_xy·N² / (B·n_x·n_y) — the ratio
    * form of PMI (PMI = log lift), kept as a ratio because it is pure
    * rational arithmetic over exact counts: bit-identical in any
    * engine, where log/ln ulps differ. The phrase-detection pass a
    * corpus pipeline runs before tokenizer training (word2vec-style
    * phrase joining uses exactly this statistic).
    *
    * Plan: one bigram-grain aggregation (the only data-scaling
    * shuffle; adjacent pairs reduce map-side), one unigram-grain
    * aggregation, two joins of the bigram counts against the (vocab-
    * sized, broadcastable) unigram counts, corpus totals as a
    * broadcast scalar. `minCount` prunes the hapax tail BEFORE the
    * joins — at 100 TB that cut is what keeps the bigram table
    * join-able; raise it with corpus size. */
  def collocations(df: DataFrame, id: Column, text: Column,
                   minCount: Long = 5L): DataFrame = {
    val base = df.select(id.as("id"),
      split(trim(regexp_replace(lower(text), "\\s+", " ")), " ").as("w"))
    val uni = base.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val totals = uni.agg(sum(col("n_tok")).as("n_total")) // N, one row
    val bi = base.select(explode(expr(
        "transform(slice(w, 1, size(w) - 1), " +
          "(x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2))"))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    val biTotals = bi.agg(sum(col("n_pair")).as("b_total")) // B, one row
    bi.filter(col("n_pair") >= minCount)
      .join(broadcast(uni.select(col("tok").as("w1"),
        col("n_tok").as("n_w1"))), Seq("w1"))
      .join(broadcast(uni.select(col("tok").as("w2"),
        col("n_tok").as("n_w2"))), Seq("w2"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(biTotals))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("n_pair"),
        // left-to-right double association, mirrored verbatim in the
        // oracle SQL (float rounding is association-sensitive); the
        // denominator leads with a double cast so the long product
        // can't overflow ANSI arithmetic on a big corpus
        round(col("n_pair").cast(DoubleType) * col("n_total") * col("n_total") /
          (col("b_total").cast(DoubleType) * col("n_w1") * col("n_w2")), 4)
          .as("lift"))
  }

  /** Out-of-vocabulary rate per doc against the corpus's own top-`k`
    * tokens (count desc, token asc — a deterministic vocabulary).
    * The tokenizer-coverage signal: docs with high OOV against the
    * working vocabulary are noise, code, or another language. One
    * vocab aggregation (broadcast back), one token-grain pass. */
  def oovRate(df: DataFrame, id: Column, text: Column,
              vocabSize: Int = 100): DataFrame = {
    val toks = df.select(id.as("id"),
        explode(split(trim(regexp_replace(lower(text), "\\s+", " ")), " "))
          .as("tok"))
    // top-k via orderBy+limit, which Spark plans as
    // TakeOrderedAndProject (per-partition heaps + a k-row driver
    // merge) — an unpartitioned rank window here would funnel every
    // distinct token of the corpus through one partition's sort
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(true).as("in_v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast(DoubleType) / col("n_tokens"), 4))
  }

  /** BPE trainer-prep, step 0: the word-grain symbol table — distinct
    * words with corpus counts, symbols initialized to characters. All
    * later BPE work happens at this grain (vocab-sized, ≪ corpus):
    * the one corpus-scale pass is this word count. */
  def bpeInit(df: DataFrame, text: Column): DataFrame =
    df.select(explode(
        regexp_extract_all(lower(text), lit("\\S+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("syms",
        regexp_extract_all(col("word"), lit("."), lit(0)))

  /** Adjacent symbol-pair counts weighted by word frequency — the
    * statistic each BPE merge round maximizes. One explode + hash
    * aggregation over the word table. */
  def bpePairCounts(words: DataFrame): DataFrame =
    words.select(col("n"), explode(expr(
        "transform(slice(syms, 1, size(syms) - 1), " +
          "(x, i) -> struct(x AS lhs, element_at(syms, i + 2) AS rhs))"))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("n")).as("pair_count"))

  /** `rounds` byte-pair-encoding merges: per round, the globally most
    * frequent adjacent symbol pair (ties → lexicographic) merges into
    * one symbol, greedily left-to-right and non-overlapping within
    * each word. Returns the merge table — the artifact a BPE
    * tokenizer trainer produces.
    *
    * Scale shape: every round runs on the word-grain symbol table
    * (vocab-sized), so corpus size only enters through the initial
    * word count ([[bpeInit]]). The per-round argmax is ONE collected
    * row (the merge decision is inherently global — same pattern as
    * the b2 bloom-bytes materialization); the symbol rewrite is a
    * codegen'd `aggregate` fold, and `localCheckpoint` truncates the
    * growing lineage each round (the [[Dedup.connectedComponents]]
    * discipline). */
  def bpeMerges(df: DataFrame, text: Column, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words = bpeInit(df, text).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      // headOption, not head(): once every pair has merged (short
      // words, small corpora) the pair table is empty and the loop
      // returns the merges found so far instead of throwing
      val topOpt = bpePairCounts(words)
        .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect().headOption
      if (topOpt.isEmpty) { exhausted = true }
      else {
      val top = topOpt.get
      val (l, rr, c) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r, l, rr, c))
      val lC = lit(l); val rC = lit(rr)
      words = words.withColumn("syms",
        aggregate(col("syms"),
          struct(array().cast("array<string>").as("arr"),
            lit(false).as("just")),
          (acc, s) => {
            val arr = acc.getField("arr")
            val canMerge = !acc.getField("just") && size(arr) > 0 &&
              element_at(arr, -1) === lC && s === rC
            when(canMerge, struct(
              concat(slice(arr, lit(1), size(arr) - 1),
                array(concat(lC, rC))).as("arr"),
              lit(true).as("just")))
              .otherwise(struct(concat(arr, array(s)).as("arr"),
                lit(false).as("just")))
          },
          acc => acc.getField("arr")))
        .localCheckpoint()
      }
    }
    merges.toSeq.toDF("round", "lhs", "rhs", "pair_count")
  }

  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val schemeHost = lower(regexp_extract(noFrag, "^([A-Za-z]+://[^/?#]+)", 1))
    val path0 = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val path = when(path0 === "/", path0)
      .otherwise(regexp_replace(path0, "/$", ""))
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = org.apache.spark.sql.functions.filter(
      split(query, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("ref=")) && p =!= "")
    concat(schemeHost, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Per-document character-level entropy (bits) over the letter
    * distribution — the cheap perplexity proxy for gibberish/encoded-
    * blob detection. H = log2(N) − Σ c·log2(c) / N computed from one
    * explode + two-level agg at document grain; identical formula on
    * the oracle side so both engines round the same doubles. */
  def charEntropy(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"),
        explode(regexp_extract_all(lower(text), lit("[a-z]"), lit(0)))
          .as("ch"))
      .groupBy(col("id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_letters"),
        sum(col("c").cast(DoubleType) * log2(col("c").cast(DoubleType)))
          .as("clogc"))
      .select(col("id"), col("n_letters"),
        round(log2(col("n_letters").cast(DoubleType)) -
          col("clogc") / col("n_letters").cast(DoubleType), 4).as("entropy"))

  /** Feature hashing (the "hashing trick"): token → bucket via the
    * portable 60-bit md5 hash mod `buckets`, per-doc bucket counts —
    * the fixed-width sparse featurization that needs no vocabulary
    * build or broadcast. One explode + one doc-grain aggregation;
    * collisions are the accepted trade (documented by construction,
    * identical in any engine that can compute md5). */
  def featureHash(df: DataFrame, id: Column, text: Column,
                  buckets: Int = 64): DataFrame =
    df.select(id.as("id"),
        explode(regexp_extract_all(lower(text), lit("\\S+"), lit(0)))
          .as("tok"))
      .withColumn("bucket", pmod(ColFns.portableHash60(col("tok")),
        lit(buckets.toLong)))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Per-document top-k TF-IDF terms.
    *
    * tf = in-document count of the lowercased whitespace token;
    * idf = ln((N+1)/(df+1)) with df = #docs containing the token.
    * Two hash shuffles (token grain, then doc grain for the window) —
    * the same shape a 100 TB vocabulary build takes; document frequency
    * is a broadcastable side output at any scale (vocab ≪ corpus). */
  def tfidfTopTerms(df: DataFrame, id: Column, text: Column,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.count() // one cheap count pass; N is a scalar constant
    val tokens = df.select(id.as("id"),
        explode(regexp_extract_all(lower(text), lit("\\S+"), lit(0)))
          .as("term"))
    val tf = tokens.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      // two consumers (document frequencies + the score join) — run
      // the token explode + tf aggregation once
      .localCheckpoint(true)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("score",
        col("tf") * log((lit(n) + 1.0d) / (col("df") + 1.0d)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"),
        round(col("score"), 4).as("tfidf"))
  }

  /** BM25 ranked retrieval (Robertson/Sparck Jones; the Lucene
    * `(1 + ln)` idf form, always positive) — the quality-retrieval /
    * decontamination-lookup primitive a corpus pipeline runs to find
    * the documents most relevant to a probe query.
    *
    * score(d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) /
    *            (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Scale shape: tf and df are computed only for the query's terms —
    * the token explode is filtered BEFORE its aggregation, so the
    * per-query cost is a scan plus two tiny aggregations; the
    * doc-length table (dl, avgdl) is query-independent and cached /
    * materialized once per corpus in practice. No windows over the
    * corpus: top-k is one TakeOrderedAndProject. */
  /** Vocabulary-coded corpus export — the terminal tokenize-to-ids
    * step a trainer consumes: the top-`v` corpus tokens become ids
    * 0..v-1 (frequency desc, token asc — deterministic), everything
    * else the OOV id `v`. Returns the per-doc encode audit
    * (id, n_tokens, n_oov, ids_fp) where `ids_fp` is the
    * position-weighted checksum Σ pos·(tid+1) over the 1-based token
    * positions — an ORDER-SENSITIVE fingerprint of the exact id
    * sequence, so any engine disagreement on any id or position shows
    * in the pane (the binary shard itself is just this encoding
    * written columnar; the audit is what the oracle can hash).
    * Scale shape: vocabulary ranking rides the range-exchange global
    * numbering (no single-partition window over token types — p13's
    * discipline; type tables reach 10⁸ rows at corpus scale); docs
    * then encode via ONE broadcast join of the v-row vocab. */
  def vocabEncode(df: DataFrame, id: Column, text: Column,
                  v: Int = 1024): DataFrame = {
    val (_, stream) = vocabTokenStream(df, id, text, v)
    val pane = stream
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === v.toLong, 1L).otherwise(0L))
          .as("n_oov"),
        sum(((col("pos") + 1) * (col("tid") + 1)).cast("long"))
          .as("ids_fp"))
    df.select(id.as("id")).join(pane, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("ids_fp"), lit(0L)).as("ids_fp"))
  }

  /** The (vocab, encoded token stream) pair behind [[vocabEncode]]'s
    * audit pane — the EXPORT itself, factored out so the audit and
    * the decode verifier ([[vocabDecode]]) share one encoding
    * definition: `vocab` is (tok, tid) for ids 0..v-1; `stream` is
    * (id, pos, tid) with OOV tokens mapped to the sink id `v`. The
    * stream is what a trainer's binary shards serialize; it carries
    * no corpus text, only ids. */
  def vocabTokenStream(df: DataFrame, id: Column, text: Column,
                       v: Int = 1024): (DataFrame, DataFrame) = {
    val toks = df.select(id.as("id"),
      posexplode(regexp_extract_all(lower(text), lit("\\S+"), lit(0)))
        .as(Seq("pos", "tok")))
    val types = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val vocab = Layout.globalRowNumber(types,
        struct((-col("n")).as("nn"), col("tok").as("t")))
      .filter(col("row_num") < v)
      .select(col("tok"), col("row_num").as("tid"))
    val stream = toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("id"), col("pos"),
        coalesce(col("tid"), lit(v.toLong)).as("tid"))
    (vocab, stream)
  }

  /** Decode an exported id stream back to token text — the export
    * INTEGRITY verifier (a pipeline that ships binary shards proves
    * the roundtrip before a trainer consumes them): one broadcast
    * join of the v-row inverse vocab, then per-doc order-faithful
    * reassembly via array_sort on (pos, tok) structs (collect_list
    * is NOT order-stable across retries/merges — the sort is what
    * makes the reassembly deterministic on any cluster). OOV ids
    * decode to `<unk>`, which is exactly the information the sink id
    * destroyed — so the roundtrip contract is: decoded == normalized
    * source text FOR 0-OOV DOCS, and the verifier's pane says which
    * docs that covers. Returns (id, decoded). */
  def vocabDecode(stream: DataFrame, vocab: DataFrame): DataFrame =
    stream.join(broadcast(vocab), Seq("tid"), "left")
      .select(col("id"), col("pos"),
        coalesce(col("tok"), lit("<unk>")).as("tok"))
      .groupBy(col("id"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        e => e.getField("tok"))).as("decoded"))

  /** Per-query-document BM25 retrieval ("more like this"): each doc
    * selected by `queryPred` retrieves the corpus's top-k docs using
    * its own DISTINCT tokens as the query terms — the sparse branch of
    * hybrid (BM25 ⊕ dense) retrieval, and the lexical side of RAG
    * candidate generation. Same scoring as [[bm25Search]]; the only
    * new shape is the query dimension, carried by a broadcast of the
    * (queries × distinct-terms) relation into the postings join, so
    * corpus-side work stays one postings-bounded scan per stage
    * regardless of how many queries ride along. Scores are summed as
    * exact decimals of round(part, 6) (the x90/x94 recipe) and ranked
    * on the decimal, so rank order is engine-identical.
    * Returns (query_id, doc_id, bm25, rank), rank ≤ k, self excluded. */
  def bm25MoreLikeThis(df: DataFrame, id: Column, text: Column,
                       queryPred: Column, k: Int = 20,
                       k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(28, 6)
    val n = df.count() // scalar constant, one cheap count pass
    val arr = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    val tokens = df.select(id.as("id"), explode(arr).as("term"))
    val dl = tokens.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
    val qterms = df.filter(queryPred)
      .select(id.as("query_id"), explode(array_distinct(arr)).as("term"))
    val tf = tokens.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val qdf = tf.join(broadcast(qterms.select(col("term")).distinct()),
        Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(qterms), Seq("term"))
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(qdf), Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(avgdl)) // 1-row scalar idiom
      .withColumn("idf",
        log(lit(1.0d) + (lit(n.toDouble) - col("df") + 0.5d) /
          (col("df") + 0.5d)))
      .withColumn("part",
        col("idf") * col("tf") * (lit(k1) + 1.0d) /
          (col("tf") + lit(k1) *
            (lit(1.0d - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(round(col("part"), 6).cast(dec)).as("__bm25d"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__bm25d").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("doc_id"),
        round(col("__bm25d").cast(DoubleType), 4).as("bm25"),
        col("rank"))
  }

  def bm25Search(df: DataFrame, id: Column, text: Column,
                 queryTerms: Seq[String], k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val n = df.count() // scalar constant, one cheap count pass
    val tokens = df.select(id.as("id"),
      explode(regexp_extract_all(lower(text), lit("\\S+"), lit(0)))
        .as("term"))
    val dl = tokens.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    // avgdl over docs that have tokens (UNNEST drops empty docs in
    // the oracle identically); 1-row aggregate joined broadcast-style
    val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
    val qtf = tokens.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val qdf = qtf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    qtf.join(broadcast(qdf), Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(avgdl))
      .withColumn("idf",
        log(lit(1.0d) + (lit(n.toDouble) - col("df") + 0.5d) /
          (col("df") + 0.5d)))
      .withColumn("part",
        col("idf") * col("tf") * (lit(k1) + 1.0d) /
          (col("tf") + lit(k1) *
            (lit(1.0d - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("part")), 4).as("bm25"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("bm25").desc, col("id").asc)
      .limit(k)
  }

  /** PII scrub patterns — the redaction pass every published
    * training-data pipeline runs before release (C4 strips lines by
    * blocklist; Dolma/FineWeb redact emails/IPs/phones with exactly
    * this regex family). Deliberately CONSERVATIVE: precise shapes
    * with word boundaries, so false redactions don't eat corpus text
    * — a PII pass that is too eager destroys training data, one that
    * is too lax ships PII; the conservative side of that trade is the
    * defensible one and over-matching is tunable per deployment.
    * Patterns stay inside the RE2 ∩ Java-regex dialect (no
    * backreferences, no lookaround) so the engine (Java) and the
    * DuckDB oracle (RE2) execute them identically. */
  val piiEmailRe: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpRe: String = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val piiPhoneRe: String = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"
  val piiLongNumRe: String = "\\b\\d{13,19}\\b"

  /** PII redaction over a document relation: emails → `<EMAIL>`,
    * IPv4 → `<IP>`, separator phone numbers → `<PHONE>`, 13-19-digit
    * runs (card/account shaped) → `<NUM>`, applied IN THAT ORDER so
    * each category counts matches on the text the previous category
    * already redacted (an email's digits can never double-count as a
    * phone). Pure chained `regexp_replace`/`regexp_extract_all`
    * column expressions — per-row, shuffle-free, codegen'd: the scrub
    * rides the 100 TB scan like every TextOps pass, no UDF, no
    * second pass. Returns (id, clean_text, n_emails, n_ips,
    * n_phones, n_longnums, keep…) — `keep` passes audit dimensions
    * (source, lang) through the same single projection, so a
    * consumer never joins the corpus back to itself just to recover
    * a grouping column (a corpus-sized shuffle a map-only stage must
    * not pay). */
  def piiScrub(docs: DataFrame, idCol: Column, textCol: Column,
               keep: Column*): DataFrame = {
    val t0 = textCol
    def step(t: Column, re: String, tag: String): (Column, Column) =
      (regexp_replace(t, re, tag),
        size(regexp_extract_all(t, lit(re), lit(0))))
    val (t1, nEmail) = step(t0, piiEmailRe, "<EMAIL>")
    val (t2, nIp) = step(t1, piiIpRe, "<IP>")
    val (t3, nPhone) = step(t2, piiPhoneRe, "<PHONE>")
    val (t4, nNum) = step(t3, piiLongNumRe, "<NUM>")
    docs.select(Seq(idCol.as("id"), t4.as("clean_text"),
      nEmail.as("n_emails"), nIp.as("n_ips"),
      nPhone.as("n_phones"), nNum.as("n_longnums")) ++ keep: _*)
  }
}
