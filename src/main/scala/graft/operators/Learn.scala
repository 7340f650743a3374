package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-engine model training as DataFrame algebra — the FineWeb-Edu /
  * fastText-classifier tier of an LLM data pipeline: quality labels
  * are learned from a seed signal and scored over the whole corpus,
  * WITHOUT an external ML runtime. No MLlib, no UDFs, no driver-side
  * weight vector: the model is a (bucket, weight) relation of
  * `nBuckets` rows that broadcast-joins into each pass.
  *
  * Scale shape: one training iteration = two hash aggregations over
  * the feature relation (doc-grain margin, bucket-grain gradient),
  * each a single shuffle; the model state is KBs and rides broadcast.
  * k iterations = k linear passes — a 1000-executor cluster trains on
  * 100 TB exactly like local[32] trains on 60 MB, because nothing
  * ever concentrates on the driver (weights are localCheckpoint'd
  * executor-side 4096-row state, not collected).
  *
  * Determinism (the oracle contract): every cross-row sum is an exact
  * DECIMAL sum of round(term, 6) values (the proven x90/x94 recipe),
  * sigmoid inputs/outputs are rounded to 6 before reuse, so a DuckDB
  * replay of the unrolled iterations reproduces the weights and
  * scores bit-for-bit.
  */
object Learn {

  private val dec = DecimalType(38, 12)

  /** The x97/st19 shared feature builder: hashed uni+bigram bucket
    * counts ([[TextOps.dsirFeatures]] — ONE tokenizer+hash definition
    * across the whole selection stack), L1-normalized per doc
    * (v = cnt / Σ_b cnt, rounded to 6). Per-doc normalization means a
    * doc's features are identical whether built from the whole corpus
    * or from any micro-batch containing it — what makes frozen-model
    * stream scoring (st19) batching-invariant. Returns (id, b, v). */
  def features(df: DataFrame, id: Column, text: Column,
               nBuckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rawFeat = TextOps.dsirFeatures(df, id, text, lit(true),
        nBuckets)
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("cnt"))
    // doc length as a window over the (id, b) counts — the same exact
    // long sum the old dl-aggregate-then-join computed, in one pass
    // over rawFeat instead of a second aggregation plus an id-join
    // (guide §2.4: the window partitioned like the data needs no
    // second shuffle; the join form re-exchanged rawFeat by id too)
    rawFeat
      .withColumn("dl", sum(col("cnt")).over(
        Window.partitionBy(col("id"))))
      .select(col("id"), col("b"),
        round(col("cnt") / col("dl"), 6).as("v"))
  }

  /** The quality classifier's STANDING operating point — one
    * definition for the four consumers that must stay in lockstep
    * with the shared generated oracle (`x97Oracle`): x97's pane,
    * x98's calibration audit, e2e_select_corpus's gate, and st19's
    * frozen streaming model. Changing the point here changes every
    * consumer AND the oracle builders that reference these vals, so
    * a silent engine/oracle divergence is impossible. The sweep that
    * picked (12, 8.0) is recorded at the x97 query. */
  val qualityIters = 12
  val qualityLr = 8.0

  /** The shared x97 training prologue at that operating point:
    * hashed uni+bigram L1 features over `documents`, en-seed labels
    * (y = 1 ⇔ lang = 'en'), preconditioned full-batch GD. Returns
    * (feat, labels, bias, weights) so consumers can score, gate,
    * audit, or persist without re-deriving any piece of the recipe —
    * the bias relation in particular is built here ONCE and threaded
    * into both train and score, so a train+score query pays exactly
    * one label-grain aggregation. */
  def qualityClassifier(docs: DataFrame, nBuckets: Int = 4096)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val feat = features(docs, col("doc_id"), col("text"), nBuckets)
    val labels = docs.select(col("doc_id").as("id"),
      when(col("lang") === "en", 1.0d).otherwise(0.0d).as("y"))
    val biasDf = logisticBias(labels)
    (feat, labels, biasDf,
      logisticTrain(feat, labels, qualityIters, qualityLr, biasDf))
  }

  /** The 1-row fixed-intercept relation: logit of the label base
    * rate, rounded to 6. Fails fast on empty or single-class labels
    * (the logit is undefined/±∞ there and no classifier is
    * learnable). EACH CALL runs one label-grain aggregation (the
    * collect here IS the scan) — callers that both train and score
    * must build the relation once and pass it to both
    * ([[qualityClassifier]] does; so does [[logisticTrain]]'s
    * `biasDf0` parameter), not call this twice. */
  def logisticBias(labels: DataFrame): DataFrame = {
    val rows = labels.agg(avg(col("y"))).collect()
    val r = if (rows.isEmpty || rows(0).isNullAt(0)) Double.NaN
            else rows(0).getDouble(0)
    require(r > 0.0 && r < 1.0,
      s"logisticBias: unlearnable labels (mean y = $r) — empty or " +
        "single-class, logit undefined")
    val bias = BigDecimal(math.log(r / (1.0 - r)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    labels.sparkSession.range(1).select(lit(bias).as("bias"))
  }

  /** Full-batch gradient-descent logistic regression over sparse
    * hashed features. `feat` is (id, b, v) — one row per (doc,
    * bucket) with the L1-NORMALIZED feature value (bucket count /
    * doc's total feature count, pre-rounded to 6). Normalization is
    * load-bearing: Σ_b v = 1 per doc bounds the margin by max|w|, so
    * the sigmoid cannot saturate on long documents and one lr works
    * at every document length — raw counts make z grow with doc
    * length and full-batch GD oscillates into a constant-negative
    * model (measured: 3 raw-count iterations score ~0 for EVERY doc).
    * Weights start at zero (so iteration 1's sigmoid is exactly 0.5
    * everywhere); each iteration computes doc margins z = Σ v·w_b,
    * p = σ(z), and the batch gradient g_b = Σ (p − y)·v, then steps
    * w ← w − lr·(g_b / Σ_d v_{d,b}) — the feature-mass-normalized
    * (diagonally preconditioned) step. Returns (b, w) after `iters`
    * steps. `biasDf0` lets a caller that already built the intercept
    * relation ([[logisticBias]]) share it instead of paying a second
    * label-grain aggregation; null (the default) builds it here. */
  def logisticTrain(feat: DataFrame, labels: DataFrame,
                    iters: Int = 3, lr: Double = 0.5,
                    biasDf0: DataFrame = null): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // FIXED intercept at logit(base rate) — "centering": the model
    // starts AT the class prior (iteration-1 sigmoid = base rate
    // everywhere) and GD only learns per-bucket deviations. A
    // TRAINED intercept is v=1 against token features of v≈1e-3 —
    // an 800× feature-scale mismatch that oscillates at any lr the
    // tokens can use (measured: ±n/2 bias gradient saturates every
    // doc to p=0 by iteration 2).
    val biasDf = if (biasDf0 == null) logisticBias(labels) else biasDf0
    // (id, b, v, y) — the training relation every pass re-reads;
    // eagerly materialized once (the x82 localCheckpoint idiom) so k
    // iterations cost k passes, not an exponentially replayed lineage.
    // Materialized HASH-PARTITIONED BY id (LogicalRDD preserves the
    // checkpoint's output partitioning): every iteration both
    // aggregates the scores by id and joins them back to f by id, so
    // an unpartitioned f re-shuffles the whole training relation
    // twice per pass — partitioned once here, the per-iteration plan
    // keeps only the unavoidable by-bucket gradient exchange (guide
    // §2.4, "two operations keyed the same way share one exchange").
    // Decimal sums are order-exact, so the weights are unchanged.
    // ALSO sorted by id within partitions: the checkpoint's LogicalRDD
    // preserves outputPartitioning AND outputOrdering, so each
    // iteration's margin window (partitionBy id) reuses this one sort
    // instead of re-sorting n rows per pass — one n·log n sort buys
    // `iters` sort-free windows.
    val f = feat.join(labels, Seq("id"))
      .repartition(col("id")).sortWithinPartitions(col("id"))
      .localCheckpoint()
    // per-bucket feature mass Σ_d v — the diagonal preconditioner:
    // dividing the gradient by it turns the step into lr × (average
    // residual on the bucket), bounded ±lr, so |w| ≤ lr·iters and the
    // sigmoid can never blow up; unpreconditioned full-batch steps on
    // hashed text features oscillate (measured: the whole corpus
    // swings p≈1 → p≈0 between iterations at any lr that learns).
    // Constant across iterations; exact decimal sum of 6-dec values.
    val fm = f.groupBy(col("b")).agg(sum(col("v").cast(dec)).as("fm"))
      .localCheckpoint()
    import org.apache.spark.sql.expressions.Window
    // the margin as a WINDOW over f's own rows (partitioned by id —
    // f's materialized layout, so no exchange and no re-sort): the
    // old form aggregated (id, zd), joined the scores BACK to f by
    // id, and paid that join's second pass over the training relation
    // every iteration. The window computes the identical exact
    // decimal sum zd on every feature row in ONE pass — score and
    // gradient fused into a single traversal per iteration (guide
    // §1.2 "remove unnecessary passes"; §2.4 window-reuses-
    // partitioning). Decimal addition is order-exact, so p — and
    // therefore every weight — is bit-identical to the join form
    // (Round22Spec pins it).
    val idW = Window.partitionBy(col("id"))
    var w: DataFrame = null
    for (_ <- 1 to iters) {
      val scored =
        if (w == null)
          f.crossJoin(broadcast(biasDf)) // 1-row scalar idiom
            .withColumn("p", round(lit(1.0d) /
              (lit(1.0d) + exp(-col("bias"))), 6))
        else
          f.join(broadcast(w), Seq("b"), "left")
            .withColumn("t",
              round(col("v") * coalesce(col("w"), lit(0.0d)), 12)
                .cast(dec))
            .withColumn("zd", sum(col("t")).over(idW))
            .crossJoin(broadcast(biasDf))
            .withColumn("p", round(lit(1.0d) /
              (lit(1.0d) + exp(-(col("bias") +
                col("zd").cast(DoubleType)))), 6))
      val grad = scored
        .withColumn("g",
          round((col("p") - col("y")) * col("v"), 12).cast(dec))
        .groupBy(col("b")).agg(sum(col("g")).as("grad"))
      val prev =
        (if (w == null) grad.withColumn("w0", lit(0.0d))
         else grad.join(w.withColumnRenamed("w", "w0"), Seq("b"),
           "full_outer"))
          .join(fm, Seq("b"), "left")
      // model state: nBuckets rows, truncated lineage, never collected
      w = prev.select(col("b"),
          round(coalesce(col("w0"), lit(0.0d)) -
            lit(lr) * coalesce(col("grad").cast(DoubleType) /
              col("fm").cast(DoubleType), lit(0.0d)), 6)
            .as("w"))
        .localCheckpoint()
    }
    w
  }

  /** The standing quality model's VERSION STRING — operating point +
    * feature space baked into the ledger identity, so a consumer can
    * never silently score against weights trained under a different
    * recipe: [[loadModel]] fails fast on a mismatch, and changing the
    * recipe here (or [[qualityIters]]/[[qualityLr]]) changes the
    * version, which changes the ledger path every caller derives from
    * it — stale state is unreachable by construction. A FUNCTION of
    * nBuckets, not a constant: the feature-space width is part of the
    * recipe (weights trained at 1024 buckets score garbage against
    * 4096-bucket features), so a caller that parameterizes nBuckets
    * ([[qualityClassifier]], Streams.classifierScoreFold) must stamp
    * and verify the width it actually used — a hardcoded `b4096`
    * would accept any width under one stamp, the exact silent recipe
    * mismatch the contract exists to prevent. */
  def qualityModelVersion(nBuckets: Int = 4096): String =
    s"quality-gd$qualityIters-lr$qualityLr-b$nBuckets-enSeed"

  /** Persist a trained model as the VERSIONED standing ledger (the
    * x74→x74b pattern applied to the classifier: train once, persist,
    * let consumers read standing state instead of re-running the
    * 12-epoch GD per query). Layout and version semantics are
    * [[graft.sources.VersionedState]]'s — weights/bias parts, meta
    * stamped last. */
  def persistModel(weights: DataFrame, biasDf: DataFrame,
                   path: String, version: String): Unit =
    graft.sources.VersionedState.write(path, version,
      "weights" -> weights, "bias" -> biasDf)

  /** True when a COMPLETE standing model of exactly `version` exists
    * at `path` — the S10 exists-guard for [[persistModel]] state. */
  def modelExists(spark: org.apache.spark.sql.SparkSession,
                  path: String, version: String): Boolean =
    graft.sources.VersionedState.exists(spark, path, version)

  /** Read the standing model back as (weights, bias), failing fast if
    * the persisted version differs from what the caller expects —
    * the versioned-state contract (a recipe change invalidates every
    * old ledger instead of silently mis-scoring against it). */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String, version: String)
      : (DataFrame, DataFrame) = {
    val ps = graft.sources.VersionedState.readParts(spark, path,
      version, "weights", "bias") // one version gate for the bundle
    (ps(0), ps(1))
  }

  /** Score docs against trained weights: p = σ(bias + Σ v·w_b),
    * rounded to 6; docs with no features (or absent from `feat`)
    * score σ(bias) — the class prior. `biasDf` is the 1-row (bias)
    * relation [[logisticBias]] builds. Returns (id, score). */
  def logisticScore(ids: DataFrame, feat: DataFrame,
                    weights: DataFrame, biasDf: DataFrame): DataFrame = {
    val z = feat.join(broadcast(weights), Seq("b"), "left")
      .withColumn("t",
        round(col("v") * coalesce(col("w"), lit(0.0d)), 12).cast(dec))
      .groupBy(col("id")).agg(sum(col("t")).as("zd"))
      .crossJoin(broadcast(biasDf)) // 1-row scalar idiom
      .withColumn("score", round(lit(1.0d) /
        (lit(1.0d) + exp(-(col("bias") +
          col("zd").cast(DoubleType)))), 6))
      .select(col("id"), col("score"))
    ids.crossJoin(broadcast(biasDf)).join(z, Seq("id"), "left")
      .select(col("id"), coalesce(col("score"),
        round(lit(1.0d) / (lit(1.0d) + exp(-col("bias"))), 6))
        .as("score"))
  }

  private val intDec = DecimalType(38, 0)

  /** FIXED-POINT cut: floor(x·1e6) — integer micro-units (1e-6).
    *
    * Why floor and not round: the x90/x97 round(…,6/12) discipline is
    * exact only when every rounded value is already an exact ≤k-digit
    * decimal (round = recovery, never a cut). Iterative linear
    * algebra breaks that invariant — sums get DIVIDED (by n, by a
    * norm) and the quotients land on EXACT .5 tails structurally
    * (e.g. Σ/500 ties with probability 1/500 per value), where
    * Spark's BigDecimal HALF_UP and DuckDB's binary-value rounding
    * disagree (measured: 15/64 loadings off by 1e-6). floor() has no
    * tie direction to disagree on: both engines floor the SAME
    * IEEE-identical double, so the cut is bit-identical by
    * construction — no tie analysis, at any scale, on any data. */
  private def q6(x: Column): Column = floor(x * lit(1000000.0d))

  /** The shared projection step of the micro-PCA family: s_id =
    * floor(Σ_d xc·v / 1e6) — one vector-grain hash agg with the
    * D-row `v` broadcast (the oracle's `proj`/`sp` CTE). */
  private def projMicro(centered: DataFrame, v: DataFrame): DataFrame =
    centered.join(broadcast(v), Seq("d"))
      .groupBy(col("id"))
      .agg(floor(sum((col("xc") * col("v")).cast(intDec))
        .cast(DoubleType) / lit(1000000.0d)).as("s"))

  /** Mean-center a long-form vector relation (id, d, x) into exact
    * integer micro-units: xi = floor(x·1e6), mi = floor(Σxi/n);
    * xc = xi − mi is EXACT integer arithmetic — centering loses
    * nothing beyond the input quantization. Returns (id, d, xc). */
  def centeredMicro(long: DataFrame): DataFrame = {
    val xi = long.select(col("id"), col("d"),
      q6(col("x")).as("xi"))
    val means = xi.groupBy(col("d"))
      .agg(floor(sum(col("xi").cast(intDec)).cast(DoubleType) /
        count(lit(1))).as("mi"))
    xi.join(broadcast(means), Seq("d"))
      .select(col("id"), col("d"), (col("xi") - col("mi")).as("xc"))
      // NOT pre-partitioned by id (measured, round 12): hash-
      // partitioning here would let the per-iteration id-joins skip
      // their exchange, but the upfront n·D shuffle costs more than
      // the iterations save at these D (the projection aggs reduce
      // to n rows before exchanging; st20/x105 regressed ~12% with
      // the repartition) — contrast logisticTrain's f, where it wins.
      .localCheckpoint()
  }

  /** Power iteration for the TOP PRINCIPAL COMPONENT of a centered
    * long-form vector relation (id, d, xc in micro-units from
    * [[centeredMicro]]) — the dominant-direction machinery embedding
    * post-processing needs ("All-but-the-Top", Mu & Viswanath 2018:
    * removing the top PC(s) from embedding spaces; also the
    * whitening step of PCA-based index builds). No MLlib, no driver
    * vector: one iteration is
    *
    *   s_r = Σ_d xc·v_d   (vector-grain hash agg: project rows onto v)
    *   u_d = Σ_r xc·s_r   (dim-grain hash agg: A^T (A v))
    *   v'  = u / ‖u‖      (normalize against the 1-row norm scalar)
    *
    * — two shuffles per iteration, with the model state a D-row
    * broadcast relation (same scale shape as [[logisticTrain]]: a
    * 1000-executor cluster iterates on 100 TB of embeddings exactly
    * like local[32], because v never concentrates on the driver).
    * v0 = floor(1e6/√D) on every dimension (deterministic,
    * all-positive — the sign convention both engines share).
    *
    * Fixed-point contract (see [[q6]]): every product is exact
    * long·long (bounds: |xc|,|v| ≤ 1e6 micro, |s| ≤ D·1e6 → terms ≤
    * ~3e13, far under 2^63), every sum is an exact DECIMAL(38,0)
    * sum, and the only lossy steps are floor() cuts and IEEE
    * double ÷/√ — all bit-identical across engines. u is pre-scaled
    * by n before its cut so magnitudes stay bounded at any corpus
    * size. `nRows` is the vector count (the same 1-action scalar
    * probe x74/x93 use).
    *
    * Returns the D-row (d, v) relation after `iters` steps, v in
    * micro-units. Convergence to the true PC needs an eigengap (the
    * near-isotropic synthetic embeddings barely have one — measured
    * at the call site); the CONTRACT is the replayed computation,
    * which is what the unrolled oracle checks bit-for-bit. */
  def powerIterationMicro(centered: DataFrame, dims: Int,
                          iters: Int, nRows: Long): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(nRows >= 1, s"nRows must be >= 1, got $nRows")
    val v0 = math.floor(1000000.0 / math.sqrt(dims.toDouble)).toLong
    var v = centered.select(col("d")).distinct()
      .select(col("d"), lit(v0).as("v"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val s = projMicro(centered, v)
      val u = centered.join(s, Seq("id"))
        .groupBy(col("d"))
        .agg(floor(sum((col("xc") * col("s")).cast(intDec))
            .cast(DoubleType) / lit(nRows.toDouble) / lit(1000000.0d))
          .as("u"))
      val nrm = u.agg(sqrt(sum((col("u") * col("u")).cast(intDec))
        .cast(DoubleType)).as("nrm"))
      v = u.crossJoin(broadcast(nrm)) // 1-row scalar idiom
        .select(col("d"),
          floor(col("u").cast(DoubleType) / col("nrm") *
            lit(1000000.0d)).as("v"))
        .localCheckpoint()
    }
    v
  }

  /** Variance along a unit direction (the Rayleigh quotient, ÷n
    * population convention) and the total variance, as a 1-row
    * (pc_var, total_var, evr) relation — the explained-variance pane
    * a PCA publishes next to its loadings. `v` in micro-units;
    * variances come back in VALUE units (÷1e12 undoes micro²),
    * floor-cut to 6 decimals. */
  def varianceAlongMicro(centered: DataFrame, v: DataFrame,
                         nRows: Long): DataFrame = {
    val s = projMicro(centered, v)
    val lam = s.agg((q6(sum((col("s") * col("s")).cast(intDec))
        .cast(DoubleType) / lit(1.0e12d) / lit(nRows.toDouble))
      / lit(1000000.0d)).as("pc_var"))
    val tot = centered.agg(
      (q6(sum((col("xc") * col("xc")).cast(intDec))
          .cast(DoubleType) / lit(1.0e12d) / lit(nRows.toDouble))
        / lit(1000000.0d)).as("total_var"))
    lam.crossJoin(tot)
      .withColumn("evr",
        q6(col("pc_var") / col("total_var")) / lit(1000000.0d))
  }

  /** "All-but-the-Top" (Mu & Viswanath 2018) projection removal:
    * e = xc − (xc·v̂)v̂ in the same micro fixed-point — the actual
    * embedding post-processing step [[powerIterationMicro]]'s PC
    * feeds. One vector-grain agg (the projections s) and one
    * broadcast join back; the corpus is touched twice and never
    * shuffled on the dim key. Returns (id, d, e) in micro-units,
    * exact integers (the only cuts are the two floor()s). */
  def removeTopPC(centered: DataFrame, v: DataFrame): DataFrame = {
    val s = projMicro(centered, v)
    centered.join(s, Seq("id")).join(broadcast(v), Seq("d"))
      .select(col("id"), col("d"),
        (col("xc") - floor((col("s") * col("v")).cast(DoubleType) /
          lit(1000000.0d))).as("e"))
  }

  /** Per-dimension population variance of a micro-units long-form
    * relation (÷1e12 undoes micro², floor-cut to 6 decimals) — the
    * audit pane for before/after comparisons like [[removeTopPC]]. */
  def perDimVarianceMicro(long: DataFrame, valueCol: String,
                          nRows: Long): DataFrame =
    long.groupBy(col("d"))
      .agg((q6(sum((col(valueCol) * col(valueCol)).cast(intDec))
          .cast(DoubleType) / lit(1.0e12d) / lit(nRows.toDouble))
        / lit(1000000.0d)).as("var_" + valueCol))

  /** The D×D co-moment (Gram) matrix of a centered micro-units
    * relation: G[d1,d2] = Σ_rows xc_d1·xc_d2 — EXACT integer sums.
    * This is the OTHER way to run PCA at scale and the dual of
    * [[powerIterationMicro]]: when D is small enough that D² state
    * fits (embeddings: D ≤ a few thousand), ONE corpus pass builds G
    * and every power iteration afterwards touches only D² rows —
    * iterations are free, the corpus is read once. The data-pass
    * form (x102) is for large D where D² state is infeasible. Scale
    * shape: the in-task pair fan-out (D² terms per row) combines
    * map-side (partial hash agg), so the exchange moves D²-row
    * partials, never n·D² rows. */
  def gramMicro(centered: DataFrame): DataFrame = {
    val a = centered.select(col("id"), col("d").as("d1"),
      col("xc").as("xc1"))
    val b = centered.select(col("id"), col("d").as("d2"),
      col("xc").as("xc2"))
    a.join(b, Seq("id"))
      .groupBy(col("d1"), col("d2"))
      // G stays DECIMAL(38,0): |G| reaches ~n·1e12 micro², which
      // overflows a silent (non-ANSI) long cast at n ~ 1e7 vectors —
      // exactly the scale the one-pass pitch targets. Every consumer
      // already does >64-bit arithmetic on G.
      .agg(sum((col("xc1") * col("xc2")).cast(intDec)).as("g"))
      // eagerly materialized (the centeredMicro/x82 idiom): every
      // power iteration and both variance aggs re-read G — without
      // this the n·D² join-agg replays per iteration (measured: 3×
      // the whole-query time at sf0.1)
      .localCheckpoint()
  }

  /** Power iteration ON THE GRAM MATRIX (fixed-point): one step is
    * u = G·w (a D²-row join-agg — executor-trivial), then the same
    * floor-cut normalization as [[powerIterationMicro]]. Exact
    * decimal products (G entries reach ~n·1e12; G·w terms need
    * >64-bit — DECIMAL(38,0) in Spark, HUGEINT in the oracle).
    * Returns (d, w) in micro-units. */
  def gramPowerIteration(gram: DataFrame, dims: Int, iters: Int,
                         nRows: Long): DataFrame = {
    require(iters >= 1 && dims >= 1 && nRows >= 1,
      s"bad args: iters=$iters dims=$dims nRows=$nRows")
    val v0 = math.floor(1000000.0 / math.sqrt(dims.toDouble)).toLong
    var w = gram.select(col("d1").as("d")).distinct()
      .select(col("d"), lit(v0).as("w"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val u = gram.join(broadcast(w), gram("d2") === w("d"))
        .groupBy(col("d1"))
        .agg(floor(sum(col("g").cast(intDec) * col("w"))
            .cast(DoubleType) / lit(nRows.toDouble)
            / lit(1.0e12d)).as("u"))
        .select(col("d1").as("d"), col("u"))
      val nrm = u.agg(sqrt(sum((col("u") * col("u")).cast(intDec))
        .cast(DoubleType)).as("nrm"))
      w = u.crossJoin(broadcast(nrm)) // 1-row scalar idiom
        .select(col("d"),
          floor(col("u").cast(DoubleType) / col("nrm") *
            lit(1000000.0d)).as("w"))
        .localCheckpoint()
    }
    w
  }

  /** Variance pane from the gram form: pc_var = wᵀGw/(n·1e24) along
    * the unit direction, total_var = trace(G)/(n·1e12), evr — all
    * floor-cut to 6 decimals (the same q6 discipline). */
  def gramVariancePane(gram: DataFrame, w: DataFrame,
                       nRows: Long): DataFrame = {
    val w1 = w.select(col("d").as("d1"), col("w").as("w1"))
    val w2 = w.select(col("d").as("d2"), col("w").as("w2"))
    val lam = gram.join(broadcast(w1), Seq("d1"))
      .join(broadcast(w2), Seq("d2"))
      .agg((q6(sum(col("g").cast(intDec) * col("w1") * col("w2"))
          .cast(DoubleType) / lit(nRows.toDouble) / lit(1.0e12d)
          / lit(1.0e12d)) / lit(1000000.0d)).as("pc_var"))
    val tot = gram.filter(col("d1") === col("d2"))
      .agg((q6(sum(col("g").cast(intDec)).cast(DoubleType)
          / lit(nRows.toDouble) / lit(1.0e12d))
        / lit(1000000.0d)).as("total_var"))
    lam.crossJoin(tot)
      .withColumn("evr",
        q6(col("pc_var") / col("total_var")) / lit(1000000.0d))
  }

  /** DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining", NeurIPS
    * 2023), reduced to its grouped-loss → exponentiated-gradient core
    * and driven by the in-engine bigram LM ([[TextOps.bigramLogProb]])
    * in place of the paper's proxy/reference model pair: domains
    * whose documents the corpus LM finds HARD (mean NLL above the
    * doc-weighted corpus mean) get their mixture weight multiplied by
    * exp(η·excess) and renormalized; below-mean domains clamp to
    * excess 0 (the published max(0, ·) clamp — easy/redundant domains
    * are never upweighted); the final weights smooth toward uniform
    * with mixing weight λ, DoReMi's (1−λ)·softmax + λ·u step. Where
    * x37's mixturePlan takes weights as GIVEN config, this MEASURES
    * them from the corpus — the advisor half of data mixing.
    *
    * 100 TB shape: doc scoring is x90's distributed count-and-join
    * chain (bigram/unigram tables stay distributed, only a 1-row
    * vocab size broadcasts); everything after runs on a DOMAIN-grain
    * pane (D rows — the unpartitioned window over it is state-grain,
    * not data-grain). The pane doubles as the mixture PLAN:
    * target_tokens = floor(budget·weight + 0.5) realizes the weights
    * against a token budget exactly the way [[Sampling.mixturePlan]]
    * does, so the advisor's output is directly the action's input.
    *
    * Determinism (oracle contract): per-doc scores are x90's
    * round(…,4); domain means and the doc-weighted reference ride
    * exact DECIMAL sums; the boost/normalize chain is IEEE-double
    * arithmetic on identical inputs rounded to 4 only at the output
    * (exp/ln last-ulp differences sit ~12 orders below the rounding
    * grain). Docs with < 2 tokens carry no order signal and drop from
    * scoring — n_docs counts SCORED docs; corpus_tokens counts every
    * domain token so the budget split reflects the real corpus. A
    * domain with no scorable doc drops from the pane entirely. */
  def domainReweight(df: DataFrame, domain: Column, id: Column,
                     text: Column, eta: Double, lambda: Double,
                     budgetTokens: Long): DataFrame = {
    require(eta > 0.0, s"domainReweight: eta must be > 0: $eta")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"domainReweight: lambda must be in [0,1]: $lambda")
    require(budgetTokens > 0L,
      s"domainReweight: budgetTokens must be > 0: $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val dec4 = DecimalType(18, 4)
    val dm = df.select(id.as("id"), domain.as("domain"),
      text.as("__tx"))
    val scored = TextOps.bigramLogProb(dm, col("id"), col("__tx"))
    val dom = dm.select(col("id"), col("domain"))
      .join(scored, Seq("id"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("avg_logp2").cast(dec4)).as("__s"))
      .withColumn("mean_nll",
        round(-col("__s").cast(DoubleType) / col("n_docs"), 4))
    val toks = dm.groupBy(col("domain"))
      .agg(sum(size(regexp_extract_all(lower(col("__tx")),
        lit("\\S+"), lit(0)))).as("corpus_tokens"))
    val ref = dom.agg(
      (sum(col("mean_nll").cast(dec4) * col("n_docs"))
        .cast(DoubleType) / sum(col("n_docs"))).as("__ref"))
    val w = Window.partitionBy() // D-row domain pane, state-grain
    dom.join(toks, Seq("domain"))
      .crossJoin(broadcast(ref)) // 1-row scalar reference loss
      .withColumn("__ex",
        greatest(lit(0.0d), col("mean_nll") - col("__ref")))
      .withColumn("__boost", exp(lit(eta) * col("__ex")))
      .withColumn("weight", round(
        lit(1.0d - lambda) * col("__boost")
          / sum(col("__boost")).over(w)
          + lit(lambda) / count(lit(1)).over(w), 4))
      .select(col("domain"), col("n_docs"), col("corpus_tokens"),
        col("mean_nll"), round(col("__ex"), 4).as("excess"),
        col("weight"),
        floor(lit(budgetTokens.toDouble) * col("weight") + lit(0.5d))
          .cast(LongType).as("target_tokens"))
  }
}
