package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling.
  *
  * `df.sample(fraction)` is seed-stable only within one Spark version
  * and partition layout; a training-data pipeline needs samples that are
  * (a) reproducible across reruns and cluster sizes, (b) auditable — a
  * row's membership is a pure function of its key, and (c) cheap — no
  * shuffle, no count pass. Hashing the key and keeping rows below a
  * threshold gives all three: the md5 of the key is uniform, so keeping
  * `m` of the 16 first-nibble values yields an m/16 sample of each
  * stratum independent of row order, partitioning, or engine.
  *
  * This is the per-row filter a 100 TB scan wants: fully pushed into the
  * scan stage, codegen'd, embarrassingly parallel.
  */
object Sampling {

  private val nibbles = "0123456789abcdef"

  /** Keep rows whose md5(key) first nibble < m — an m/16 deterministic
    * sample. `key` should be a stable unique id (cast to string). */
  def hashSample(df: DataFrame, key: Column, m: Int): DataFrame = {
    require(m >= 0 && m <= 16, s"m must be in [0,16], got $m")
    df.filter(substring(md5(key.cast("string")), 1, 1)
      .isin(nibbles.take(m).map(_.toString): _*))
  }

  /** Temperature (α<1) source rebalancing: the data-mixing sample an
    * LLM pretraining pipeline draws when one source dwarfs the rest.
    * Target share per stratum ∝ n^α, realized as the deterministic
    * acceptance rate `(n_min/n)^(1-α)` — the smallest stratum keeps
    * everything, heavy strata are down-weighted. Membership is the
    * md5-uniform rule above at 16-bit granularity: keep a row when the
    * first 4 md5 hex chars (a uniform in [0, 16^4)) sort below the
    * stratum's rate threshold, rendered as a 4-char hex string so both
    * engines compare plain strings. α = 0.5 uses `sqrt` directly
    * (bit-identical across libm implementations, unlike `pow`).
    *
    * Plan: one tiny stratum-count aggregation (broadcast back), then a
    * per-row codegen'd filter — at 100 TB the rate table is dozens of
    * rows and the sample is one scan-speed pass. */
  def temperatureSample(df: DataFrame, stratum: Column, key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rates = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__nmin", min(col("__n")).over(Window.partitionBy()))
      .withColumn("__rate",
        sqrt(col("__nmin").cast("double") / col("__n")))
      .withColumn("__thresh",
        lpad(lower(hex(floor(col("__rate") * 65536.0d).cast("long"))),
          4, "0"))
    df.withColumn("__stratum", stratum)
      .join(broadcast(rates), Seq("__stratum"))
      .filter(col("__rate") >= 1.0d ||
        substring(md5(concat(col("__stratum").cast("string"), lit("|"),
          key.cast("string"))), 1, 4) < col("__thresh"))
      .withColumn("sample_rate", col("__rate"))
      .drop("__stratum", "__n", "__nmin", "__rate", "__thresh")
  }

  /** Exactly-k deterministic sample per stratum: rows rank by their
    * md5 priority within the stratum and the top `k` survive — the
    * "100 examples per source" draw, stable across engines, reruns,
    * and partitionings (a hash-priority reservoir without the
    * randomness). One keyed window; at scale pre-filter with
    * [[hashSample]] at a loose rate first so the sort ranks a small
    * superset instead of the full stratum. */
  def fixedKPerStratum(df: DataFrame, stratum: Column, key: Column,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum)
      .orderBy(md5(key.cast("string")).asc, key.asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic train/val/test assignment: the row's key hashes to
    * a uniform 16-bit value and the split is a range cut — membership
    * is a pure function of the key (stable across reruns, engines,
    * partitionings; a doc never migrates between splits when the
    * corpus grows, which random splitting cannot promise). Scan-speed
    * codegen'd expression, no shuffle, no count pass. */
  def threeWaySplit(df: DataFrame, key: Column,
                    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: $trainPct/$valPct")
    val trainCut = trainPct * 65536 / 100
    val valCut = (trainPct + valPct) * 65536 / 100
    val u = conv(substring(md5(key.cast("string")), 1, 4), 16, 10)
      .cast("int")
    df.withColumn("split",
      when(u < trainCut, "train")
        .when(u < valCut, "val")
        .otherwise("test"))
  }

  /** Leakage-safe train/val/test split: assign the split at the
    * duplicate-CLUSTER grain, not the row grain. A plain row-keyed
    * split ([[threeWaySplit]] on the doc id) puts byte-identical
    * near-copies of one document on both sides of the train/test
    * fence — the classic eval-contamination bug. Keying the split hash
    * on the content fingerprint instead makes every exact duplicate
    * inherit one split by construction; near-dup clusters compose the
    * same way by passing a canonical cluster label (e.g. the
    * connected-component label from Dedup.connectedComponents) as
    * `clusterKey`.
    *
    * Adds `cluster_fp` (the split key) and `split`. Same scan-speed
    * shape as [[threeWaySplit]]: per-row md5, no shuffle, no count
    * pass — the split of a row never depends on any other row. */
  def leakageSafeSplit(df: DataFrame, text: Column,
                       clusterKey: Option[Column] = None,
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val fp = clusterKey.getOrElse(graft.functions.ColFns.fingerprint(text))
    threeWaySplit(df.withColumn("cluster_fp", fp.cast("string")),
      col("cluster_fp"), trainPct, valPct)
  }

  /** Leakage-safe k-fold assignment (cross-validation folds): fold =
    * md5-uniform bucket of the duplicate-cluster fingerprint modulo
    * `k`, so exact-dup clusters never straddle folds (the
    * [[leakageSafeSplit]] guarantee, generalized from 3 named splits
    * to k numbered folds). Near-dup composition: pass the CC label as
    * `clusterKey`. Scan-speed, shuffle-free, reproducible anywhere. */
  def kFoldSplit(df: DataFrame, text: Column,
                 k: Int, clusterKey: Option[Column] = None): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    val fp = clusterKey.getOrElse(graft.functions.ColFns.fingerprint(text))
    df.withColumn("cluster_fp", fp.cast("string"))
      .withColumn("fold",
        pmod(conv(substring(md5(col("cluster_fp")), 1, 8), 16, 10)
          .cast("long"), lit(k.toLong)))
  }

  /** Training-mixture plan: given per-source corpus stats, target
    * mixture weights, and a total token budget, emit each source's
    * share of the budget and how to realize it — `full_epochs` whole
    * passes over the source plus a `tail_fraction` deterministic
    * sample ([[hashSample]]/[[stratifiedHashSample]] realizes the
    * tail). Sources absent from `weights` are excluded; weights are
    * normalized over the sources present. Per-source `target_tokens`
    * round half-up independently, so the plan total can differ from
    * the budget by up to ±(sources/2) tokens — exact-division weight
    * sets spend it exactly; use largest-remainder apportionment if a
    * consumer needs the sum pinned.
    *
    * This is the planning half of data mixing (cf. temperature
    * sampling, which PICKS weights ∝ n^α): one tiny per-source
    * aggregation + a broadcast of the weight table; the expensive
    * realization stays a scan-speed filter. All arithmetic is
    * IEEE-double with explicit half-up rounding, so a warehouse
    * engine auditing the plan reproduces it bit-for-bit. */
  def mixturePlan(df: DataFrame, source: Column, tokens: Column,
                  weights: Seq[(String, Double)],
                  budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toDF("source", "weight")
    val stats = df.select(source.as("source"), tokens.as("__tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("corpus_tokens"))
    val ratio = col("target_tokens").cast("double") /
      col("corpus_tokens").cast("double")
    stats.join(broadcast(w), Seq("source"))
      .withColumn("weight_norm",
        col("weight") / sum(col("weight")).over(Window.partitionBy()))
      .withColumn("target_tokens",
        floor(lit(budgetTokens.toDouble) * col("weight_norm") + 0.5d)
          .cast("long"))
      .withColumn("repeat_factor", round(ratio, 4))
      .withColumn("full_epochs", floor(ratio).cast("long"))
      .withColumn("tail_fraction", round(ratio - floor(ratio), 4))
      .select(col("source"), col("n_docs"), col("corpus_tokens"),
        round(col("weight_norm"), 4).as("weight_norm"),
        col("target_tokens"), col("repeat_factor"),
        col("full_epochs"), col("tail_fraction"))
  }

  /** Stratified variant: the nibble is drawn from md5(stratum || '|' ||
    * key), so each stratum is sampled at m/16 independently — a skewed
    * stratum cannot starve the others of hash space. */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
                           m: Int): DataFrame = {
    require(m >= 0 && m <= 16, s"m must be in [0,16], got $m")
    df.filter(
      substring(md5(concat(stratum.cast("string"), lit("|"),
        key.cast("string"))), 1, 1)
        .isin(nibbles.take(m).map(_.toString): _*))
  }

  /** Deterministic weighted reservoir: exactly-k draw per stratum with
    * inclusion probability proportional to `weight` (Efraimidis &
    * Spirakis, IPL 2006 — item survives iff its key u^(1/w) ranks
    * top-k, equivalently ln(u)/w, the log form both engines compute
    * identically). u ∈ (0,1] is a pure function of the row key
    * (portableHash60 / 2^60 — the division is by a power of two, so
    * it is EXACT), which buys the house sampling guarantees:
    * reproducible across engines/reruns/partitionings, and auditable
    * per row. The priority is rounded to 12 decimals so both engines
    * rank identical keys (libm ln differs in the last ulp; the
    * rounding is 4 orders of magnitude coarser than that and 8 finer
    * than any real priority gap).
    *
    * Shape: ONE bounded-heap aggregation ([[graft.functions.TopKAgg]]
    * — ≤k rows of state per stratum, partial map-side combine), not
    * the per-stratum full sort the `ORDER BY random()` idiom pays.
    * The weighted complement to [[fixedKPerStratum]]'s uniform draw.
    *
    * Precondition: `weight` must be strictly positive. Zero gives
    * ln(u)/0 = -Inf and a negative weight FLIPS the priority sign, so
    * such rows would deterministically outrank every valid row; rows
    * with weight ≤ 0 (or NULL) are excluded from the draw up front. */
  def weightedReservoir(df: DataFrame, stratum: Column, key: Column,
                        weight: Column, k: Int): DataFrame = {
    val u = (graft.functions.ColFns.portableHash60(key) + lit(1L))
      .cast("double") / lit(1152921504606846976.0d) // 2^60
    val priority = round(log(u) / weight.cast("double"), 12)
    df.filter(weight.cast("double") > 0.0d)
      .groupBy(stratum.as("stratum"))
      .agg(graft.functions.TopKAgg.topK(
        struct(priority.as("p"), (-key).as("nk"), key.as("key")), k)
        .as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("stratum"), (col("i") + 1).cast("int").as("rk"),
        col("r.key").as("key"))
  }
}
