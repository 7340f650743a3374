package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / filter / rename helpers (SURVEY §2.2): the reference's
  * pandas column surgery as tolerant, pure DataFrame transforms.
  */
object Relational {

  /** Drop a fixed column set, tolerating absent columns (reference
    * `d_gmaps_places_src_to_ods.py:71-94` catches missing-col errors). */
  def dropCols(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.contains)
    df.drop(present: _*)
  }

  /** Drop columns whose *name* matches a regex (reference `^Unnamed`
    * drop, `tripadvisor/d_tripadvisor_src_to_ods.py:45-48`). */
  def dropColsRegex(df: DataFrame, pattern: String): DataFrame =
    df.select(df.columns.filterNot(_.matches(pattern)).toIndexedSeq.map(col): _*)

  /** Bulk rename (reference zh→en maps,
    * `tripadvisor/d_tripadvisor_src_to_ods.py:51-63`). */
  def renameAll(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** Add an overwritten column while keeping the original under
    * `<name>_raw` (reference place_id handling,
    * `d_gmaps_places_src_to_ods.py:62-69`). */
  def overwriteKeepRaw(df: DataFrame, name: String, value: Column): DataFrame =
    df.withColumn(s"${name}_raw", col(name)).withColumn(name, value)

  /** Deterministic pseudo-random shuffle (reference `sample(frac=1)`
    * de-skew, `d_gmaps_crawler_to_src.py:49` — seeded here so reruns are
    * stable and a SQL oracle can reproduce the order). */
  def deterministicShuffle(df: DataFrame, keyCol: Column): DataFrame =
    df.orderBy(md5(keyCol.cast("string")), keyCol)

  /** Skew-resistant equi-join: salt the skewed (left) side's key into
    * `salt` sub-keys and replicate the build (right) side once per salt
    * value, so one hot key spreads over `salt` shuffle partitions
    * instead of hot-spotting one reducer.
    *
    * Inner equi-join semantics are unchanged: every (l, r) key match
    * meets in exactly one salted bucket. This is the manual fallback
    * for when AQE skew-join can't kick in (e.g. the skew is in a
    * grouping key feeding the join, or AQE is off); prefer plain joins
    * + AQE where possible. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Measured join-strategy ROUTER (the x93b pattern applied to
    * joins): pick the physical join plan for fact ⋈ dim from a
    * preflight measurement of the dim side, instead of trusting
    * static size stats that 100 TB pipelines rarely have right.
    *
    *   - dim rows ≤ `broadcastRows`   → broadcast hash join (no
    *     fact-side shuffle at all — the plan every small-dim join
    *     should get);
    *   - ≤ `bloomRows`                → shuffle join, but the fact
    *     side is PRE-FILTERED by a bloom sketch of the dim keys
    *     (the b2 runtime-filter pattern: the sketch is KBs, rides as
    *     a literal, and cuts the fact shuffle to ~the matching rows
    *     — semi-join reduction without a first join);
    *   - else                         → plain shuffle join (dim too
    *     big for a useful sketch; let AQE handle skew).
    *
    * The route NEVER changes the result (broadcast is a hint; the
    * bloom prefilter has no false negatives, and the join re-checks
    * equality after it) — which is exactly what makes it oracle-able:
    * one SQL join checks all three routes. The preflight `count` on
    * the dim is the same 1-action scalar probe x74/x93 use; on a real
    * lake it reads footer statistics, here it is one cheap job.
    * Returns (joined, route) so callers/specs can pin the decision. */
  def joinAuto(fact: DataFrame, dim: DataFrame, key: String,
               broadcastRows: Long = 1000000L,
               bloomRows: Long = 50000000L): (DataFrame, String) = {
    val n = dim.count()
    if (n <= broadcastRows)
      (fact.join(broadcast(dim), Seq(key)), "broadcast")
    else if (n <= bloomRows) {
      // bits capped at Spark's own runtime-filter ceiling (8 MB —
      // spark.sql.optimizer.runtime.bloomFilter.maxNumBits): the
      // sketch rides the plan as a literal, so an uncapped 10
      // bits/key at the 50M-row route boundary would ship ~60 MB to
      // every task. A capped bloom only raises the false-positive
      // rate (more non-matching fact rows survive to the join) —
      // never false negatives, so the result is unchanged.
      // materialize once: the bloom route otherwise executes the dim
      // plan twice more (sketch build + join) after the preflight —
      // 3× the cost of a derived dim relation
      val dm = dim.localCheckpoint()
      val bloomBytes = dm
        .agg(graft.functions.BloomFns.bloomAgg(col(key),
          math.max(n, 1L),
          math.min(math.max(n, 1L) * 10L, 67108864L)))
        .head().getAs[Array[Byte]](0)
      (fact.filter(graft.functions.BloomFns
          .mightContain(bloomBytes, col(key)))
        .join(dm, Seq(key)), "bloom_shuffle")
    } else (fact.join(dim, Seq(key)), "shuffle")
  }

  /** EXECUTABLE salt-sizing rule connecting the x24 skew audit to
    * [[saltedJoin]] (the lgkFor/bandsFor discipline, like x108's
    * partition advisor): measure the heaviest key's row share and
    * recommend the salt factor that spreads it across the target
    * parallelism — rec_salt = ceil(max_key_rows · P / total), i.e.
    * how many partitions' worth of rows the hot key carries, clamped
    * to [1, P]. rec_salt = 1 means "don't salt" (the advisor's
    * no-skew branch); ceil is floor((a·P + t − 1)/t) on
    * IEEE-identical doubles so an oracle reproduces it bit-for-bit.
    * ONE scan of the fact table: the key-count relation (D rows,
    * D ≪ N) is materialized once and both the argmax and the
    * totals derive from it — total_rows = Σ counts, distinct_keys =
    * count of non-null keys (countDistinct semantics). Ties on the
    * max key break by key value ascending with NULLS LAST (pinned:
    * DuckDB's ASC default, so the oracle agrees even when a null
    * key group ties for the max). Returns a 1-row (key_col,
    * total_rows, distinct_keys, max_key, max_rows, max_share,
    * rec_salt) pane. */
  def saltAdvisor(df: DataFrame, key: String,
                  partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1: $partitions")
    val counts = df.groupBy(col(key))
      .agg(count(lit(1)).as("max_rows")).localCheckpoint()
    val mk = counts
      .orderBy(col("max_rows").desc, col(key).asc_nulls_last).limit(1)
      .select(col(key).cast("string").as("max_key"), col("max_rows"))
    val tot = counts.agg(sum(col("max_rows")).as("total_rows"),
      count(col(key)).as("distinct_keys"))
    // LEFT join, not crossJoin: on an EMPTY input `mk` has 0 rows
    // and a crossJoin would empty the pane, breaking the documented
    // 1-row contract (and a crash for callers doing .collect()(0));
    // `tot` is agg-without-groupBy so it is always exactly 1 row.
    // The empty pane reads total_rows = 0, null max key/share, and
    // rec_salt = 1 ("don't salt") — greatest/least skip nulls in
    // Spark, so rec_salt needs the explicit empty branch or a null
    // max_rows would yield rec_salt = partitions.
    tot.join(mk, lit(true), "left")
      .select(lit(key).as("key_col"),
        coalesce(col("total_rows"), lit(0L)).as("total_rows"),
        col("distinct_keys"), col("max_key"),
        coalesce(col("max_rows"), lit(0L)).as("max_rows"),
        (floor(col("max_rows").cast("double") / col("total_rows")
          * lit(10000.0d)) / lit(10000.0d)).as("max_share"),
        when(col("total_rows").isNull, lit(1L)).otherwise(
          greatest(lit(1L), least(lit(partitions.toLong),
            floor((col("max_rows").cast("double")
                * lit(partitions.toDouble) + col("total_rows")
                - lit(1.0d)) / col("total_rows"))
              .cast("long")))).as("rec_salt"))
  }
}
