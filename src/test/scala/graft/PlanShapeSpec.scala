package graft

/** Physical-plan shape regression guards — the `.explain` audits that
  * keep the 100 TB story true, as executable assertions: small dims
  * must broadcast (not sort-merge), filters and projections must reach
  * the parquet scan, and bucketed joins must plan with zero exchanges.
  * Asserting on `sparkPlan` (the pre-AQE physical plan) keeps the
  * checks deterministic under adaptive execution. */
class PlanShapeSpec extends GraftSuite {

  private val dir = SparkTestBase.sfDir

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan.toString

  /** The FULLY-PREPARED static plan (exchanges + codegen inserted,
    * AQE off) — required for any exchange-count assertion:
    * `sparkPlan` predates EnsureRequirements, so exchanges are not
    * in it and a "no exchange" check against it is vacuous (the
    * PlanAudit.auditPlan rationale). */
  private def prepared(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    try {
      spark.conf.set(key, "false")
      spark.sessionState.executePlan(df.queryExecution.logical)
        .executedPlan.toString
    } finally spark.conf.set(key, prev)
  }

  test("j4 flagship: dims broadcast, no sort-merge join") {
    val p = plan("j4_mart_flagship")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), p.take(500))
  }

  test("p5 projection+filter: predicate pushed to the parquet scan") {
    val p = plan("p5_project_filter")
    assert(p.contains("PushedFilters: ["), p.take(800))
    assert(p.contains("IsNotNull") || p.contains("GreaterThan"), p.take(800))
  }

  test("p5 projection+filter: scan reads a pruned schema, not all columns") {
    val df = SparkEntry.queries("p5_project_filter")(spark, dir)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // lineitem has 16 columns; the projection needs a strict subset
    assert(scans.forall(_.requiredSchema.fields.length < 16),
      scans.map(_.requiredSchema.fieldNames.mkString(",")).mkString(";"))
  }

  test("b1 bucketed join: zero exchanges in the join plan") {
    // at spec scale the dims fit the broadcast threshold, which would
    // hide the bucketing property — force a shuffle-class join
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    // prepared plan, not sparkPlan: the exchanges this test asserts
    // the ABSENCE of only exist after EnsureRequirements runs
    val p = try prepared("b1_bucketed_join")
      finally spark.conf.set(key, prev)
    // one Exchange is legal for the final tiny groupBy; the JOIN itself
    // must not shuffle either side: no exchange may appear below the join
    val joinIdx = p.indexOf("SortMergeJoin") match {
      case -1 => p.indexOf("ShuffledHashJoin")
      case i => i
    }
    assert(joinIdx >= 0, "expected a shuffle-class join over bucketed scans")
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      below.take(800))
  }

  test("x32 admission: batch broadcasts in both tiers") {
    val p = plan("x32_incremental_admit")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 2, s"expected >=2 broadcast joins, saw $n")
  }

  test("j8 lookup join: dim broadcast") {
    val p = plan("j8_lookup_join")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("j16b grid geo join: cell-key equi-join on the hit path, probe side never exploded") {
    val p = plan("j16b_geo_nearest_grid")
    // the grid pass must plan as an equi-join on (gx, gy) — broadcast
    // or shuffle class depending on the exploded dim's size — with the
    // ×9 Generate (explode) on the RIGHT/dim subtree only; the brute
    // crossJoin may appear solely in the fallback branch for misses
    assert(p.contains("gx") && p.contains("gy"), p.take(800))
    val generates = "Generate explode".r.findAllIn(p).length
    assert(generates >= 1, s"expected the dim-side 3x3 explode: ${p.take(500)}")
    // the per-left argmin is an aggregate (partial + final), not a window
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      p.take(800))
  }

  test("x52 pair generation: within-cell hash equi-join, no cartesian pair space") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    // the SemDeDup candidate join (cells ⋈ cells ON cid) must plan as a
    // hash-class equi-join on the cell id — the O(n²)/cells pair space —
    // never a cartesian product; the only nested-loop joins allowed are
    // assignCells' 8-row centroid broadcasts (one per join side)
    val cells = Similarity.assignCells(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 8)
      .withColumn("nrm", graft.functions.VectorExprs.norm(col("embedding")))
    val pairs = cells.as("a").join(cells.as("b"),
      col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
    val p = pairs.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(800))
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnl <= 2, s"unexpected nested-loop joins beyond the centroid broadcasts: $bnl")
  }

  test("j17 nearest as-of: both window directions share ONE keyed shuffle") {
    // exchanges only exist post-EnsureRequirements → executedPlan (the
    // initial AQE plan), not the bare sparkPlan the other tests read
    val p = SparkEntry.queries("j17_nearest_join")(spark, dir)
      .queryExecution.executedPlan.toString
    // the union+window formulation must not shuffle per frame: exactly
    // one hash exchange on the key feeds every Window node (the final
    // rangepartitioning exchange is the output ORDER BY)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected 1 keyed exchange, saw $hashEx:\n${p.take(900)}")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p.take(600))
  }

  test("x65 cross-source leakage: postings equi-join, no cartesian") {
    val p = plan("x65_cross_source_leakage")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("sq8TopK: query side broadcasts in shortlist AND rerank; corpus never sort-merges") {
    // the int8 shortlist must be corpus-scan × broadcast(queries), and
    // the rerank joins must stay broadcast too — a sort-merge corpus
    // side breaks the one-pass scan story the operator exists for.
    // (x71's own plan adds a tiny SMJ for the recall-CONTRACT join of
    // two top-k tables, which is out of scope here.)
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, dir, "embeddings")
    val p = graft.operators.Similarity.sq8TopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
        k = 5, shortlist = 20)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("Broadcast(NestedLoop|Hash)Join".r.findAllIn(p).length >= 2,
      p.take(800))
  }

  test("x74 theta overlap: partial sketch agg, no cartesian on the gram path") {
    val p = plan("x74_theta_overlap")
    // the 100 TB property: rows combine into sketches map-side, so the
    // agg exchange moves KB-sized binaries, not gram rows — theta aggs
    // must plan as ObjectHashAggregate with a partial_ mode present
    assert(p.contains("ObjectHashAggregate"), p.take(900))
    assert(p.contains("partial_graft_theta_agg"), p.take(900))
    // gram-cardinality joins must be equi-joins; the only nested-loop
    // join allowed is the 20-row sketch-pair self-join
    assert(!p.contains("CartesianProduct"), p.take(900))
  }

  test("m9 kll ledger: partial sketch agg in the daily slice pass") {
    val p = plan("m9_kll_ledger")
    assert(p.contains("ObjectHashAggregate"), p.take(900))
    assert(p.contains("partial_graft_kll_agg"), p.take(900))
  }

  test("ivfpqTopK: corpus never cartesians or sort-merges; codebook/table sides broadcast") {
    // the IVFPQ scale story: the only shuffle scaling with corpus size
    // is the probed-cell ADC aggregation — codebooks, centroids, and
    // per-query distance tables are all broadcast; a sort-merge or
    // cartesian on the corpus side breaks the one-pass-scan claim
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, dir, "embeddings")
    val p = graft.operators.Similarity.ivfpqTopK(
        emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
        k = 3, nlist = 4, nprobe = 2, m = 4, ksub = 8)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert("Broadcast(NestedLoop|Hash)Join".r.findAllIn(p).length >= 3,
      p.take(800))
  }

  test("x89 freq ledger: partial sketch agg on the token path") {
    // same property as x74/m9: token rows combine into KB sketches
    // map-side, so the agg exchange moves sketch bytes, not tokens
    val p = plan("x89_freq_items_ledger")
    assert(p.contains("ObjectHashAggregate"), p.take(900))
    assert(p.contains("partial_graft_freq_agg"), p.take(900))
    // the only nested-loop join allowed is the 1-row merged-sketch
    // broadcast; a true cartesian over token rows is a defect
    assert(!p.contains("CartesianProduct"), p.take(900))
  }

  test("p13/x79/x86/e2e_webcorpus/a20: no single-partition window over " +
       "data-grain rows") {
    // the round-4 verdict's perf_weak trio (+ a20, the round-6 find):
    // each formerly ran ntile/cumsum as `Window.orderBy(...)` with no
    // PARTITION BY — a one-executor sort wall at corpus scale. All now
    // route through Layout's range-exchange count-and-offset machinery,
    // whose ONLY unpartitioned window runs over the ≤numPartitions
    // metadata offset rows (directly above the per-__pid aggregate).
    // The guard is keyed to that structure: every WindowExec with an
    // empty partitionSpec must sit above an aggregate GROUPED BY __pid
    // — the metadata-offsets shape and nothing else. The round-4 form
    // of this pin only demanded SOME aggregate below, which a20's old
    // customer-grain global window satisfied (its input was the
    // revenue groupBy) while still funneling every customer through
    // one task; the __pid key closes that hole (proven below on the
    // old form, rebuilt inline as the negative control).
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    def dataGrainGlobalWindows(
        plan: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] =
      plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
            w.child.collect {
              case a: BaseAggregateExec if a.groupingExpressions
                .exists(_.references.exists(_.name == "__pid")) => a
            }.isEmpty => w
      }
    for (q <- Seq("p13_batch_ntile", "x79_ccnet_buckets",
                  "x86_quality_curriculum", "e2e_webcorpus",
                  "a20_pareto_abc")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.sparkPlan
      val bad = dataGrainGlobalWindows(plan)
      assert(bad.isEmpty,
        s"$q plans a data-grain global window:\n${bad.mkString("\n").take(900)}")
    }
    // negative control: a20's ROUND-6 form (cumulative share as a
    // customer-grain Window.orderBy above the revenue groupBy) must
    // FAIL this detector — the pin is only worth its name if the
    // plan it was written to kill cannot pass it
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rev = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val oldForm = rev.withColumn("cum", sum(col("rev")).over(
      Window.orderBy(col("rev").desc, col("o_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(dataGrainGlobalWindows(
        oldForm.queryExecution.sparkPlan).nonEmpty,
      "the detector no longer catches the customer-grain global window")
  }

  test("x95/x96: candidate generation broadcasts the query/A side; " +
       "no cartesian pair space") {
    // x95's dense branch and x96's pair relation are both the
    // bruteTopK idiom: corpus rows × BROADCAST small side via a
    // nested-loop join — never a CartesianProduct (which would
    // shuffle-replicate both sides) and never a corpus self-shuffle
    for (q <- Seq("x95_hybrid_rrf", "x96_bitext_margin")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(500)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(500)}")
    }
  }

  test("x111 boilerplateStrip: the removal decision is a broadcast " +
       "anti-join — the corpus never shuffles on the segment hash") {
    // a footer hash present in EVERY document is the hottest
    // possible shuffle-join key; the broadcast blacklist anti-join
    // has no hot partition by construction. Only the DF-count pass
    // and the doc-grain reassembly may exchange.
    val p = plan("x111_boilerplate_strip")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(600))
    // scope the negative pin to the segment-hash key: the doc-grain
    // totals/reassembly join is ALLOWED to sort-merge at scale (it
    // broadcasts here only by test-size accident) — the claim under
    // pin is that the blacklist decision never shuffles on h
    assert(!p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("h#")), p.take(800))
  }

  test("x97 scoring: the model broadcasts — the corpus never " +
       "shuffles on the bucket key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val feat = graft.operators.Learn.features(docs, col("doc_id"),
      col("text"))
    val w = Seq((0L, 0.1), (5L, -0.2)).toDF("b", "w")
    val bias = Seq(Tuple1(0.3)).toDF("bias")
    val p = graft.operators.Learn.logisticScore(
        docs.select(col("doc_id").as("id")), feat, w, bias)
      .queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    // a bucket-keyed exchange would mean the 4096-row model forced a
    // corpus-wide shuffle — the exact shape the broadcast exists to
    // prevent at 100 TB
    assert(!p.contains("Exchange hashpartitioning(b#"), p.take(800))
  }

  test("f17 nfc-normalize: native expression stays inside WholeStageCodegen") {
    val df = SparkEntry.queries("f17_nfc_normalize")(spark, dir)
    df.collect() // AQE finalizes codegen stages only at execution
    val p = df.queryExecution.executedPlan.toString
    // the Project evaluating graft's NfcNormalizeExpr must be fused
    // into a codegen stage (the "*(n) " operator prefix), not fall
    // back to interpreted eval
    val fusedLine = p.linesIterator.find(l =>
      l.contains("nfcnormalizeexpr") && l.contains("Project"))
    assert(fusedLine.exists(_.contains("*(")),
      s"Project with NfcNormalizeExpr not codegen-fused:\n${p.take(900)}")
  }

  test("j21 joinAuto: broadcast route plans BroadcastHashJoin; " +
       "forced-shuffle route plans a shuffle join; bloom route " +
       "prefilters the fact scan") {
    import org.apache.spark.sql.functions._
    val fact = spark.read.parquet(s"$dir/orders.parquet")
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    def planOf(bcast: Long, bloom: Long): String = {
      val (j, _) = graft.operators.Relational.joinAuto(fact, dim,
        "o_custkey", broadcastRows = bcast, bloomRows = bloom)
      j.queryExecution.sparkPlan.toString
    }
    val pb = planOf(1000000L, 1000000L)
    assert(pb.contains("BroadcastHashJoin"), pb.take(500))
    assert(!pb.contains("SortMergeJoin"), pb.take(500))
    // the shuffle routes would be hidden by the session broadcast
    // threshold at spec scale — disable it to see the routed shape
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val ps = planOf(0L, 0L)
      assert(ps.contains("SortMergeJoin") ||
        ps.contains("ShuffledHashJoin"), ps.take(500))
      val pf = planOf(0L, 1000000L)
      // the 100 TB property: the fact side carries the bloom
      // membership probe BELOW the join, so non-matching fact rows
      // die before the shuffle, not after the join
      val joinIdx = pf.indexOf("Join")
      assert(joinIdx >= 0, pf.take(300))
      assert(pf.substring(joinIdx).contains("might_contain"),
        pf.take(900))
    } finally spark.conf.set(key, prev)
  }

  test("x102 power iteration: v joins into the corpus by broadcast — " +
       "no dim-keyed exchange of the vector relation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("id"), (col("pos") + 1).as("d"),
        col("xf").cast("double").as("x"))
    val c = graft.operators.Learn.centeredMicro(emb)
    val v = (1 to 64).map(d => (d, 125000L)).toDF("d", "v")
    // one s-step as powerIterationMicro builds it
    val s = c.join(broadcast(v), Seq("d"))
      .groupBy(col("id"))
      .agg(floor(sum((col("xc") * col("v"))
        .cast("decimal(38,0)")).cast("double") / lit(1000000.0d))
        .as("s"))
    val p = s.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    // a d-keyed exchange would shuffle the WHOLE long-form corpus
    // (n×64 rows) to meet a 64-row relation — the shape the
    // broadcast exists to prevent at 100 TB
    assert(!p.contains("Exchange hashpartitioning(d#"), p.take(900))
  }

  test("x105 gram build: the n·D² pair fan-out combines map-side — " +
       "the exchange moves D²-row partials, not pair rows") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("id"), (col("pos") + 1).as("d"),
        col("xf").cast("double").as("x"))
    val c = graft.operators.Learn.centeredMicro(emb)
    // the gram aggregation as gramMicro builds it, pre-checkpoint
    val a = c.select(col("id"), col("d").as("d1"), col("xc").as("xc1"))
    val b = c.select(col("id"), col("d").as("d2"), col("xc").as("xc2"))
    val g = a.join(b, Seq("id"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum((col("xc1") * col("xc2")).cast("decimal(38,0)")).as("g"))
    val p = g.queryExecution.sparkPlan.toString
    // map-side combine of the in-task pair fan-out must be planned
    assert(p.contains("partial_sum"), p.take(900))
    // pair rows must never cross an exchange: any exchange (absent
    // entirely at spec scale, where the join broadcasts and the aggs
    // colocate) may only sit ABOVE the partial agg, so it moves
    // D²-row partials, not n·D² pair rows
    val partialIdx = p.indexOf("partial_sum")
    val below = p.substring(partialIdx)
    assert(!below.contains("Exchange hashpartitioning"), below.take(900))
  }

  test("x101 wordFreq: the corpus-scale pass plans a partial " +
       "(map-side) aggregation before its exchange") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.operators.Tokenize.wordFreq(docs, col("text"))
      .queryExecution.sparkPlan.toString
    // the 100 TB property: token rows combine into (word, count)
    // map-side, so the only corpus-grain exchange moves word TYPES
    assert(p.contains("partial_count"), p.take(900))
    assert(p.contains("HashAggregate"), p.take(900))
  }
}
