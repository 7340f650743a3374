package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchFns

/** Round-10 additions: theta set-operation sketches + KLL quantile
  * ledger state (SketchExprs).
  */
class Round10Spec extends GraftSuite {

  test("theta agg: partition-invariant, exact-mode estimates, set ops") {
    import spark.implicits._
    // 0..999 keys, in two deliberately different partitionings — the
    // mergeable-state contract is that buffer merges are associative
    // and commutative, so the sketch bytes' ESTIMATES must agree
    val a = (0L until 1000L).toDF("k").repartition(1)
    val b = (0L until 1000L).toDF("k").repartition(8)
    val ea = a.agg(SketchFns.thetaEstimate(
      SketchFns.thetaAgg(col("k"))).as("e")).first().getDouble(0)
    val eb = b.agg(SketchFns.thetaEstimate(
      SketchFns.thetaAgg(col("k"))).as("e")).first().getDouble(0)
    assert(ea === 1000.0d && eb === 1000.0d,
      s"exact-mode theta must be exact: $ea / $eb")

    // set algebra vs known truth: A = 0..999, B = 500..1499
    val bdf = (500L until 1500L).toDF("k")
    val skA = a.agg(SketchFns.thetaAgg(col("k")).as("s"))
      .withColumnRenamed("s", "sa")
    val skB = bdf.agg(SketchFns.thetaAgg(col("k")).as("s"))
      .withColumnRenamed("s", "sb")
    val r = skA.crossJoin(skB).select(
      SketchFns.thetaIntersectEstimate(col("sa"), col("sb")).as("i"),
      SketchFns.thetaAnotBEstimate(col("sa"), col("sb")).as("d")).first()
    assert(r.getDouble(0) === 500.0d, s"|A∩B| = ${r.getDouble(0)}")
    assert(r.getDouble(1) === 500.0d, s"|A\\B| = ${r.getDouble(1)}")
  }

  test("theta union agg: per-slice sketches roll up to the direct sketch") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i % 7, i)).toDF("slice", "k")
    val direct = df.agg(SketchFns.thetaEstimate(
      SketchFns.thetaAgg(col("k"))).as("e")).first().getDouble(0)
    val rolled = df.groupBy(col("slice"))
      .agg(SketchFns.thetaAgg(col("k")).as("sk"))
      .agg(SketchFns.thetaEstimate(
        SketchFns.thetaUnionAgg(col("sk"))).as("e")).first().getDouble(0)
    assert(direct === rolled,
      s"ledger rollup must equal direct agg: $direct vs $rolled")
  }

  test("theta estimation mode: error within published bounds at 100k keys") {
    import spark.implicits._
    // beyond nominal entries (lgk=12 → 4096) the sketch estimates;
    // RSE ≈ 1/sqrt(k) ≈ 1.6%, so 5% is ≈3σ — the margin the x74/x75
    // tolerance contracts rely on
    val n = 100000L
    val est = (0L until n).toDF("k").repartition(8)
      .agg(SketchFns.thetaEstimate(
        SketchFns.thetaAgg(col("k"), 12)).as("e")).first().getDouble(0)
    assert(math.abs(est - n) / n <= 0.05, s"theta est $est vs $n")
  }

  test("theta bounds: lb <= est <= ub; exact mode collapses the interval") {
    import spark.implicits._
    // exact mode: interval collapses to the (exact) estimate
    val small = (0L until 500L).toDF("k")
      .agg(SketchFns.thetaAgg(col("k")).as("sk"))
      .select(SketchFns.thetaLowerBound(col("sk")).as("lb"),
        SketchFns.thetaEstimate(col("sk")).as("est"),
        SketchFns.thetaUpperBound(col("sk")).as("ub")).first()
    assert(small.getDouble(0) === 500.0d && small.getDouble(1) === 500.0d &&
      small.getDouble(2) === 500.0d)
    // estimation mode: strict interval containing the truth at 2σ
    val big = (0L until 100000L).toDF("k").repartition(8)
      .agg(SketchFns.thetaAgg(col("k"), 12).as("sk"))
      .select(SketchFns.thetaLowerBound(col("sk")).as("lb"),
        SketchFns.thetaEstimate(col("sk")).as("est"),
        SketchFns.thetaUpperBound(col("sk")).as("ub")).first()
    assert(big.getDouble(0) < big.getDouble(1) &&
      big.getDouble(1) < big.getDouble(2))
    assert(big.getDouble(0) <= 100000.0d && 100000.0d <= big.getDouble(2))
  }

  test("kll: rank/quantile duality and slice-merge vs direct") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i % 13, i.toDouble)).toDF("slice", "v")
    // direct sketch: median of 1..10000 must land within 2% rank
    val sk = df.agg(SketchFns.kllAgg(col("v"), 400).as("sk"))
    val med = sk.select(SketchFns.kllQuantile(col("sk"), lit(0.5d)))
      .first().getDouble(0)
    assert(math.abs(med - 5000.0d) <= 200.0d, s"median est $med")
    // rank duality: rank(quantile(q)) ≈ q
    val rk = sk.select(SketchFns.kllRank(col("sk"), lit(med)))
      .first().getDouble(0)
    assert(math.abs(rk - 0.5d) <= 0.02d, s"rank(median) = $rk")
    // ledger path: per-slice sketches merged ≈ direct (same bound)
    val merged = df.groupBy(col("slice"))
      .agg(SketchFns.kllAgg(col("v"), 400).as("sk"))
      .agg(SketchFns.kllMergeAgg(col("sk")).as("sk"))
    val med2 = merged.select(SketchFns.kllQuantile(col("sk"), lit(0.5d)))
      .first().getDouble(0)
    assert(math.abs(med2 - 5000.0d) <= 200.0d, s"merged median est $med2")
  }

  test("topk agg: equals the window formulation, survives spill fallback") {
    import spark.implicits._
    import graft.functions.TopKAgg
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 5000).map(i => (i % 97, (i * 37 % 1001).toDouble, i.toLong))
      .toDF("grp", "score", "id").repartition(8)
    def viaAgg() = df.groupBy(col("grp"))
      .agg(TopKAgg.topK(struct(col("score"), -col("id"), col("id")), 5)
        .as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("grp"), col("i"), col("r.id"), col("r.score"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("grp"), (col("rn") - 1).cast("int").as("i"),
        col("id"), col("score"))
    assert(viaAgg().except(viaWindow).isEmpty &&
      viaWindow.except(viaAgg()).isEmpty)
    // force the sort-based fallback so the serialize/deserialize spill
    // path actually executes (buffers cross the boundary as bytes)
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "2")
    try assert(viaAgg().except(viaWindow).isEmpty &&
      viaWindow.except(viaAgg()).isEmpty)
    finally spark.conf.set(key, prev)
  }

  test("topk agg: SQL surface + partial aggregation in the plan") {
    graft.plans.GraftExtensions.registerAll(spark)
    import spark.implicits._
    (1 to 100).map(i => (i % 3, i)).toDF("g", "v")
      .createOrReplaceTempView("tk_t")
    val rows = spark.sql(
      """SELECT g, graft_topk_agg(v, 2) AS top FROM tk_t
        GROUP BY g ORDER BY g""").collect()
    assert(rows.length === 3)
    assert(rows(0).getSeq[Int](1) === Seq(99, 96))
    val p = spark.sql("SELECT g, graft_topk_agg(v, 2) FROM tk_t GROUP BY g")
      .queryExecution.sparkPlan.toString
    assert(p.contains("partial_graft_topk_agg"), p.take(600))
  }

  test("ivf incremental: batch-wise assign equals full rebuild exactly") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = Tables.load(spark, SparkTestBase.sfDir, "embeddings")
    val historic = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val cents = Similarity.ivfTrain(historic, "vec_id", "embedding",
      nlist = 8).localCheckpoint(true)
    // assignment is a per-row pure function of (vector, centroids), so
    // admitting a batch incrementally must equal rebuilding from
    // scratch — not approximately: row-for-row
    val incremental = Similarity
      .ivfAssign(historic, "vec_id", "embedding", cents)
      .unionByName(Similarity.ivfAssign(batch, "vec_id", "embedding", cents))
      .select(col("neighbor_id"), col("cell"))
    val rebuilt = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .select(col("neighbor_id"), col("cell"))
    assert(incremental.except(rebuilt).isEmpty &&
      rebuilt.except(incremental).isEmpty)
    // and the searched top-k over the accreted index matches too
    val q = emb.filter(col("vec_id") < 5)
    val a = Similarity.ivfSearchAssigned(q, "vec_id", "embedding",
      Similarity.ivfAssign(emb, "vec_id", "embedding", cents), cents,
      k = 3, nprobe = 2)
    val b = Similarity.ivfSearchAssigned(q, "vec_id", "embedding",
      Similarity.ivfAssign(historic, "vec_id", "embedding", cents)
        .unionByName(Similarity.ivfAssign(batch, "vec_id", "embedding",
          cents)), cents, k = 3, nprobe = 2)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("jaro-winkler: textbook values, edge cases, SQL surface") {
    import graft.functions.JaroWinklerExpr
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String): Double =
      JaroWinklerExpr.compute(u(a), u(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111d) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84d) < 1e-15)
    assert(jw("abc", "abc") === 1.0d)
    assert(jw("", "") === 0.0d)      // DuckDB's convention, pinned
    assert(jw("a", "") === 0.0d)
    assert(jw("abc", "bca") === 0.0d) // window 0 → no matches
    // boost only above the 0.7 jaro threshold
    assert(math.abs(jw("abcdefgh", "abcxxxxx") - 0.5833333333333334d) < 1e-15)
    graft.plans.GraftExtensions.registerAll(spark)
    val got = spark.sql("SELECT graft_jaro_winkler('martha','marhta') AS s")
      .first().getDouble(0)
    assert(math.abs(got - 0.9611111111111111d) < 1e-15)
  }

  test("st15 ledger: 3-micro-batch delivery equals single-batch (invariance)") {
    // the batching-invariance claim tested on the REAL multi-batch
    // path (maxFilesPerTrigger=1 over 3 staged files), not just by
    // sketch-algebra argument
    val one = graft.streaming.Streams
      .streamKllLedger(spark, SparkTestBase.sfDir).orderBy("q").collect()
    val three = graft.streaming.Streams
      .streamKllLedger(spark, SparkTestBase.sfDir, splitFiles = 3)
      .orderBy("q").collect()
    assert(one.map(_.toString).toSeq === three.map(_.toString).toSeq)
    assert(three.forall(_.getBoolean(2)), three.mkString(";"))
  }

  test("jaro-winkler properties: symmetric, bounded, reflexive (seeded bulk)") {
    import graft.functions.JaroWinklerExpr
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val rnd = new scala.util.Random(42)
    val al = "abcdef gh"
    def rs(): String =
      (0 until rnd.nextInt(15)).map(_ => al(rnd.nextInt(al.length))).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (rs(), rs())
      val ab = JaroWinklerExpr.compute(u(a), u(b))
      val ba = JaroWinklerExpr.compute(u(b), u(a))
      assert(ab === ba, s"asymmetric on <$a>/<$b>: $ab vs $ba")
      assert(ab >= 0.0d && ab <= 1.0d, s"out of range on <$a>/<$b>: $ab")
      if (a.nonEmpty)
        assert(JaroWinklerExpr.compute(u(a), u(a)) === 1.0d)
    }
  }

  test("topk agg property: equals sort-take over seeded random groups") {
    import spark.implicits._
    import graft.functions.TopKAgg
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3000).map(_ =>
      (rnd.nextInt(40), rnd.nextInt(500).toLong, rnd.nextLong()))
    val df = rows.toDF("g", "v", "id").repartition(16)
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct(col("v"), col("id")), 4).as("top"))
      .select(col("g"), col("top")).collect()
      .map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getLong(0), x.getLong(1))))
      .toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(t => (t._2, t._3)).sorted(
        Ordering.Tuple2[Long, Long].reverse).take(4)
    }
    assert(got.keySet === want.keySet)
    want.foreach { case (g, exp) =>
      assert(got(g) === exp, s"group $g: ${got(g)} vs $exp")
    }
  }

  test("approx-distinct rule: dormant off, fires on, scoped to 1-col counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct}
    graft.plans.ApproxDistinctRule.install(spark)
    val key = graft.plans.ApproxDistinctRule.flagKey
    val df = (1 to 1000).map(i => (i % 37, i % 5)).toDF("a", "b")
    def planOf(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.executedPlan.toString
    // default: exact, no rewrite
    val exactQ = df.agg(countDistinct(col("a")).as("d"))
    assert(!planOf(exactQ).contains("graft_theta_agg"))
    assert(exactQ.first().getLong(0) === 37L)
    spark.conf.set(key, "true")
    try {
      val approxQ = df.agg(countDistinct(col("a")).as("d"))
      assert(planOf(approxQ).contains("graft_theta_agg"),
        planOf(approxQ).take(500))
      // exact-mode sketch at this cardinality: same answer, new plan
      assert(approxQ.first().getLong(0) === 37L)
      // multi-column distinct is out of scope — stays exact
      val multi = df.agg(countDistinct(col("a"), col("b")).as("d"))
      assert(!planOf(multi).contains("graft_theta_agg"))
      // grouped form rewrites too
      val grouped = df.groupBy(col("b"))
        .agg(countDistinct(col("a")).as("d"))
      assert(planOf(grouped).contains("graft_theta_agg"))
      assert(grouped.orderBy(col("b")).collect().forall(_.getLong(1) > 0))
    } finally spark.conf.set(key, "false")
  }

  test("sketch SQL surface: graft_theta_* / graft_kll_* registered") {
    graft.plans.GraftExtensions.registerAll(spark)
    import spark.implicits._
    (0L until 100L).toDF("k").createOrReplaceTempView("sk_t")
    val row = spark.sql(
      """SELECT graft_theta_estimate(graft_theta_agg(k)) AS d,
               graft_kll_quantile(graft_kll_agg(CAST(k AS DOUBLE)), 0.5d)
                 AS m
        FROM sk_t""").first()
    assert(row.getDouble(0) === 100.0d)
    assert(row.getDouble(1) >= 49.0d && row.getDouble(1) <= 51.0d)
    // string keys hash identically whether they arrive as UTF8String
    // bytes (column path) or java String (DataSketches update(String))
    val s1 = spark.sql(
      "SELECT graft_theta_estimate(graft_theta_agg(CAST(k AS STRING))) " +
        "FROM sk_t").first().getDouble(0)
    assert(s1 === 100.0d)
  }
}
