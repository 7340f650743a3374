package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph operators over edge-list DataFrames. Companion to
  * [[Dedup.connectedComponents]] (min-label propagation): the same
  * loop-of-joins shape, with `localCheckpoint` truncating the plan each
  * round so 5 or 50 iterations cost the same per-round work instead of
  * an exponentially growing lineage.
  */
object Graph {

  /** Triangle count over an undirected edge list: edges normalize to
    * `a < b`, and each triangle counts once as the ordered wedge
    * `(a,b)+(b,c)` closed by `(a,c)` — two equi-joins and a count, no
    * explicit enumeration structure. At scale the classic refinement is
    * orienting edges from low- to high-degree endpoints before the
    * wedge join (caps the join's fan-out at hub nodes); the join shape
    * is unchanged. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007, made deterministic): labels start as the node id; each
    * round every node adopts the MODE of its neighbors' labels, ties
    * broken by ascending label, isolated nodes keep their own. Fixed
    * `iters` synchronous rounds — no convergence test, no randomness —
    * so the result is a pure function of the edge list and any engine
    * replays it exactly.
    *
    * Per round: one labels×edges hash join, one (node, label)-grain
    * aggregation, one per-node top-1 window over ALREADY-REDUCED label
    * counts (bounded by distinct neighbor labels, not degree), and a
    * left join back to carry isolated nodes. `localCheckpoint` truncates
    * lineage per round (the [[pagerankMicro]] discipline). Undirected:
    * the edge list is symmetrized internally. */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("cnt").desc, col("label").asc)
      val maj = sym
        .join(labels, sym("src") === labels("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("dst").as("node"), col("label").as("new_label"))
      labels = labels.join(maj, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint()
    }
    labels.select(col("node"), col("label").as("community"))
  }

  /** Item co-occurrence graph from (user, item) interactions — the
    * collaborative-filtering / item-embedding prep pass: for every
    * item pair sharing a user, the co-user count and the Jaccard over
    * user sets. Pairs materialize through a per-user self-join, which
    * is quadratic in a USER'S distinct-item count, not in the corpus:
    * the `maxUserItems` cap drops power users above it BEFORE the
    * join (their pairs are both the entire cost and the weakest
    * signal — standard SAR/recsys practice). After the cap, the pair
    * aggregation is the one data-scaling shuffle; `minSupport` prunes
    * the pair tail before the per-item stats broadcast back in. */
  def cooccurrence(interactions: DataFrame, user: Column, item: Column,
                   maxUserItems: Int = 1000,
                   minSupport: Long = 2L): DataFrame = {
    val posts = interactions.select(user.as("u"), item.as("i")).distinct()
    val kept = posts.join(
      posts.groupBy(col("u")).agg(count(lit(1)).as("k"))
        .filter(col("k") <= maxUserItems).select("u"), Seq("u"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.u") === col("b.u") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("item_a"), col("b.i").as("item_b"))
      .agg(count(lit(1)).as("co_users"))
      .filter(col("co_users") >= minSupport)
    val itemUsers = kept.groupBy(col("i")).agg(count(lit(1)).as("n_users"))
    pairs
      .join(broadcast(itemUsers.select(col("i").as("item_a"),
        col("n_users").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemUsers.select(col("i").as("item_b"),
        col("n_users").as("n_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("co_users"),
        round(col("co_users").cast("double") /
          (col("n_a") + col("n_b") - col("co_users")), 4).as("jaccard"))
  }

  /** Fixed-iteration PageRank in integer micro-units.
    *
    * Ranks live as longs in units of 1/`base` (default 1e-12), and every
    * step — the per-edge contribution `rank div outdeg`, the damping
    * `85·x div 100`, the dangling-mass redistribution `mass div n` — is
    * integral division, so the result is bit-identical on any engine and
    * any summation order (long addition is exact and commutative; the
    * dropped remainders are part of the spec, not error). Total mass
    * decays a few micro-units per round, which a ranking consumer never
    * observes.
    *
    * Plan shape per iteration: one equi-join of degree-annotated edges ×
    * current ranks on `src` (ranks ≤ nodes ≪ edges; broadcastable), one
    * `dst`-grain aggregation — the only data-scaling shuffle — plus a
    * tiny semi-join aggregate against the precomputed dangling-node set
    * for the redistributed mass. The degree join and the dangling set
    * are loop-invariant and hoisted. `localCheckpoint` after each round
    * keeps the plan flat (the Dedup.connectedComponents OOM lesson,
    * commit dbebd13).
    *
    * Expects `edges(src: long, dst: long)`; duplicates are collapsed
    * (simple-graph semantics, matching how a link graph is built).
    */
  def pagerankMicro(edges: DataFrame, iters: Int = 5,
                    base: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    // outdeg is loop-invariant, so attach it to the edges ONCE — each
    // iteration then joins only (edges+outdeg) × ranks instead of
    // re-running the degree join every round
    val eDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .join(e, Seq("src")).localCheckpoint()
    // the dangling-node set (no out-edges) is likewise invariant
    val dangling = nodes.join(eDeg.select(col("src").as("node")),
        Seq("node"), "left_anti").localCheckpoint()
    val nN = nodes.count()
    val teleport = (base * 15L / 100L) / nN
    var ranks = nodes.select(col("node"), lit(base / nN).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("in_contrib"))
      // dangling nodes spread their mass to everyone — carried as a
      // 1-row frame cross-joined into the update, so each iteration is
      // ONE job (the localCheckpoint), not an extra driver-side action
      val dangShare = ranks
        .join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dang"))
        .select(expr(s"dang div ${nN}L").as("dang_share"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(dangShare)
        .select(col("node"),
          (lit(teleport) +
            expr("(85 * (coalesce(in_contrib, 0L) + dang_share)) div 100"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
