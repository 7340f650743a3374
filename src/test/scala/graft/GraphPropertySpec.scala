package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Mutations, Sampling}

/** Property-style randomized vectors (fixed seed, deterministic reruns)
  * for the operators whose contracts are algebraic identities:
  * incremental CC ≡ full recompute under ANY edge split, snapshotDiff
  * is empty on identical inputs and total on disjoint ones, and
  * threeWaySplit partitions every row into exactly one split. */
class GraphPropertySpec extends GraftSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  test("incremental CC == full CC over random graphs and random splits") {
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val nEdges = 20 + rnd.nextInt(60)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a)
      }.filter(e => e._1 != e._2).distinct
      val (oldE, newE) = edges.partition(_ => rnd.nextBoolean())
      if (oldE.nonEmpty && newE.nonEmpty) {
        val oldDf = oldE.toDF("id_a", "id_b")
        val newDf = newE.toDF("id_a", "id_b")
        val full = Dedup.connectedComponents(oldDf.unionByName(newDf))
          .as[(Long, Long)].collect().toMap
        val inc = Dedup.connectedComponentsIncremental(
          Dedup.connectedComponents(oldDf), newDf)
          .as[(Long, Long)].collect().toMap
        assert(inc === full, s"trial $trial: $oldE ++ $newE")
      }
    }
  }

  test("large-star/small-star CC == min-label CC over random graphs") {
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val nEdges = 20 + rnd.nextInt(60)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a)
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("id_a", "id_b")
        val minLabel = Dedup.connectedComponents(df)
          .as[(Long, Long)].collect().toMap
        val star = Dedup.connectedComponentsStar(df)
          .as[(Long, Long)].collect().toMap
        assert(star === minLabel, s"trial $trial: $edges")
      }
    }
  }

  test("star CC converges on the adversarial chain min-label is slow on") {
    // a 200-node path has diameter 199: min-label would need ~200
    // rounds (its default guard throws); star CC contracts it in
    // O(log^2 n) rounds within the default guard
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect()
    assert(labels.length === 200)
    assert(labels.forall(_._2 === 0L))
  }

  test("snapshotDiff: empty on identical, total on disjoint key sets") {
    val df = (1L to 50L).map(k => (k, s"v$k", k * 2)).toDF("k", "s", "v")
    assert(Mutations.snapshotDiff(df, df, Seq("k")).count() === 0L)
    val other = (51L to 80L).map(k => (k, s"v$k", k * 2)).toDF("k", "s", "v")
    val d = Mutations.snapshotDiff(df, other, Seq("k"))
      .groupBy("change").count().as[(String, Long)].collect().toMap
    assert(d === Map("deleted" -> 50L, "inserted" -> 30L))
  }

  test("fixedKPerStratum: exactly k per stratum, deterministic draw") {
    val df = (1L to 300L).map(k => (s"s${k % 3}", k)).toDF("src", "k")
    val a = Sampling.fixedKPerStratum(df, col("src"), col("k"), 7)
    val counts = a.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts === Map("s0" -> 7L, "s1" -> 7L, "s2" -> 7L))
    val b = Sampling.fixedKPerStratum(
      df.repartition(13), col("src"), col("k"), 7)
    assert(a.select("src", "k").as[(String, Long)].collect().toSet ===
      b.select("src", "k").as[(String, Long)].collect().toSet)
  }

  test("threeWaySplit: every row lands in exactly one split") {
    val df = (1L to 500L).toDF("k")
    val out = Sampling.threeWaySplit(df, col("k"))
    assert(out.count() === 500L)
    assert(out.filter(!col("split").isin("train", "val", "test"))
      .count() === 0L)
    // fractions roughly honored (md5-uniform: generous bounds)
    val tr = out.filter(col("split") === "train").count()
    assert(tr > 350 && tr < 450, s"train=$tr of 500")
  }

  test("labelPropagation: total assignment, community ⊆ component") {
    import graft.operators.Graph
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(30)
      val edges = Seq.fill(15 + rnd.nextInt(40)) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val com = Graph.labelPropagation(df, iters = 4)
          .as[(Long, Long)].collect().toMap
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // every node gets exactly one community label
        assert(com.keySet === nodes.toSet, s"trial $trial")
        // communities never span connected components: two nodes with
        // the same label must share a CC label (propagation can only
        // carry labels along edges)
        val cc = Dedup.connectedComponents(df.select(
            col("src").as("id_a"), col("dst").as("id_b")))
          .as[(Long, Long)].collect().toMap
        com.groupBy(_._2).values.foreach { members =>
          val comps = members.keySet.map(cc)
          assert(comps.size === 1,
            s"trial $trial: community spans components $comps")
        }
      }
    }
  }
}
