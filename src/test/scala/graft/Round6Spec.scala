package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-6 additions: product quantization (x53/x53b) and
  * Johnson–Lindenstrauss random projection (x54). */
class Round6Spec extends GraftSuite {
  import spark.implicits._

  test("Similarity.pqTopK with ksub = |corpus| equals exact L2 brute force") {
    val emb = Tables.load(spark, SparkTestBase.sfDir, "embeddings")
      .filter($"vec_id" < 80)
    val q = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteTopKL2(q, emb, "vec_id", "embedding", 3)
    val pq = Similarity.pqTopK(q, emb, "vec_id", "embedding", 3,
      m = 8, ksub = 80, trainIters = 0)
    assert(pq.count() === brute.count())
    assert(pq.exceptAll(brute).count() === 0)
  }

  test("Similarity.pqTopK rerank = |corpus| is exact for ANY codebook") {
    // the shortlist covers the whole corpus, so the exact re-score must
    // recover brute force even from a deliberately tiny codebook —
    // pins the rerank stage independent of training quality
    val emb = Tables.load(spark, SparkTestBase.sfDir, "embeddings")
      .filter($"vec_id" < 60)
    val q = emb.filter($"vec_id" < 4)
    val brute = Similarity.bruteTopKL2(q, emb, "vec_id", "embedding", 3)
    val pq = Similarity.pqTopK(q, emb, "vec_id", "embedding", 3,
      m = 4, ksub = 2, trainIters = 0, rerank = 60)
    assert(pq.exceptAll(brute).count() === 0)
  }

  test("Similarity.pqTopK handles D not divisible by m (subspace bounds)") {
    // 10-d vectors, m=3 → subspaces of 3/3/4 dims; ksub=|corpus| makes
    // ADC exact, so agreement with brute force proves the integer
    // subvector bounds cover every dimension exactly once
    val rows = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(10)(d => ((i * 7 + d * 3) % 11).toFloat / 11f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 3)
    val brute = Similarity.bruteTopKL2(q, df, "vec_id", "embedding", 4)
    val pq = Similarity.pqTopK(q, df, "vec_id", "embedding", 4,
      m = 3, ksub = 12, trainIters = 0)
    assert(pq.exceptAll(brute).count() === 0)
  }

  test("Similarity.pqTopK Lloyd-trained codebook still exact when ksub = n") {
    // one training iteration with every subvector its own seed is a
    // fixed point (each cell's mean is itself) — exactness must survive
    val emb = Tables.load(spark, SparkTestBase.sfDir, "embeddings")
      .filter($"vec_id" < 40)
    val q = emb.filter($"vec_id" < 3)
    val brute = Similarity.bruteTopKL2(q, emb, "vec_id", "embedding", 3)
    val pq = Similarity.pqTopK(q, emb, "vec_id", "embedding", 3,
      m = 8, ksub = 40, trainIters = 1)
    assert(pq.exceptAll(brute).count() === 0)
  }

  test("Similarity.randomProject is deterministic with correct arity") {
    val emb = Tables.load(spark, SparkTestBase.sfDir, "embeddings")
      .filter($"vec_id" < 20)
    val p1 = emb.select($"vec_id",
      Similarity.randomProject($"embedding", 16).as("pv"))
    assert(p1.filter(size($"pv") =!= 16).count() === 0)
    val p2 = emb.select($"vec_id",
      Similarity.randomProject($"embedding", 16).as("pv"))
    assert(p1.exceptAll(p2).count() === 0)
  }

  test("TextOps.bm25Search ranks higher-tf shorter docs first") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "spark spark spark hash"),          // tf(spark)=3, short
      (2L, "spark is a tool " * 10 + "spark"), // tf(spark)=11 but long
      (3L, "hash only here"),
      (4L, "nothing relevant at all")).toDF("doc_id", "text")
    val out = TextOps.bm25Search(docs, $"doc_id", $"text",
      Seq("spark", "hash"), k = 3).collect()
    assert(out.length === 3)                 // doc 4 matches nothing
    assert(out.map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    val top = out.head
    assert(top.getLong(0) === 1L)            // dense short doc wins
    assert(top.getLong(2) === 2L)            // matched both terms
  }

  test("Dedup.sortedNeighborhoodPairs finds adjacent near-dups only") {
    import graft.operators.Dedup
    val recs = Seq(
      (1L, "alpha centauri"), (2L, "alpha centauri"),  // exact dup
      (3L, "alpha centaurix"),                         // 1 edit from 2
      (4L, "beta orionis"),                            // other block
      (5L, "zeta reticuli")).toDF("id", "name")
    val pairs = Dedup.sortedNeighborhoodPairs(recs, $"id", $"name",
        w = 3, maxDist = 2)
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // within the 'a' block sort order is 1,2,3: pairs (1,2,0) (1,3,1)
    // (2,3,1); 'b'/'z' blocks are singletons → no cross-block pairs
    assert(pairs.toSeq === Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("randomProject preserves cosine within JL tolerance on real data") {
    import graft.functions.VectorExprs
    val emb = Tables.load(spark, SparkTestBase.sfDir, "embeddings")
    val proj = emb.select($"vec_id", $"embedding",
      Similarity.randomProject($"embedding", 32).as("pv"))
    val qp = proj.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qe"), $"pv".as("qp"))
    val avgErr = proj.join(broadcast(qp), $"qid" =!= $"vec_id")
      .select(abs(
        VectorExprs.dot($"qe", $"embedding") /
          (VectorExprs.norm($"qe") * VectorExprs.norm($"embedding")) -
        VectorExprs.dot($"qp", $"pv") /
          (VectorExprs.norm($"qp") * VectorExprs.norm($"pv"))).as("e"))
      .agg(avg($"e")).as[Double].head()
    assert(avgErr <= 0.25, s"JL avg cosine error $avgErr exceeds 0.25")
  }
}
