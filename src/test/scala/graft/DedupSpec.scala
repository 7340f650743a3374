package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends GraftSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "completely different text about spark query engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
  ).toDF("id", "text")

  test("keepFirst / keepLast are deterministic inverses") {
    val df = Seq((1, "a", 10), (1, "a", 20), (2, "b", 30)).toDF("k", "g", "v")
    val first = Dedup.keepFirst(df, Seq("k", "g"), Seq(col("v")))
      .select("v").as[Int].collect().sorted
    val last = Dedup.keepLast(df, Seq("k", "g"), Seq(col("v")))
      .select("v").as[Int].collect().sorted
    assert(first === Array(10, 30))
    assert(last === Array(20, 30))
  }

  test("exactByHash collapses exact duplicates to canonical min id") {
    val out = Dedup.exactByHash(docs, col("id"),
      graft.functions.ColFns.fingerprint(col("text")))
    val dup = out.filter(col("n_dups") === 2).collect()
    assert(dup.length === 1)
    assert(dup(0).getAs[Long]("canonical_id") === 1L)
    assert(out.count() === 3)
  }

  test("minhashPairs finds the near-dup pair and not the unrelated doc") {
    val pairs = Dedup.minhashPairs(docs, col("id"), col("text"), threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccardPairs exact scores: identical docs score 1.0") {
    val out = Dedup.ngramJaccardPairs(docs, col("id"), col("text"), 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 4).collect()
    assert(out.length === 1 && out(0).getAs[Double]("jaccard") === 1.0)
  }

  test("simhash: near-dups collide on some band, unrelated docs differ") {
    val bands = Dedup.simhashBands(docs, col("id"), col("text"))
    val byBand = bands.select("band", "band_key", "id")
      .as[(Int, Long, Long)].collect()
      .groupBy(t => (t._1, t._2)).values.map(_.map(_._3).toSet)
    assert(byBand.exists(s => s.contains(1L) && s.contains(2L)))
    // exact dup: all 4 bands equal
    val b1 = byBand.count(s => s.contains(1L) && s.contains(4L))
    assert(b1 === 4)
  }

  test("incremental CC equals full recompute when new edges merge components") {
    import spark.implicits._
    val oldPairs = Seq((2L, 5L), (3L, 7L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(oldPairs) // {2,5}->2, {3,7}->3
    // new edge 5-3 merges both; new node 9 attaches to 7; 1-8 is new
    val fresh = Seq((5L, 3L), (7L, 9L), (1L, 8L)).toDF("id_a", "id_b")
    val inc = Dedup.connectedComponentsIncremental(labels, fresh)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(oldPairs.unionByName(fresh))
      .as[(Long, Long)].collect().toMap
    assert(inc === full)
    assert(inc(9L) === 2L && inc(7L) === 2L && inc(8L) === 1L)
  }

  test("incremental CC keeps untouched singleton labels, merges touched ones") {
    import spark.implicits._
    // corpus labeling with singletons (42->42, 43->43) alongside a
    // cluster {2,5}; a new edge touches 43 but not 42
    val labels = Seq((2L, 2L), (5L, 2L), (42L, 42L), (43L, 43L))
      .toDF("id", "component")
    val fresh = Seq((43L, 5L)).toDF("id_a", "id_b")
    val inc = Dedup.connectedComponentsIncremental(labels, fresh)
      .as[(Long, Long)].collect().toMap
    assert(inc === Map(2L -> 2L, 5L -> 2L, 43L -> 2L, 42L -> 42L))
  }

  test("spanDuplication: shared w-word span covered, unique doc clean") {
    val df = Seq(
      (1L, "a b c d e f"),       // shares span "a b c d" with doc 2
      (2L, "z z a b c d q"),
      (3L, "p q r s t"),         // no repeated span
    ).toDF("id", "text")
    val out = Dedup.spanDuplication(df, col("id"), col("text"),
        w = 4, minDocs = 2)
      .select("id", "n_tokens", "n_dup_spans", "covered_tokens", "dup_frac")
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 6, 1L, 4L, 0.6667)))
    assert(out(1) === ((2L, 7, 1L, 4L, 0.5714)))
    assert(out(2) === ((3L, 5, 0L, 0L, 0.0)))
  }

  test("cosine similarity basics") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(round(Dedup.cosine(col("a"), col("b")), 6).as("c"))
    assert(df.as[Double].collect().toSeq === Seq(1.0, 0.0))
  }
}
