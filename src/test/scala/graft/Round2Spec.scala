package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.streaming.Streams

/** Specs for the round-2 additions: portable fingerprints, multi-table
  * LSH ANN, and the keyed-state streaming sessionizer. */
class Round2Spec extends GraftSuite {
  import spark.implicits._

  test("portableHash60 equals the documented md5-prefix formula") {
    val out = Seq("hello").toDF("s")
      .select(graft.functions.ColFns.portableHash60(col("s"))).head().getLong(0)
    // first 15 hex digits of md5('hello') = 5d41402abc4b2a7
    assert(out === java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("simhash60: exact dups share all 4 bands; bits confined to 60") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely unrelated text")).toDF("id", "text")
    val bands = Dedup.simhashBands60(docs, col("id"), col("text"))
    val fp = bands.select("id", "simhash").distinct()
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < (1L << 60)))
    // identical docs collide in all 4 bands
    val shared = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") === 1 && col("b.id") === 2)
    assert(shared.count() === 4)
  }

  test("native SimHash60Expr is bit-identical to the composed form") {
    val docs = Tables.load(spark, SparkTestBase.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val both = docs.select(
      Dedup.simhash60(col("text")).as("native"),
      Dedup.simhash60Composed(col("text")).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() === 0)
    // empty/whitespace text: all-votes-zero → all 60 bits set, both forms
    val empty = Seq("", "   ").toDF("text").select(
      Dedup.simhash60(col("text")).as("n"),
      Dedup.simhash60Composed(col("text")).as("c")).collect()
    assert(empty.forall(r => r.getLong(0) === r.getLong(1) &&
      r.getLong(0) === (1L << 60) - 1))
  }

  test("connectedComponents: chains, isolates-in-pairs, label minimality") {
    // two components: a 6-node chain (forces multiple propagation
    // rounds — diameter 5) and a disjoint pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(cc === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (6L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("multi-table LSH: recall rises with tables, exactness not claimed") {
    val emb = Tables.load(spark, SparkTestBase.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(planes: Int, tables: Int): Double = {
      val got = Similarity.lshTopK(q, emb, "vec_id", "embedding", 5,
          planes = planes, tables = tables)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    val r1 = recall(4, 1)
    val r8 = recall(4, 8)
    assert(r8 >= r1)     // OR-amplification helps
    assert(r8 >= 0.5, s"recall@5 with 8 tables was $r8")
  }

  test("Quality: pk/fk/not-null/check mirror the init.sql contract") {
    import graft.operators.Quality
    val dim = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val fact = Seq((Some(1L), "x"), (Some(2L), "y"), (Some(9L), "orphan"),
      (None, "nullkey")).toDF("dim_id", "payload")

    // PK: dup + null key both violate
    val pkBad = Seq(Some(1L), Some(1L), None).toDF("id")
    assert(Quality.pkViolations(pkBad, Seq("id")) === 2L)
    assert(Quality.pkViolations(dim, Seq("id")) === 0L)

    // FK: only the non-null unmatched row is an orphan
    val orphans = Quality.fkOrphans(fact, "dim_id", dim, "id").collect()
    assert(orphans.map(_.getAs[String]("payload")).toSeq === Seq("orphan"))

    // NOT NULL + fused report
    val rep = Quality.report(fact, Seq("dim_id", "payload")).head()
    assert(rep.getAs[Long]("n_rows") === 4L)
    assert(rep.getAs[Long]("nulls_dim_id") === 1L)
    assert(rep.getAs[Long]("nulls_payload") === 0L)

    // CHECK-style predicate (null predicate rows violate, like SQL
    // CHECK only passing on TRUE)
    val vals = Seq(Some(5.0), Some(-1.0), None).toDF("v")
    assert(Quality.checkViolations(vals, col("v") >= 0) === 2L)
  }

  test("tokenSortSimilarity: word-order invariant best match") {
    import graft.operators.FuzzyJoin
    val left = Seq((1L, "hot springs beitou")).toDF("id", "q")
    val right = Seq("beitou hot springs", "beitou market", "taipei zoo")
      .toDF("name")
    val plain = FuzzyJoin.bestMatch(left, "q", right, "name")
      .select("match_name", "match_score").head()
    val ts = FuzzyJoin.bestMatch(left, "q", right, "name",
        FuzzyJoin.tokenSortSimilarity)
      .select("match_name", "match_score").head()
    // token-sort finds the reordered name at a perfect score; plain
    // Levenshtein mis-ranks reordered words (that's WHY fuzzywuzzy
    // token-sorts first — and here it picks a wrong candidate outright)
    assert(ts.getString(0) === "beitou hot springs")
    assert(ts.getDouble(1) === 1.0)
    assert(plain.getDouble(1) < 1.0)
  }

  test("streamSessionize equals the batch lag+cumsum sessionization") {
    val stream = Streams.streamSessionize(spark, SparkTestBase.sfDir)
    val batch = SparkEntry.queries("t2_sessionize")(spark, SparkTestBase.sfDir)
    assert(stream.count() === batch.count())
    assert(stream.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(stream).count() === 0)
  }
}
