package graft

import org.apache.spark.sql.functions._
import graft.operators.{GeoJoin, Mutations, TextOps}

class Round5Spec extends GraftSuite {

  private val dir = SparkTestBase.sfDir

  test("j16b grid geo join equals j16 brute on sf0.001") {
    val brute = SparkEntry.queries("j16_geo_nearest")(spark, dir)
    val grid = SparkEntry.queries("j16b_geo_nearest_grid")(spark, dir)
    assert(grid.count() === brute.count())
    assert(grid.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(grid).count() === 0L)
  }

  test("GeoJoin: brute fallback keeps a sparse grid exact") {
    import spark.implicits._
    // cells of 0.1° but the only right point is ~3° away from most
    // left points — every miss must still resolve to the true nearest
    val left = Seq((1L, 22.0, 120.0), (2L, 24.9, 121.9), (3L, 23.5, 121.0))
      .toDF("id", "lat", "lng")
    val right = Seq((10L, 23.5, 121.05), (20L, 40.0, 100.0))
      .toDF("id", "lat", "lng")
    val got = GeoJoin.nearest(left, "id", "lat", "lng",
        right, "id", "lat", "lng", cellDeg = 0.1, maxAbsLatDeg = 41.0)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("GeoJoin: tie on distance breaks to the smaller right id") {
    import spark.implicits._
    val left = Seq((1L, 23.0, 121.0)).toDF("id", "lat", "lng")
    // two right points symmetric in longitude → identical distance
    val right = Seq((7L, 23.0, 121.2), (5L, 23.0, 120.8))
      .toDF("id", "lat", "lng")
    val got = GeoJoin.nearest(left, "id", "lat", "lng",
        right, "id", "lat", "lng", cellDeg = 0.5, maxAbsLatDeg = 24.0)
      .head()
    assert(got.getLong(1) === 5L)
  }

  test("snapshotDiff: separator-like payload values do not collide") {
    import spark.implicits._
    // regression (ADVICE r3): the old \u0001-concat hash classified a
    // payload containing the separator, or a literal "\u0000" string
    // vs an actual NULL, as unchanged
    val before = Seq((1L, "a\u0001b", "c"), (2L, "\u0000", "x"))
      .toDF("k", "p1", "p2")
    val after = Seq((1L, "a", "b\u0001c"), (2L, null: String, "x"))
      .toDF("k", "p1", "p2")
    val got = Mutations.snapshotDiff(before, after, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "updated"), (2L, "updated")))
  }

  test("snapshotDiff: unchanged rows still drop out") {
    import spark.implicits._
    val before = Seq((1L, "a", 1.5), (2L, null: String, 2.5))
      .toDF("k", "p1", "p2")
    val got = Mutations.snapshotDiff(before, before, Seq("k"))
    assert(got.count() === 0L)
  }

  test("admitIncremental: shuffle-join fallback admits identically to broadcast") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different corpus text about spark engines"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact corpus dup
      (11L, "a genuinely novel document about distributed joins"),
      (12L, "a genuinely novel document about distributed joins")) // exact batch dup of 11
      .toDF("doc_id", "text")
    def statuses(maxRows: Long) =
      Dedup.admitIncremental(corpus, batch, col("doc_id"), col("text"),
          broadcastMaxBandRows = maxRows)
        .as[(Long, String)].collect().toMap
    val broadcastPath = statuses(Long.MaxValue)
    val shufflePath = statuses(0L) // forces the fallback
    assert(broadcastPath === shufflePath)
    assert(broadcastPath(10L) === "dup_exact_corpus")
    assert(broadcastPath(11L) === "admitted")
    assert(broadcastPath(12L) === "dup_exact_batch")
  }

  test("bpeMerges: returns early when all pairs are exhausted") {
    import spark.implicits._
    // single-character words have no adjacent pairs after round 1
    val df = Seq("ab ab ab").toDF("text")
    val got = TextOps.bpeMerges(df, col("text"), rounds = 5).collect()
    assert(got.length === 1) // (a,b) merges once; then no pairs remain
    assert(got.head.getString(1) === "a" && got.head.getString(2) === "b")
  }

  test("bpeMerges: zero pairs from the start returns an empty table") {
    import spark.implicits._
    val df = Seq("a b c").toDF("text")
    val got = TextOps.bpeMerges(df, col("text"), rounds = 3)
    assert(got.count() === 0L)
  }

  test("r1 pre-melt range sort still yields globally ordered output") {
    // the ordered-melt rewrite (sort base → unpivot → partition-local
    // sort) must equal orderBy-after-melt: range partitions are
    // disjoint on the id prefix and unpivot never moves rows across
    // partitions
    val rows = SparkEntry.queries("r1_unpivot_melt")(spark, dir)
      .select("l_orderkey", "l_linenumber", "measure").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.nonEmpty)
    assert(rows.toSeq === rows.toSeq.sorted,
      "output not globally ordered")
  }

  test("Multimodal.decode: real PNG payloads yield true dimensions") {
    import spark.implicits._
    // a real 123×45 PNG encoded with the same JDK codec stack a
    // production blob would have passed through
    val img = new java.awt.image.BufferedImage(123, 45,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(10, 10, 0xff00ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(png.take(4).toSeq === Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val media = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("image").as("kind"), col("payload"))
    val out = graft.operators.Multimodal.decode(spark, media)
      .collect().sortBy(_.media_id)
    assert(out(0).width === 123 && out(0).height === 45)
    assert(out(0).n_bytes === png.length)
    // non-image payloads keep the md5-derived fallback dims
    assert(out(1).width >= 1 && out(1).width <= 640)
    assert(out(1).feature.length === 8)
  }

  test("x52 semantic dedup: one kept representative per component") {
    val got = SparkEntry.queries("x52_semantic_dedup")(spark, dir)
    val nVec = spark.read
      .parquet(s"$dir/embeddings.parquet").count()
    assert(got.count() === nVec, "one decision row per vector")
    // per component: label = min member id, exactly one keep, and the
    // kept row is the label-bearer
    val comps = got.groupBy(col("component"))
      .agg(min(col("vec_id")).as("mn"), sum(col("keep")).as("n_keep"))
      .collect()
    assert(comps.forall(r => r.getLong(1) == r.getLong(0)),
      "component label must be its min member id")
    assert(comps.forall(r => r.getLong(2) == 1L),
      "exactly one kept representative per component")
    // near-dup members are dropped: every keep=0 row shares its
    // component with a smaller kept id
    assert(got.filter(col("keep") === 0)
      .filter(col("vec_id") <= col("component")).count() === 0L)
  }

  test("oovRate: top-k vocab via TakeOrderedAndProject stays correct") {
    import spark.implicits._
    val df = Seq((1L, "the the the cat"), (2L, "zz qq"))
      .toDF("id", "text")
    // vocabSize=1 → vocab = {the}; doc 1 oov 1/4, doc 2 oov 2/2
    val got = TextOps.oovRate(df, col("id"), col("text"), vocabSize = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("oov_rate"))).toSeq
    assert(got === Seq((1L, 0.25), (2L, 1.0)))
    // and the plan is a take-ordered, not a single-partition window
    val vocabPlan = TextOps.oovRate(df, col("id"), col("text"))
      .queryExecution.sparkPlan.toString
    assert(vocabPlan.contains("TakeOrderedAndProject"))
  }
}
