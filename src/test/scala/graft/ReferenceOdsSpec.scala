package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.{Gmaps, ReferenceOds}

/** Golden tests of the reference's concrete cleaning pipelines over
  * reference-shaped synthetic fixtures (FIXTURES.md §1-§6). Each
  * expectation is hand-computed from the reference's pandas/SQL
  * semantics — these specs are the behavioral contract a reference user
  * migrating to this library relies on.
  */
class ReferenceOdsSpec extends GraftSuite {

  private val fx = "src/test/resources/fixtures"

  private def readCsv(path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  // ---------------------------------------------------- tripadvisor 9-step

  test("tripadvisorInfo: the t2-t9 chain on the zh-headed fixture") {
    val raw = ReferenceOds.withRowIds(readCsv(s"$fx/src_tripadvisor.csv"))
    val out = ReferenceOds.tripadvisorInfo(raw)
      .orderBy("attraction_name").collect()

    // duplicate 台北塔樓 row (same name+raw rating) deduped keep-first;
    // 無評分 rating → coerce-null → dropped; "many" reviews → dropped;
    // all-null row → dropped; null categories → dropped
    assert(out.map(_.getAs[String]("attraction_name")).toSeq ===
      Seq("中央紀念堂", "台北塔樓"))
    val tower = out(1)
    assert(tower.getAs[Double]("rating") === 4.5)
    assert(tower.getAs[Long]("total_reviews") === 1200L)   // keep-first
    assert(tower.getAs[String]("categories") === "建築物,購物中心")
    // md5 surrogate key of the utf-8 name (reference common.py:8-19)
    assert(tower.getAs[String]("attraction_id") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("台北塔樓".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  // ------------------------------------------------ tripadvisor explode

  test("tripadvisorExplode: condensed variant ends in explode-by-type") {
    val raw = ReferenceOds.withRowIds(readCsv(s"$fx/src_tripadvisor.csv"))
    val out = ReferenceOds.tripadvisorExplode(raw, dropRids = Nil)
      .orderBy("name", "type").collect()
    // dropna(subset) keeps only rows with all five fields; dedup by name
    // keeps the 1200-review 台北塔樓; • split+trim explodes to one row
    // per type. Coercion nulls (divergence: try_cast vs pandas astype
    // raise) keep 河畔夜市/木柵動物園 with null score/crit.
    val names = out.map(_.getAs[String]("name")).toSeq
    assert(names === Seq("中央紀念堂", "中央紀念堂", "台北塔樓", "台北塔樓",
      "木柵動物園", "河畔夜市"))
    val types = out.map(_.getAs[String]("type")).toSeq
    assert(types === Seq("古蹟", "地標", "建築物", "購物中心", "動物園", "市場"))
    val tower = out.filter(_.getAs[String]("name") == "台北塔樓")
    assert(tower.forall(_.getAs[Long]("crit") == 1200L))
    assert(tower.forall(_.getAs[Double]("score") == 4.5))
    assert(out.filter(_.getAs[String]("name") == "河畔夜市")
      .forall(_.isNullAt(out(0).fieldIndex("score"))))
  }

  // ------------------------------------------------------------- taipei

  test("taipeiNameMap: bilingual header block transposes to zh/en pairs") {
    val raw = ReferenceOds.withRowIds(readCsv(s"$fx/src_taipei.csv"))
    val map = ReferenceOds.taipeiNameMap(raw).orderBy("name_zh").collect()
    assert(map.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(
      ("台北塔樓", "Taipei Tower"), ("故宮博物院", "Palace Museum"),
      ("木柵動物園", "Muzha Zoo")))
  }

  test("taipeiVisitors: ROC year extract + dropna + melt to long") {
    val raw = ReferenceOds.withRowIds(readCsv(s"$fx/src_taipei.csv"))
    val out = ReferenceOds.taipeiVisitors(raw)
    // header row dropped; the null-cell 2016 row and the paren-less
    // "bad" year row dropped by dropna; 2 surviving rows × 3 columns
    assert(out.count() === 6)
    val jan = out.filter(col("month") === 1).orderBy("name").collect()
    assert(jan.map(r => (r.getInt(0), r.getString(2), r.getInt(3))).toSeq ===
      Seq((2015, "台北塔樓", 120000), (2015, "故宮博物院", 60000),
        (2015, "木柵動物園", 80000)))
  }

  // ----------------------------------------------------------- fb posts

  test("fbNormalize: filename-derived ref date + zh date branches") {
    val raw = spark.read.option("header", "true")
      .csv(s"$fx/postsInformation_*.csv")
    val out = ReferenceOds.fbNormalize(raw, input_file_name())
      .orderBy("id")
      .select(col("id"), col("author"), col("source_platform_id"),
        col("place"), date_format(col("created_at"), "yyyy-MM-dd").as("d"))
      .collect()
    // p5 (在線上), p6 (+5), p8 (null time) skipped; p7 (3月) kept null
    assert(out.map(_.getAs[String]("id")).toSeq ===
      Seq("p1", "p2", "p3", "p4", "p7"))
    assert(out.map(r => Option(r.getAs[String]("d"))).toSeq === Seq(
      Some("2024-04-28"),   // 3天 before 2024-05-01
      Some("2024-05-01"),   // 分鐘 → ref date
      Some("2023-03-14"),   // absolute Y年M月D日
      Some("2024-03-14"),   // M月D日 + 下午 suffix → ref year
      None))                // 月-only strptime failure → null, kept
    assert(out.forall(_.getAs[String]("source_platform_id") == "fb"))
    // ASCII place in the fixture filename only because sbt's file
    // watcher can't map non-ASCII paths in this container; the regex
    // group is byte-for-byte the reference's and matches zh places too
    assert(out.forall(_.getAs[String]("place") == "TaipeiTower"))
  }

  test("utf_8_sig BOM CSVs read clean (reference fb output encoding)") {
    val df = readCsv(s"$fx/bom_name_map.csv")
    // the BOM must not leak into the first header name
    assert(df.columns.toSeq === Seq("name_zh", "name_en"))
    assert(df.count() === 2)
    assert(df.orderBy("name_en").head().getString(0) === "木柵動物園")
  }

  // ------------------------------------------------------- gmaps places

  test("gmaps odsPlaces: filename place_id, drops, renames, nested read") {
    val raw = spark.read.schema(Gmaps.placesRawSchema)
      .json(s"$fx/places/*/*.jsonl")
    val ods = Gmaps.odsPlaces(raw, input_file_name())
    // dropped columns gone, renames applied, raw id kept
    val cols = ods.columns.toSet
    assert(Gmaps.placesDropCols.forall(c => !cols.contains(c)))
    assert(Seq("place_name", "google_place_url", "total_reviews",
      "avg_rating", "place_id", "place_id_raw").forall(cols.contains))
    val rows = ods.select("place_id", "place_id_raw", "place_name",
        "total_reviews").orderBy("place_id").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("tower_abc123", "zoo_def456"))
    assert(rows.map(_.getString(1)).toSeq === Seq("raw-id-1", "raw-id-2"))
    assert(rows.map(_.getLong(3)).toSeq === Seq(1200L, 800L))
    // nested fields survive the clean (4-level about/options, popular_times)
    val tower = ods.filter(col("place_id") === "tower_abc123")
    assert(tower.select(col("popular_times.Saturday")(0)
      .getField("popularity_percentage")).head().getLong(0) === 95L)
    assert(tower.select(col("about")(0).getField("options")(0)
      .getField("enabled")).head().getBoolean(0))
  }

  test("gmaps dim_places: city/region split of the address state") {
    val raw = spark.read.schema(Gmaps.placesRawSchema)
      .json(s"$fx/places/*/*.jsonl")
    val dim = Gmaps.dimPlaces(Gmaps.odsPlaces(raw, input_file_name()))
      .orderBy("place_id").collect()
    assert(dim.map(r => (r.getAs[String]("city"),
      r.getAs[String]("region"))).toSeq ===
      Seq(("台北市", "信義區"), ("台北市", "文山區")))
    assert(dim.map(_.getAs[String]("country")).toSeq === Seq("TW", "TW"))
  }

  test("gmaps popularMatrix: nested popular_times → 7x24 pivot") {
    val raw = spark.read.schema(Gmaps.placesRawSchema)
      .json(s"$fx/places/*/*.jsonl")
    val m = Gmaps.popularMatrix(Gmaps.odsPlaces(raw, input_file_name()))
    // zoo has popular_times null → excluded; tower has 7 day rows
    assert(m.count() === 7)
    assert(m.columns.length === 2 + 24)
    val mon = m.filter(col("day") === "Monday").head()
    assert(mon.getAs[Long]("14") === 60L)
    assert(mon.getAs[Long]("15") === 0L)       // missing hour → 0
    val sat = m.filter(col("day") === "Saturday").head()
    assert(sat.getAs[Long]("20") === 95L)
  }

  // ------------------------------------------- hashtag id-mapping dim

  test("hashtagDim: union distinct + id join + folded UPDATE/INSERT DML") {
    import spark.implicits._
    val taipeiIds = Seq(("故宮博物院", "id-a"), ("台北塔樓", "id-b"))
      .toDF("name", "attraction_id")
    val tripOds = Seq("台北塔樓", "木柵動物園", "木柵動物園", "無編號景點")
      .toDF("name")                      // dup name → distinct; one unmapped
    val tripIds = Seq(("台北塔樓", "id-b"), ("木柵動物園", "id-c"))
      .toDF("name", "attraction_id")
    val hashtagIds = Seq(("故宮博物院", "id-x"), ("河畔夜市", "id-d"))
      .toDF("name", "attraction_id")
    val out = ReferenceOds.hashtagDim(taipeiIds, tripOds, tripIds, hashtagIds,
        repairs = Map("台北塔樓" -> "id-b-fixed"))
      .orderBy("name").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(
      ("台北塔樓", "id-b-fixed"),   // UPDATE repair applied
      ("故宮博物院", "id-a"),       // already present → INSERT skipped
      ("木柵動物園", "id-c"),       // via tripOds ⋈ tripIds
      ("河畔夜市", "id-d")))        // INSERT-missing from hashtag ids
  }

  test("typeDim / attractionTypeDim / attractionDetailDim chains") {
    import spark.implicits._
    val tripOds = Seq(
      ("台北塔樓", "建築物", "i1", "u1"), ("台北塔樓", "購物中心", "i1", "u1"),
      ("木柵動物園", "動物園", null, "u2"), ("無映射景點", "荒地", "i3", "u3"))
      .toDF("name", "type", "info", "photo_url")
    val typeIds = Seq(("建築物", "t1"), ("購物中心", "t2"), ("動物園", "t3"))
      .toDF("type", "type_id")
    val hashtag = Seq(("台北塔樓", "a1"), ("木柵動物園", "a2"),
      ("未爬景點", "a3")).toDF("name", "attraction_id")

    // dim_type: only types present in BOTH ods and the id table
    val types = ReferenceOds.typeDim(tripOds, typeIds)
      .orderBy("type_id").collect()
    assert(types.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("t1", "建築物"), ("t2", "購物中心"), ("t3", "動物園")))

    // dim_attraction_type: theta join on type name, null type_id dropped
    val at = ReferenceOds.attractionTypeDim(hashtag, tripOds,
        ReferenceOds.typeDim(tripOds, typeIds))
      .orderBy("attraction_id", "type_id").collect()
    assert(at.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a1", "t1"), ("a1", "t2"), ("a2", "t3")))
      // 未爬景點: left-join nulls filtered; 無映射景點: not in hashtag dim

    // dim_attraction_detail: DELETE×N folded as exclusion — a2's row has
    // null info AND is listed → removed; a3's null-info row is NOT
    // listed → kept (the reference only repaired specific ids)
    val det = ReferenceOds.attractionDetailDim(hashtag, tripOds,
        deleteIds = Seq("a2"))
      .orderBy("attraction_id").collect()
    assert(det.map(_.getString(0)).toSeq === Seq("a1", "a3"))
    assert(det.filter(_.getString(0) == "a3").head.isNullAt(1))
  }

  test("weatherHistory: ym split + coerce-null measures") {
    val raw = readCsv(s"$fx/weatherInfoDW.csv")
    val out = ReferenceOds.weatherHistory(raw)
      .orderBy("ID", "Year-Month").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Int]("year") === 2022)
    assert(out(0).getAs[Int]("month") === 1)
    assert(out(0).getAs[Double]("Minimum AirTemperature (˚C)") === 10.3)
    // trace rainfall "T" and sentinel "---" coerce to null (to_numeric
    // errors='coerce' parity)
    assert(out(1).isNullAt(out(1).fieldIndex("Accumulation Precipitation (mm)")))
    assert(out(2).isNullAt(out(2).fieldIndex("Total SunshineDuration (hr)")))
  }

  // --------------------------------------------- gmaps reviews → mart

  test("gmaps reviews chain: ods date resolution → dims → fact → mart") {
    import spark.implicits._
    val raw = Seq(
      // (place, review, rating, text, published_raw, extracted, user, url)
      ("台北塔樓", "r1", 5L, "great", "3 天前", "2024-05-01 12:00:00", "u1", "uu1"),
      ("台北塔樓", "r2", 4L, "good", "2 週前", "2024-05-01 12:00:00", "u2", "uu2"),
      ("台北塔樓", "r2", 4L, "good", "2 週前", "2024-05-01 12:00:00", "u2", "uu2"), // dup
      ("木柵動物園", "r3", 3L, "ok", "1 個月前", "2024-05-01 12:00:00", "u1", "uu1"),
      ("木柵動物園", "r4", 5L, "wow", "在線上", "2024-05-01 12:00:00", "u3", "uu3"), // unresolvable → null date
      (null, "r5", 1L, "bad", "3 天前", "2024-05-01 12:00:00", "u4", "uu4"))   // null place → dropped
      .toDF("place_name", "review_id", "rating", "review_text",
        "published_at", "extracted_at", "user_name", "user_url")
    val ods = Gmaps.odsReviews(raw)
    assert(ods.count() === 5)  // r5 dropped; dup + null-date kept
    assert(ods.filter(col("published_at").isNull).count() === 1)

    val fact = Gmaps.factReviews(ods)
    assert(fact.count() === 4) // distinct collapses the dup

    val time = Gmaps.dimTime(ods)
    // dates: 2024-04-28, 2024-04-17, 2024-04-01, null → 4 distinct
    assert(time.count() === 4)
    assert(time.filter(col("date") === "2024-04-01")
      .select("quarter").head().getInt(0) === 2)

    assert(Gmaps.dimUsers(ods).count() === 3) // u4 went with dropped r5

    val placesRaw = spark.read.schema(Gmaps.placesRawSchema)
      .json(s"$fx/places/*/*.jsonl")
    val places = Gmaps.dimPlaces(Gmaps.odsPlaces(placesRaw, input_file_name()))
    val mart = Gmaps.martReviewTrends(fact, places, time)
      .orderBy("place_name", "date")
    val rows = mart.select("place_name", "total_reviews", "avg_rating")
      .collect()
    // null-date review never joins dim_time (inner join) — 3 mart rows
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq === Seq(("台北塔樓", 1L, 4.0), ("台北塔樓", 1L, 5.0),
        ("木柵動物園", 1L, 3.0)))
  }
}
