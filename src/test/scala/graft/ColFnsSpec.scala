package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.ColFns

/** Unit vectors for the scalar functions — especially the Chinese
  * relative-date resolution, whose month/year branches must use calendar
  * arithmetic (reference `d_gmaps_reviews_src_to_ods.py:51-62`: months
  * are NOT 30 days). */
class ColFnsSpec extends GraftSuite {
  import spark.implicits._

  private def resolve(published: String, extracted: String): Option[String] = {
    val df = Seq((published, extracted)).toDF("p", "e")
      .select(date_format(
        ColFns.convertRelDate(col("p"), col("e").cast("timestamp")),
        "yyyy-MM-dd").as("d"))
    Option(df.collect()(0).getString(0))
  }

  test("convertRelDate: minutes/hours stay timestamp-based") {
    assert(resolve("10 分鐘前", "2023-05-01 00:05:00") === Some("2023-04-30"))
    assert(resolve("8 小時前", "2023-05-01 07:00:00") === Some("2023-04-30"))
    assert(resolve("8 小時前", "2023-05-01 09:00:00") === Some("2023-05-01"))
  }

  test("convertRelDate: days and weeks") {
    assert(resolve("3 天前", "2023-05-10 12:00:00") === Some("2023-05-07"))
    assert(resolve("2 週前", "2023-05-15 12:00:00") === Some("2023-05-01"))
  }

  test("convertRelDate: months are calendar months (not 30 days)") {
    assert(resolve("1 個月前", "2023-03-31 12:00:00") === Some("2023-02-28"))
    assert(resolve("5 個月前", "2023-05-10 12:00:00") === Some("2022-12-10"))
  }

  test("convertRelDate: years via calendar months") {
    assert(resolve("1 年前", "2024-02-29 12:00:00") === Some("2023-02-28"))
    assert(resolve("2 年前", "2023-05-10 12:00:00") === Some("2021-05-10"))
  }

  test("convertRelDate: unmatched → null") {
    assert(resolve("在線上", "2023-05-10 12:00:00") === None)
    assert(resolve("昨天", "2023-05-10 12:00:00") === None)
  }

  test("parseRating handles the tripadvisor format and garbage") {
    val df = Seq("4.0 分 (共 5 分)", "junk", "3.5 分 (共 5 分)").toDF("r")
      .select(ColFns.parseRating(col("r")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ===
      Seq(Some(4.0), None, Some(3.5)))
  }

  test("rocYear extracts the western year") {
    val df = Seq("104(2015)", "113(2024)", "nope").toDF("y")
      .select(ColFns.rocYear(col("y")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ===
      Seq(Some(2015), Some(2024), None))
  }

  test("city/region split on zh address state") {
    val df = Seq("台北市信義區", "南投縣埔里鎮").toDF("s")
      .select(ColFns.cityOf(col("s")).as("c"), ColFns.regionOf(col("s")).as("r"))
    val rows = df.collect()
    assert(rows(0) === Row("台北市", "信義區"))
    assert(rows(1) === Row("南投縣", "埔里鎮"))
  }

  test("quarterCase matches quarter()") {
    val df = spark.range(1, 13).select(
      ColFns.quarterCase(col("id").cast("int")).as("qc"),
      quarter(concat(lit("2023-"), lpad(col("id").cast("string"), 2, "0"),
        lit("-15")).cast("date")).as("q"))
    assert(df.filter(col("qc") =!= col("q")).count() === 0)
  }

  test("token metrics") {
    val df = Seq("Hello, world! the cat").toDF("t").select(
      ColFns.tokenCount(col("t")).as("n"),
      ColFns.bpeTokenCount(col("t")).as("b"),
      ColFns.punctRatio(col("t")).as("p"),
      ColFns.stopwordRatio(col("t")).as("s"))
    val r = df.collect()(0)
    assert(r.getInt(0) === 4)        // Hello, | world! | the | cat
    assert(r.getInt(1) === 6)        // hello , world ! the cat
    assert(r.getDouble(3) === 0.25)  // "the" of 4 tokens
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A  b\tC", "a b c")).toDF("x", "y").select(
      (ColFns.fingerprint(col("x")) === ColFns.fingerprint(col("y"))).as("eq"))
    assert(df.collect()(0).getBoolean(0))
  }

  private def fb(raw: String, ref: String): Option[String] = {
    val df = Seq((raw, ref)).toDF("r", "d")
      .select(date_format(
        ColFns.fbDate(col("r"), col("d").cast("date")), "yyyy-MM-dd").as("out"))
    Option(df.collect()(0).getString(0))
  }

  test("foldAccents: accents fold, control chars strip, ASCII untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq("Café à l'Élysée", "plain ASCII-42", "naïvefaçade")
      .toDF("s")
      .select(graft.functions.ColFns.foldAccents(col("s")))
      .as[String].collect().toSeq
    assert(got === Seq("Cafe a l'Elysee", "plain ASCII-42", "naivefacade"))
  }

  test("normalizeText: idempotent over messy inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val messy = Seq("  CAFÉ   du   Père  ", "plain", "", "À   LA  carte",
      "tabs\tand\nnewlines  collapse")
    val df = messy.toDF("s")
      .select(graft.functions.ColFns.normalizeText(col("s")).as("n1"))
      .select(col("n1"),
        graft.functions.ColFns.normalizeText(col("n1")).as("n2"))
    df.collect().foreach(r =>
      assert(r.getString(0) === r.getString(1), r.getString(0)))
    val got = messy.toDF("s")
      .select(graft.functions.ColFns.normalizeText(col("s")))
      .as[String].collect().toSeq
    assert(got(0) === "cafe du pere" && got(3) === "a la carte")
    assert(got(4) === "tabs and newlines collapse")
  }

  test("fbDate: reference normalization.py branch vectors") {
    assert(fb("3天", "2024-05-10") === Some("2024-05-07"))        // N天
    assert(fb("5分鐘", "2024-05-10") === Some("2024-05-10"))      // 分鐘 → ref
    assert(fb("2小時", "2024-05-10") === Some("2024-05-10"))      // 小時 → ref
    assert(fb("2023年3月14日", "2024-05-10") === Some("2023-03-14")) // absolute
    assert(fb("3月14日下午2:00", "2024-05-10") === Some("2024-03-14")) // ref year
    assert(fb("12月31日", "2024-01-02") === Some("2024-12-31"))   // forced ref year
    assert(fb("在線上", "2024-05-10") === None)                   // skipped
    assert(fb("+5", "2024-05-10") === None)                       // skipped
    assert(fb("3月", "2024-05-10") === None)                      // strptime fails
    assert(fb("昨天發布", "2024-05-10") === None)                 // int('昨天發布') raises
    // fallthrough: the reference calls ref_date.date() on a date —
    // always raises → except → None (normalization.py:53)
    assert(fb("something", "2024-05-10") === None)
    assert(fb("2024年2月30日", "2024-05-10") === None)            // invalid calendar date
  }
}
