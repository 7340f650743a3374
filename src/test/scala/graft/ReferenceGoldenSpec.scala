package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.ReferenceOds
import graft.sources.Csv

/** Golden tests against the reference's ACTUAL fixture blobs (not the
  * synthetic reference-shaped fixtures of ReferenceOdsSpec): the real
  * 8912-row `src_tripadvisor.csv` (bilingual headers, `"4.0 分 (共 5
  * 分)"` ratings, the `drop([462])` repair target), the real BOM-headed
  * `src_taipei.csv` matrix, `ods_taipei_name_en_zh.csv` (the
  * reference's own published name-map output), and both
  * `fb_scraper/source → normalized` pairs, where the normalized CSVs
  * ARE the reference's published expected output
  * (`fb_scraper/normalization.py:70-85`).
  *
  * Expected aggregates were computed once by running the reference's
  * own pandas chains (`transfer_src_tripadvisor_to_ods_tripadvisor
  * .py:67-78`, `tripadvisor/d_tripadvisor_src_to_ods.py:44-105`,
  * `transfer_src_taipei_to_ods_taipei.py:55-81`) over the same blobs
  * and are pinned here as literals.
  */
class ReferenceGoldenSpec extends GraftSuite {

  private val dags = "/root/reference/airflow/dags"
  private val fb = "/root/reference/fb_scraper"

  private def blob(path: String): DataFrame = Csv.readBlob(spark, path)

  test("real src_tripadvisor.csv: pandas-compatible header repair") {
    val raw = blob(s"$dags/src_tripadvisor.csv")
    // trailing comma in the header row → pandas calls it "Unnamed: 6";
    // stock Spark would have invented "_c6" and the reference's
    // drop-by-name would silently miss it
    assert(raw.columns.toSeq === Seq("景點介紹", "景點照", "景點名",
      "評分", "評論數", "類型", "Unnamed: 6"))
    assert(raw.count() === 8912L)
  }

  test("real src_tripadvisor.csv through tripadvisorExplode (condensed chain)") {
    val raw = ReferenceOds.withRowIds(blob(s"$dags/src_tripadvisor.csv"))
    val out = ReferenceOds.tripadvisorExplode(raw).cache()
    assert(out.count() === 6826L)
    assert(out.select(countDistinct(col("name"))).head().getLong(0) === 5678L)
    assert(out.select(countDistinct(col("type"))).head().getLong(0) === 182L)
    assert(out.agg(sum(col("crit"))).head().getLong(0) === 398247L)
    // exact double sum via ×10 in long space
    assert(out.agg(sum((col("score") * 10).cast("long"))).head()
      .getLong(0) === 280580L)
    // the drop([462]) repair row (多羅滿賞鯨 was the keep-first keeper
    // at pandas label 462) must be absent
    assert(out.filter(col("name") === "多羅滿賞鯨").count() === 0L)
    // spot row: 台北101 explodes into its two trimmed types
    val tp = out.filter(col("name") === "台北101")
      .orderBy("type").collect()
    assert(tp.map(_.getAs[String]("type")).toSeq === Seq("建築物", "購物中心"))
    assert(tp.forall(r => r.getAs[Double]("score") == 4.0 &&
      r.getAs[Long]("crit") == 12250L))
    out.unpersist()
  }

  test("real src_tripadvisor.csv through tripadvisorInfo (9-step chain)") {
    val raw = ReferenceOds.withRowIds(blob(s"$dags/src_tripadvisor.csv"))
    val out = ReferenceOds.tripadvisorInfo(raw).cache()
    assert(out.count() === 6343L)
    assert(out.agg(sum(col("total_reviews"))).head().getLong(0) === 291896L)
    assert(out.agg(sum((col("rating") * 10).cast("long"))).head()
      .getLong(0) === 259705L)
    val tp = out.filter(col("attraction_name") === "台北101").head()
    assert(tp.getAs[Double]("rating") === 4.0)
    assert(tp.getAs[Long]("total_reviews") === 12250L)
    assert(tp.getAs[String]("categories") === "建築物,購物中心")
    // md5 surrogate key over the utf-8 name (reference common.py:8-19)
    assert(tp.getAs[String]("attraction_id") ===
      "1d56e443604354ed396ea153f8b55846")
    out.unpersist()
  }

  test("real src_taipei.csv: taipeiNameMap equals the reference's published ods_taipei_name_en_zh.csv") {
    val raw = ReferenceOds.withRowIds(blob(s"$dags/src_taipei.csv"))
    // BOM stripped: the first column must be 年度, not ﻿年度
    assert(raw.columns.head === "年度")
    val got = ReferenceOds.taipeiNameMap(raw)
    val want = blob(s"$dags/ods_taipei_name_en_zh.csv")
    assert(want.count() === 34L)
    assert(got.count() === 34L)
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
  }

  test("real src_taipei.csv through taipeiVisitors (ROC years, melt)") {
    val raw = ReferenceOds.withRowIds(blob(s"$dags/src_taipei.csv"))
    val out = ReferenceOds.taipeiVisitors(raw).cache()
    assert(out.count() === 3740L)
    assert(out.agg(sum(col("number_people").cast("long"))).head()
      .getLong(0) === 358971415L)
    // "104(2015)" parses to 2015; the matrix spans ROC 104-113
    assert(out.select(col("year")).distinct().orderBy("year")
      .collect().map(_.getInt(0)).toSeq === (2015 to 2024))
    val spot = out.filter(col("year") === 2015 && col("month") === 1 &&
      col("name") === "陽明山遊客中心").head()
    assert(spot.getAs[Int]("number_people") === 10773)
    out.unpersist()
  }

  private def fbGolden(place: String): Unit = {
    val srcPath = s"$fb/source/postsInformation_${place}_2024-05-08.csv"
    val got = ReferenceOds.fbNormalize(blob(srcPath), input_file_name())
      .select(col("id"), col("attraction_id"), col("author"),
        col("description"), col("url"), col("source_platform_id"),
        col("created_at").cast("string").as("created_at"))
    val want = blob(s"$fb/normalized/Normalization_${place}_2024-05-08.csv")
    assert(got.count() === want.count(),
      s"$place row count: got ${got.count()} want ${want.count()}")
    assert(got.exceptAll(want).count() === 0L, s"$place: extra rows")
    assert(want.exceptAll(got).count() === 0L, s"$place: missing rows")
  }

  test("real fb source → normalized pair: 中正紀念堂 (the published expected output)") {
    fbGolden("中正紀念堂")
  }

  test("real fb source → normalized pair: 國父紀念館") {
    fbGolden("國父紀念館")
  }
}
