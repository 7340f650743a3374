package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColFns
import graft.operators.Relational

/** The flagship gmaps chain (SURVEY §3.1) over the reference's real
  * table shapes: nested places jsonl → ods, raw reviews → ods (Chinese
  * relative-date resolution), dim_places / dim_time / dim_users /
  * fact_reviews distinct CTAS-es, and the mart-review-trends rollup.
  *
  * Everything is a lazy `DataFrame => DataFrame`; the medallion runner
  * ([[Medallion]]) shows the materialization pattern. Dims are small by
  * construction (distinct places/dates/users) → broadcast in the mart.
  */
object Gmaps {

  // ===================================================================
  // Schemas (reference `d_gmaps_places_src_to_ods.py:147-390` — the
  // richest nested schema in the system; FIXTURES.md §4)
  // ===================================================================

  private def s(n: String, t: DataType) = StructField(n, t)
  private def linkSource = StructType(Seq(
    s("link", StringType), s("source", StringType)))
  private def popularDay = ArrayType(StructType(Seq(
    s("hour_of_day", LongType), s("time_label", StringType),
    s("popularity_percentage", LongType),
    s("popularity_description", StringType))))

  /** Raw crawler jsonl schema, pre-clean (includes the 8 columns the
    * ods step drops). */
  val placesRawSchema: StructType = StructType(Seq(
    s("place_id", StringType), s("name", StringType),
    s("description", StringType), s("is_spending_on_ads", BooleanType),
    s("reviews", LongType), s("rating", DoubleType),
    s("website", StringType), s("owner", StructType(Seq(
      s("id", StringType), s("name", StringType), s("link", StringType)))),
    s("can_claim", BooleanType), s("link", StringType),
    s("status", StringType), s("featured_question", StringType),
    s("cid", StringType), s("phone", StringType),
    s("plus_code", StringType), s("data_id", StringType),
    s("closed_on", StringType),
    s("main_category", StringType),
    s("categories", ArrayType(StringType)),
    s("workday_timing", StringType),
    s("address", StringType), s("time_zone", StringType),
    s("price_range", StringType), s("reviews_link", StringType),
    s("featured_image", StringType),
    s("review_keywords", ArrayType(StructType(Seq(
      s("keyword", StringType), s("count", LongType))))),
    s("reviews_per_rating", StructType((1 to 5).map(i =>
      s(s"rating_$i", LongType)))),
    s("coordinates", StructType(Seq(
      s("latitude", DoubleType), s("longitude", DoubleType)))),
    s("detailed_address", StructType(Seq(
      s("ward", StringType), s("street", StringType), s("city", StringType),
      s("postal_code", StringType), s("state", StringType),
      s("country_code", StringType)))),
    s("menu", linkSource),
    s("reservations", ArrayType(linkSource)),
    s("order_online_links", ArrayType(linkSource)),
    s("about", ArrayType(StructType(Seq(
      s("id", StringType), s("name", StringType),
      s("options", ArrayType(StructType(Seq(
        s("name", StringType), s("enabled", BooleanType))))))))),
    s("images", ArrayType(StructType(Seq(
      s("about", StringType), s("link", StringType))))),
    s("hours", ArrayType(StructType(Seq(
      s("day", StringType), s("times", ArrayType(StringType)))))),
    s("most_popular_times", ArrayType(StructType(Seq(
      s("hour_of_day", LongType), s("average_popularity", DoubleType),
      s("time_label", StringType))))),
    s("popular_times", StructType(Seq("Monday", "Tuesday", "Wednesday",
      "Thursday", "Friday", "Saturday", "Sunday").map(d =>
      s(d, popularDay))))))

  /** Raw reviews parquet schema (implied by the src→ods CTAS,
    * `d_gmaps_reviews_src_to_ods.py:66-79`). */
  val reviewsRawSchema: StructType = StructType(Seq(
    s("place_name", StringType), s("review_id", StringType),
    s("rating", LongType), s("review_text", StringType),
    s("published_at", StringType), s("extracted_at", StringType),
    s("user_name", StringType), s("user_url", StringType)))

  // ===================================================================
  // src → ods
  // ===================================================================

  /** Columns the places ods step drops
    * (`d_gmaps_places_src_to_ods.py:71-94`, tolerant of absences). */
  val placesDropCols: Seq[String] = Seq("status", "featured_question",
    "cid", "phone", "owner", "plus_code", "data_id", "closed_on")

  /** zh/raw → ods renames (`d_gmaps_places_src_to_ods.py:96-106`). */
  val placesRenames: Map[String, String] = Map(
    "name" -> "place_name", "link" -> "google_place_url",
    "reviews" -> "total_reviews", "rating" -> "avg_rating")

  /** Places src→ods: place_id injected from the blob filename
    * (`<prefix>/<place_id>.jsonl`, `:62-69,119`) with the raw value kept
    * under place_id_raw, 8 unused columns dropped, 4 renamed. Pass
    * `input_file_name()` as `fileName` when reading the jsonl glob. */
  def odsPlaces(raw: DataFrame, fileName: Column): DataFrame = {
    val withId = Relational.overwriteKeepRaw(raw, "place_id",
      regexp_extract(fileName, "([^/]+)\\.jsonl$", 1))
    Relational.renameAll(
      Relational.dropCols(withId, placesDropCols), placesRenames)
  }

  /** Reviews src→ods: null-key filters on the *raw* columns, then
    * Chinese relative-date resolution. BigQuery WHERE cannot see SELECT
    * aliases, so the reference's `published_at IS NOT NULL` filters the
    * raw string — rows whose date fails to resolve are kept with a null
    * date (`d_gmaps_reviews_src_to_ods.py:66-79`). */
  def odsReviews(raw: DataFrame): DataFrame =
    raw.filter(col("place_name").isNotNull && col("review_id").isNotNull &&
        col("published_at").isNotNull)
      .select(col("place_name"), col("review_id"), col("rating"),
        col("review_text"),
        ColFns.convertRelDate(col("published_at"),
          col("extracted_at").cast(TimestampType)).as("published_at"),
        col("user_name"), col("user_url"))

  // ===================================================================
  // ods → dim / fact → mart
  // ===================================================================

  /** dim_places (`d_gmaps_dim_places.py:33-51`): distinct places with
    * the city/region regexp split of the address state. */
  def dimPlaces(ods: DataFrame): DataFrame =
    ods.select(col("place_id"), col("place_name"),
        col("detailed_address.country_code").as("country"),
        ColFns.cityOf(col("detailed_address.state")).as("city"),
        ColFns.regionOf(col("detailed_address.state")).as("region"),
        col("coordinates.latitude").as("latitude"),
        col("coordinates.longitude").as("longitude"),
        col("address"), col("google_place_url"), col("main_category"))
      .distinct()

  /** dim_time (`d_gmaps_dim_time.py:33-52`): calendar dim from observed
    * review dates, CASE-based quarter. */
  def dimTime(odsReviews: DataFrame): DataFrame =
    odsReviews.select(col("published_at").as("date")).distinct()
      .select(col("date"),
        year(col("date")).as("year"), month(col("date")).as("month"),
        dayofmonth(col("date")).as("day"),
        ColFns.quarterCase(month(col("date"))).as("quarter"))

  /** dim_users (`d_gmaps_dim_users.py:33-43`). */
  def dimUsers(odsReviews: DataFrame): DataFrame =
    odsReviews.select(col("user_name"), col("user_url")).distinct()

  /** fact_reviews (`d_gmaps_fact_reviews.py:33-50`): distinct review
    * grain, day-partitioned on write by the runner. */
  def factReviews(odsReviews: DataFrame): DataFrame =
    odsReviews.select(col("review_id"), col("place_name"), col("user_name"),
      col("rating"), col("published_at"), col("review_text")).distinct()

  /** The populartimes 7×24 popularity matrix (reference
    * `populartimes/crawler.py:215-269` accumulates it imperatively per
    * place) from the nested `popular_times` struct: unnest the 7 day
    * arrays → explode hour entries → pivot hours 0-23. One narrow
    * explode + one pivot aggregation; no joins. Missing hours → 0. */
  def popularMatrix(ods: DataFrame): DataFrame = {
    val days = Seq("Monday", "Tuesday", "Wednesday", "Thursday",
      "Friday", "Saturday", "Sunday")
    val stacked = ods
      .filter(col("popular_times").isNotNull)
      .select(col("place_id"),
        explode(array(days.map(d => struct(lit(d).as("day"),
          col(s"popular_times.$d").as("entries"))): _*)).as("dt"))
      .select(col("place_id"), col("dt.day").as("day"),
        // outer: a day with no observations still gets its zero row
        // (the reference emits a dense 7×24 matrix)
        explode_outer(col("dt.entries")).as("e"))
      .select(col("place_id"), col("day"),
        col("e.hour_of_day").as("hour"),
        col("e.popularity_percentage").as("pop"))
    val pivoted = stacked.groupBy(col("place_id"), col("day"))
      .pivot("hour", (0 to 23).map(_.toString))
      .agg(first(col("pop")))
    (0 to 23).foldLeft(pivoted) { (df, h) =>
      df.withColumn(h.toString, coalesce(col(h.toString), lit(0L)))
    }
  }

  /** mart_review_trends (`d_gmaps_mart_review_trends.py:68-108`): fact ⋈
    * dim_places on place_name ⋈ dim_time on date, 11-key group-by,
    * COUNT + ROUND(AVG,2). Dims broadcast (small by construction). */
  def martReviewTrends(fact: DataFrame, places: DataFrame,
                       time: DataFrame): DataFrame = {
    val p = broadcast(places)
    val t = broadcast(time)
    fact.as("r")
      .join(p.as("p"), col("r.place_name") === col("p.place_name"))
      .join(t.as("t"), col("r.published_at") === col("t.date"))
      .groupBy(col("p.city"), col("p.region"), col("p.place_id"),
        col("p.place_name"), col("p.main_category"), col("p.latitude"),
        col("p.longitude"), col("t.year"), col("t.month"), col("t.quarter"),
        col("t.date"))
      .agg(count(col("r.review_id")).as("total_reviews"),
        round(avg(col("r.rating")), 2).as("avg_rating"))
  }
}
