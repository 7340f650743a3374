package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ColFns

/** The full SURVEY §1.4 table inventory as ONE dependency-ordered build
  * over FIXTURES.md-shaped inputs: the reference's Airflow trigger/
  * sensor graph (§3.1 — the airflow dags' cross-DAG sensors) replaced
  * by a topological runner with idempotent full-refresh parquet
  * materialization at every table boundary (the same execution contract
  * as [[Medallion]], which runs the flagship chain over the synthetic
  * star schema; this runner covers the *reference* warehouse end to
  * end).
  *
  * Inputs arrive as named raw DataFrames (the scraped blobs of
  * FIXTURES.md §1-§9 — scraping itself is out-of-engine, SURVEY §2.1
  * S13); every derived table is built by the already-oracled pipeline
  * functions in [[ReferenceOds]] / [[Gmaps]]. Id-mapping tables
  * (`*_generate_id`) use the reference's md5(name) convention
  * (`airflow/utils/common.py:8-19`).
  *
  * Scale shape: each table materializes through one write (dims are
  * small by construction and broadcast into the mart; the reviews ods
  * is repartitioned on its partition column before a partitioned write
  * so each date lands in exactly one file — the same rule Medallion
  * documents at 100 TB).
  */
object ReferenceWarehouse {

  /** One warehouse table: name, layer, upstream deps, lazy build. */
  final case class Table(layer: String, name: String, deps: Seq[String],
                         build: Ctx => DataFrame) {
    def qualified: String = s"$layer.$name"
  }

  /** Build context: raw source frames + lake root + layer reads. */
  final class Ctx(val spark: SparkSession,
                  val sources: Map[String, DataFrame],
                  val lakeRoot: String) {
    def path(qualified: String): String =
      s"$lakeRoot/${qualified.replace('.', '/')}"
    def read(qualified: String): DataFrame =
      spark.read.parquet(path(qualified))
    def source(name: String): DataFrame = sources.getOrElse(name,
      throw new IllegalArgumentException(s"missing raw source '$name'"))
  }

  /** Required [[Ctx.sources]] keys (FIXTURES.md section in parens):
    * tripadvisor_raw (§1, `_rid`-stamped), taipei_raw (§2, `_rid`-
    * stamped), gmaps_places_raw (§4, with a `__file` column),
    * gmaps_reviews_raw (§5), fb_posts_raw (§6, with `__file`),
    * weather_raw (§8), hashtag_ids (§9). */
  val requiredSources: Seq[String] = Seq("tripadvisor_raw", "taipei_raw",
    "gmaps_places_raw", "gmaps_reviews_raw", "fb_posts_raw", "weather_raw",
    "hashtag_ids")

  /** name → md5 id, the reference's `*_generate_id` convention. */
  private def mdIds(df: DataFrame, nameCol: String,
                    idName: String): DataFrame =
    df.select(col(nameCol).as("name")).distinct()
      .select(col("name"), ColFns.md5Key(col("name")).as(idName))

  val tables: Seq[Table] = Seq(
    // ---- ods layer: the src→ods cleaning chains ------------------------
    Table("ods", "tripadvisor_info", Nil,
      c => ReferenceOds.tripadvisorInfo(c.source("tripadvisor_raw"))),
    Table("ods", "tripadvisor", Nil,
      c => ReferenceOds.tripadvisorExplode(c.source("tripadvisor_raw"))),
    Table("ods", "taipei_name_map", Nil,
      c => ReferenceOds.taipeiNameMap(c.source("taipei_raw"))),
    Table("ods", "taipei_visitors", Nil,
      c => ReferenceOds.taipeiVisitors(c.source("taipei_raw"))),
    Table("ods", "gmaps_places", Nil,
      c => Gmaps.odsPlaces(c.source("gmaps_places_raw"), col("__file"))
        .drop("__file")),
    Table("ods", "gmaps_reviews", Nil,
      c => Gmaps.odsReviews(c.source("gmaps_reviews_raw"))),
    Table("ods", "fb_posts", Nil,
      c => ReferenceOds.fbNormalize(c.source("fb_posts_raw"), col("__file"))),
    Table("ods", "weather_history", Nil,
      c => ReferenceOds.weatherHistory(c.source("weather_raw"))),

    // ---- dim layer -----------------------------------------------------
    Table("dim", "places", Seq("ods.gmaps_places"),
      c => Gmaps.dimPlaces(c.read("ods.gmaps_places"))),
    Table("dim", "time", Seq("ods.gmaps_reviews"),
      c => Gmaps.dimTime(c.read("ods.gmaps_reviews"))),
    Table("dim", "users", Seq("ods.gmaps_reviews"),
      c => Gmaps.dimUsers(c.read("ods.gmaps_reviews"))),
    Table("dim", "attraction_hashtag",
      Seq("ods.taipei_name_map", "ods.tripadvisor"), c => {
        val trip = c.read("ods.tripadvisor")
        ReferenceOds.hashtagDim(
          mdIds(c.read("ods.taipei_name_map"), "name_zh", "attraction_id"),
          trip, mdIds(trip, "name", "attraction_id"),
          c.source("hashtag_ids"), repairs = Map.empty)
      }),
    Table("dim", "type", Seq("ods.tripadvisor"), c => {
      val trip = c.read("ods.tripadvisor")
      ReferenceOds.typeDim(trip,
        mdIds(trip, "type", "type_id").withColumnRenamed("name", "type"))
    }),
    Table("dim", "attraction_type",
      Seq("dim.attraction_hashtag", "ods.tripadvisor", "dim.type"),
      c => ReferenceOds.attractionTypeDim(c.read("dim.attraction_hashtag"),
        c.read("ods.tripadvisor"), c.read("dim.type"))),
    Table("dim", "attraction_detail",
      Seq("dim.attraction_hashtag", "ods.tripadvisor"),
      c => ReferenceOds.attractionDetailDim(c.read("dim.attraction_hashtag"),
        c.read("ods.tripadvisor"), deleteIds = Nil)),

    // ---- fact layer ----------------------------------------------------
    Table("fact", "reviews", Seq("ods.gmaps_reviews"),
      c => Gmaps.factReviews(c.read("ods.gmaps_reviews"))),
    Table("fact", "attraction_history",
      Seq("ods.taipei_visitors", "dim.attraction_hashtag"), c =>
        // visitors keyed to attraction ids (init.sql:74-81 PK
        // attraction_id+year+month); the id dim is small → broadcast
        c.read("ods.taipei_visitors")
          .join(broadcast(c.read("dim.attraction_hashtag")), Seq("name"))
          .select("attraction_id", "name", "year", "month", "number_people")),

    // ---- mart layer ----------------------------------------------------
    Table("mart", "review_trends",
      Seq("fact.reviews", "dim.places", "dim.time"),
      c => Gmaps.martReviewTrends(c.read("fact.reviews"),
        c.read("dim.places"), c.read("dim.time"))))

  /** Dependency-ordered full build, independent tables building
    * concurrently per wave ([[Pipelines.runWaves]] — Airflow-style task
    * parallelism); returns the mart. Partitioned layers shuffle on the
    * partition column first (one file per partition — see
    * [[Medallion.run]] for the 100 TB rationale). */
  def run(spark: SparkSession, sources: Map[String, DataFrame],
          lakeRoot: String): DataFrame =
    runWith(spark, sources, lakeRoot, None)

  /** Per-table shuffle-exchange budgets for [[runGated]] — each
    * table's MEASURED static-plan exchange count on the fixture build
    * (Round18Spec prints and pins them), declared here as the
    * deploy-time contract: the number of corpus-wide shuffles this
    * build is ALLOWED to cost per table. A regression (a lost
    * broadcast, an accidental sort, a join key falling off) shows up
    * as exchanges the gate refuses BEFORE the table writes —
    * PlanShapeSpec's commit-time discipline moved into the runner
    * itself (VERDICT r9 #4). */
  val shuffleBudgets: Map[String, Int] = Map(
    "ods.tripadvisor_info" -> 0, // map-only clean (broadcast _rid fix)
    "ods.tripadvisor" -> 0,
    "ods.taipei_name_map" -> 0,
    "ods.taipei_visitors" -> 0,
    "ods.gmaps_places" -> 0, // map-only flatten/clean
    "ods.gmaps_reviews" -> 0, // map-only normalize (write repartition
                              // is the runner's own, after the gate)
    "ods.fb_posts" -> 0,
    "ods.weather_history" -> 0,
    "dim.places" -> 1, // distinct
    "dim.time" -> 1,
    "dim.users" -> 1,
    "dim.attraction_hashtag" -> 3, // distinct + union-distinct + M2 fold
    "dim.type" -> 2,
    "dim.attraction_type" -> 2,
    "dim.attraction_detail" -> 2,
    "fact.reviews" -> 1,
    "fact.attraction_history" -> 0, // broadcast dim join only
    "mart.review_trends" -> 1) // one agg; dims broadcast

  /** [[run]] with every table's plan gated against its declared
    * shuffle budget ([[graft.plans.PlanAudit.gate]]) BEFORE it
    * materializes: a cartesian/nested-loop join anywhere, or a table
    * whose static plan costs more exchanges than
    * [[shuffleBudgets]] declares, refuses the deploy instead of
    * silently paying corpus-squared (or corpus-times-extra-shuffle)
    * work at 100 TB. The gate audits the table's BUILD plan; the
    * runner's own partitioned-write repartition (ods.gmaps_reviews)
    * is declared machinery outside the budget. A table missing from
    * `budgets` fails fast — an undeclared table is an ungated table,
    * which is the regression class this runner exists to refuse. */
  def runGated(spark: SparkSession, sources: Map[String, DataFrame],
               lakeRoot: String,
               budgets: Map[String, Int] = shuffleBudgets): DataFrame =
    runWith(spark, sources, lakeRoot, Some(budgets))

  private def runWith(spark: SparkSession,
                      sources: Map[String, DataFrame], lakeRoot: String,
                      budgets: Option[Map[String, Int]]): DataFrame = {
    requiredSources.foreach(s => require(sources.contains(s),
      s"missing raw source '$s'"))
    val ctx = new Ctx(spark, sources, lakeRoot)
    Pipelines.runWaves[Table](tables, _.qualified, _.deps, "refwh") { t =>
      val df0 = t.build(ctx)
      val df = budgets match {
        case Some(b) =>
          graft.plans.PlanAudit.gateDeclared(df0, t.qualified, b)
        case None => df0
      }
      if (t.qualified == "ods.gmaps_reviews") {
        val n = spark.sparkContext.defaultParallelism
        df.repartition(n, col("published_at")).write.mode("overwrite")
          .partitionBy("published_at").parquet(ctx.path(t.qualified))
      } else
        df.write.mode("overwrite").parquet(ctx.path(t.qualified))
    }
    ctx.read("mart.review_trends")
  }
}
