package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ColFns

/** The reference's medallion warehouse (src → ods → dim/fact → mart,
  * `airflow/utils/config.yml:12-17`) re-expressed as one lazy Spark plan
  * per table with a dependency-ordered runner replacing the Airflow
  * trigger/sensor graph (SURVEY §3.1).
  *
  * Each stage is a pure `DataFrame => DataFrame` build; materialization
  * happens only at layer boundaries (parquet tables under a lake root),
  * exactly where the reference cuts BigQuery tables. Downstream stages
  * read the materialized layer, so a rerun of any stage is idempotent
  * full-refresh (`CREATE OR REPLACE` / WRITE_TRUNCATE semantics,
  * reference `airflow/utils/gcp.py:268-270`).
  *
  * The concrete tables mirror the flagship gmaps chain
  * (`d_gmaps_reviews_src_to_ods.py`, `d_gmaps_dim_time.py`,
  * `d_gmaps_fact_reviews.py`, `d_gmaps_mart_review_trends.py`) shaped
  * over the driver's synthetic star schema: orders play reviews,
  * customers play places, the order date plays the review date.
  */
object Medallion {

  /** One warehouse table: name, layer, upstream deps, lazy build. */
  final case class Table(
      layer: String, name: String, deps: Seq[String],
      build: (SparkSession, Ctx) => DataFrame) {
    def qualified: String = s"$layer.$name"
  }

  /** Build context: lake root + source dir + memoized layer reads. */
  final class Ctx(val spark: SparkSession, val sfDir: String,
                  val lakeRoot: String) {
    def path(qualified: String): String =
      s"$lakeRoot/${qualified.replace('.', '/')}"
    def read(qualified: String): DataFrame =
      spark.read.parquet(path(qualified))
    def source(name: String): DataFrame = graft.Tables.load(spark, sfDir, name)
  }

  /** ods: cleaned reviews — null-key filter + date normalization,
    * date-partition column (reference ods-gmaps-reviews).
    *
    * Partition granularity is chosen by data density (target: one
    * well-sized file per partition), not by the key's natural grain. At
    * this table's bench density a day holds a few KB and even a month
    * only ~50 KB — tiny files whose open/commit overhead dominates the
    * build and whose listing dominates every downstream read — so the
    * layer partitions by year (~0.5 MB/file at sf0.1; at 100 TB the same
    * rule lands on day). Finer-grained pruning still works inside a
    * partition via parquet min/max row-group stats on `published_at`. */
  private def odsReviews(s: SparkSession, ctx: Ctx): DataFrame =
    ctx.source("orders")
      .filter(col("o_orderkey").isNotNull && col("o_custkey").isNotNull &&
        col("o_orderdate").isNotNull)
      .select(
        col("o_orderkey").as("review_id"),
        col("o_custkey").as("place_id"),
        col("o_totalprice").as("rating_raw"),
        col("o_orderdate").cast("date").as("published_at"))
      .withColumn("published_year", year(col("published_at")))

  /** dim: calendar dim from observed dates (reference dim-time). */
  private def dimTime(s: SparkSession, ctx: Ctx): DataFrame =
    ctx.read("ods.reviews")
      .select(col("published_at").as("date")).distinct()
      .select(col("date"),
        year(col("date")).as("year"), month(col("date")).as("month"),
        dayofmonth(col("date")).as("day"),
        ColFns.quarterCase(month(col("date"))).as("quarter"))

  /** dim: distinct places with attributes (reference dim-gmaps-places). */
  private def dimPlaces(s: SparkSession, ctx: Ctx): DataFrame =
    ctx.source("customer")
      .select(col("c_custkey").as("place_id"),
        col("c_name").as("place_name"),
        col("c_mktsegment").as("segment")).distinct()

  /** fact: the review grain, keyed to the dims (reference
    * fact-gmaps-reviews — a distinct projection of ods). */
  private def factReviews(s: SparkSession, ctx: Ctx): DataFrame =
    ctx.read("ods.reviews")
      .select(col("review_id"), col("place_id"),
        col("rating_raw"), col("published_at")).distinct()

  /** mart: the flagship trends rollup — fact ⋈ dim ⋈ dim, multi-key
    * group-by, COUNT + rounded AVG (reference mart-reviews-trends,
    * `d_gmaps_mart_review_trends.py:70-106`). Dims are broadcast. */
  private def martTrends(s: SparkSession, ctx: Ctx): DataFrame = {
    val f = ctx.read("fact.reviews")
    val p = ctx.read("dim.places")
    val t = ctx.read("dim.time")
    f.join(broadcast(p), Seq("place_id"))
      .join(broadcast(t), f("published_at") === t("date"))
      .groupBy(col("segment"), col("year"), col("quarter"))
      .agg(count(col("review_id")).as("n_reviews"),
        round(sum(col("rating_raw").cast("decimal(18,2)")).cast("double")
          / count(lit(1)), 2).as("avg_rating"))
  }

  val tables: Seq[Table] = Seq(
    Table("ods", "reviews", Nil, odsReviews),
    Table("dim", "time", Seq("ods.reviews"), dimTime),
    Table("dim", "places", Nil, dimPlaces),
    Table("fact", "reviews", Seq("ods.reviews"), factReviews),
    Table("mart", "trends",
      Seq("fact.reviews", "dim.places", "dim.time"), martTrends))

  /** Dependency-ordered full build (replaces the Airflow trigger/sensor
    * wiring). Tables whose dependencies are satisfied build
    * CONCURRENTLY ([[Pipelines.runWaves]]) — the same parallelism the
    * reference gets from Airflow running independent DAG tasks at once;
    * each table is still one isolated write. The ods layer is written
    * date-partitioned (S9). Returns the mart. */
  def run(spark: SparkSession, sfDir: String, lakeRoot: String): DataFrame =
    runWith(spark, sfDir, lakeRoot, None)

  /** Per-table shuffle budgets for [[runGated]] — the measured
    * static-plan exchange counts of the five tables (pinned in
    * Round18Spec), declared as the deploy contract (see
    * [[ReferenceWarehouse.shuffleBudgets]]). The ods write's own
    * partition repartition is the runner's machinery, gated outside
    * the build budget. */
  val shuffleBudgets: Map[String, Int] = Map(
    "ods.reviews" -> 0,  // map-only filter/normalize
    "dim.time" -> 1,     // distinct
    "dim.places" -> 1,   // distinct
    "fact.reviews" -> 1, // distinct
    "mart.trends" -> 1)  // one agg; both dims broadcast

  /** [[run]] with every table's plan refused-or-passed against its
    * declared budget BEFORE materializing — PlanAudit.gate in the
    * runner (VERDICT r9 #4): cartesians always refuse; exchanges
    * above the table's declared count refuse. An undeclared table
    * fails fast (ungated = the regression class this exists for). */
  def runGated(spark: SparkSession, sfDir: String, lakeRoot: String,
               budgets: Map[String, Int] = shuffleBudgets): DataFrame =
    runWith(spark, sfDir, lakeRoot, Some(budgets))

  private def runWith(spark: SparkSession, sfDir: String,
                      lakeRoot: String,
                      budgets: Option[Map[String, Int]]): DataFrame = {
    val ctx = new Ctx(spark, sfDir, lakeRoot)
    Pipelines.runWaves[Table](tables, _.qualified, _.deps, "medallion") { t =>
      val df0 = t.build(spark, ctx)
      val df = budgets match {
        case Some(b) =>
          graft.plans.PlanAudit.gateDeclared(df0, t.qualified, b)
        case None => df0
      }
      // Partitioned layers are shuffled on the partition column first so
      // each partition lands in exactly one task → one file per partition
      // instead of (tasks × partitions) tiny files. Same pattern at
      // 100 TB: one hash shuffle co-locates each output partition's rows.
      if (t.qualified == "ods.reviews") {
        // explicit partition count: an AQE-coalesced shuffle would funnel
        // every output partition through a handful of writer tasks
        val n = spark.sparkContext.defaultParallelism
        df.repartition(n, col("published_year")).write.mode("overwrite")
          .partitionBy("published_year").parquet(ctx.path(t.qualified))
      }
      else
        df.write.mode("overwrite").parquet(ctx.path(t.qualified))
    }
    ctx.read("mart.trends")
  }
}
