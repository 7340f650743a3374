package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColFns
import graft.operators.{Dedup, Mutations, Relational, Reshape}

/** The reference's concrete src→ods cleaning pipelines (SURVEY §3.2),
  * re-expressed as pure `DataFrame => DataFrame` chains: one lazy plan
  * each, zero intermediate materialization (the reference serializes the
  * whole frame through Airflow XCom between every step).
  *
  * Positional semantics (pandas row labels: `drop([462])`, `iloc[0]`,
  * `keep="first"`) don't exist in Spark's unordered relational model;
  * they are re-expressed over an explicit `_rid` file-order column
  * supplied by [[withRowIds]] — same results, but deterministic and
  * documented instead of incidental (SURVEY §7.4).
  */
object ReferenceOds {

  /** File-order row ids for positional pandas semantics. Single
    * narrow-partition pass: valid whenever the input is one file (the
    * reference's inputs are single CSV blobs). For multi-file inputs
    * sort by a real key instead — positional repair is a small-blob
    * concept and is documented as such (SURVEY §2.2 P10). */
  def withRowIds(df: DataFrame): DataFrame =
    df.coalesce(1).withColumn("_rid", monotonically_increasing_id())

  // ===================================================================
  // TripAdvisor, 9-step variant → ods_tripadvisor_info
  // (reference `tripadvisor/d_tripadvisor_src_to_ods.py:136-157`)
  // ===================================================================

  /** zh→en header map, t3 (`d_tripadvisor_src_to_ods.py:51-63`). */
  val tripadvisorRenames: Map[String, String] = Map(
    "景點介紹" -> "info", "景點照" -> "photo", "景點名" -> "attraction_name",
    "評分" -> "rating", "評論數" -> "total_reviews", "類型" -> "categories")

  /** The t2→t9 chain. Input: raw zh-headed frame with `_rid`; output
    * schema matches the reference's external table
    * (`d_tripadvisor_src_to_ods.py:115-133`): attraction_id, info,
    * photo, attraction_name, rating double, total_reviews long,
    * categories comma-joined string. */
  def tripadvisorInfo(raw: DataFrame): DataFrame = {
    val t2 = Relational.dropColsRegex(raw, "^Unnamed.*")             // t2
    val t3 = Relational.renameAll(t2, tripadvisorRenames)            // t3
    val dataCols = t3.columns.filterNot(_ == "_rid").toSeq
    val t4 = t3.na.drop("all", dataCols)                             // t4
    val t5 = Dedup.keepFirst(t4,                                     // t5
      Seq("attraction_name", "rating"), Seq(col("_rid")))
    val t6 = t5                                                      // t6
      .withColumn("rating",
        trim(split(col("rating"), "分 ").getItem(0)).try_cast("double"))
      .na.drop(Seq("rating"))
    val t7 = t6                                                      // t7
      .withColumn("total_reviews", col("total_reviews").try_cast("long"))
      .na.drop(Seq("total_reviews"))
    val t8 = t7                                                      // t8
      .filter(col("categories").isNotNull)
      .withColumn("categories",
        regexp_replace(col("categories"), " • ", ","))
    t8.withColumn("attraction_id", ColFns.md5Key(col("attraction_name"))) // t9
      .select("attraction_id", "info", "photo", "attraction_name",
        "rating", "total_reviews", "categories")
  }

  // ===================================================================
  // TripAdvisor, condensed explode variant → ods_tripadvisor
  // (reference `transfer_src_tripadvisor_to_ods_tripadvisor.py:55-78`)
  // ===================================================================

  /** The condensed clean: rename, dropna subset, drop `Unnamed: 6`,
    * dedup by name keep-first, positional repair rows dropped by file
    * order (`drop([462])` → `dropRids`), numeric coercions, then
    * split-explode on `•` with trim. */
  def tripadvisorExplode(raw: DataFrame,
                         dropRids: Seq[Long] = Seq(462L)): DataFrame = {
    val renamed = Relational.renameAll(raw, Map(
      "景點介紹" -> "info", "景點照" -> "photo_url", "景點名" -> "name",
      "評分" -> "score", "評論數" -> "crit", "類型" -> "type"))
    val cleaned = renamed
      .na.drop(Seq("info", "photo_url", "score", "crit", "type"))
      .transform(Relational.dropCols(_, Seq("Unnamed: 6")))
    val deduped = Dedup.keepFirst(cleaned, Seq("name"), Seq(col("_rid")))
      .filter(!col("_rid").isin(dropRids: _*))   // documented data repair
      .withColumn("crit", col("crit").try_cast("long"))
      .withColumn("score",
        trim(split(col("score"), " ").getItem(0)).try_cast("double"))
    Reshape.explodeSplit(deduped, "type", "type", "•")
      .select("info", "photo_url", "name", "score", "crit", "type")
  }

  // ===================================================================
  // Taipei visitor matrix → ods_taipei_number_people + zh/en name map
  // (reference `transfer_src_taipei_to_ods_taipei.py:55-81`)
  // ===================================================================

  /** The bilingual header block: row 0 carries English names for the
    * attraction columns (index ≥ 2). Pure metadata reshape — one
    * collected row builds the (name_zh, name_en) map (SURVEY §2.8 R3).
    * Output: `name_zh, name_en`, one row per attraction column. */
  def taipeiNameMap(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    val attractionCols =
      raw.columns.filterNot(_ == "_rid").drop(2)       // iloc[[0], 2:]
    val row0: Row = raw.filter(col("_rid") === 0)
      .select(attractionCols.toIndexedSeq.map(col): _*).head()
    val pairs = attractionCols.zipWithIndex.map { case (zh, i) =>
      Row(zh, row0.getString(i))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.toSeq, 1),
      StructType(Seq(StructField("name_zh", StringType),
        StructField("name_en", StringType))))
  }

  /** Wide matrix → long visitors table: drop the English header row,
    * rename 年度/月份, ROC year `"104(2015)"` → 2015, full-row dropna,
    * melt the attraction columns, int casts. Output:
    * `year int, month int, name string, number_people int`
    * (the reference external-table schema, `:119-124`). */
  def taipeiVisitors(raw: DataFrame): DataFrame = {
    val dropHeaderRow = raw.filter(col("_rid") =!= 0)   // drop([0])
    val renamed = Relational.renameAll(dropHeaderRow,
      Map("年度" -> "year", "月份" -> "month"))
    val attractionCols =
      renamed.columns.filterNot(Seq("_rid", "year", "month").contains).toSeq
    val yearFixed = renamed
      // x.split("(")[1].split(")")[0].strip()
      .withColumn("year", trim(regexp_extract(col("year"), "\\(([^)]*)\\)", 1)))
      .withColumn("year", when(col("year") === "", lit(null)).otherwise(col("year")))
    val noNulls = yearFixed.na.drop("any",
      ("year" +: "month" +: attractionCols))            // dropna()
    Reshape.melt(noNulls.drop("_rid"),
        ids = Seq("year", "month"), values = attractionCols,
        varName = "name", valName = "number_people")
      .select(col("year").cast("int"), col("month").cast("int"),
        col("name"), col("number_people").cast("int"))
  }

  // ===================================================================
  // dim_attraction_hashtag — the id-mapping dim with folded DML
  // (reference `create_dim_attraction_hashtag.py:72-191`)
  // ===================================================================

  /** The hashtag synonym dim: `taipeiIds UNION DISTINCT
    * (tripOds ⋈ tripIds USING(name))`, then the reference's DML batch
    * folded into the build — UPDATE×13 as a broadcast repair map
    * (name → corrected attraction_id), INSERT-missing as an anti-join
    * union from the hashtag id table. One shuffle per distinct/join;
    * the repair map is literal data, not row-by-row DML. All inputs
    * expose (name, attraction_id); `tripOds` exposes `name`. */
  def hashtagDim(taipeiIds: DataFrame, tripOds: DataFrame,
                 tripIds: DataFrame, hashtagIds: DataFrame,
                 repairs: Map[String, String]): DataFrame = {
    val joined = tripOds.select("name").distinct()
      .join(tripIds, Seq("name"))
      .select("name", "attraction_id")
    val base = taipeiIds.select("name", "attraction_id")
      .union(joined).distinct()
    val repaired = Mutations.repairByKey(base, "name", "attraction_id", repairs)
    Mutations.insertMissing(repaired,
      hashtagIds.select("name", "attraction_id"), Seq("name"))
  }

  // ===================================================================
  // dim_type / dim_attraction_type / dim_attraction_detail
  // (reference `create_dim_type.py:62-106`,
  // `create_dim_attraction_type.py:71-120`,
  // `create_dim_attraction_detail.py:63-200`)
  // ===================================================================

  /** dim_type: `SELECT DISTINCT type_id, type AS name FROM ods_tripadvisor
    * JOIN ods_type_generate_id USING (type)`. `typeIds` is small
    * (distinct type universe) → broadcast. */
  def typeDim(tripOds: DataFrame, typeIds: DataFrame): DataFrame =
    tripOds.select("type")
      .join(broadcast(typeIds.select("type", "type_id")), Seq("type"))
      .select(col("type_id"), col("type").as("name"))
      .distinct()

  /** dim_attraction_type: chained left joins where the second ON is a
    * theta-style equality across different column names
    * (`trip.type = dim_type.name` — SURVEY §2.4 J3), null type_ids
    * filtered, distinct pairs. */
  def attractionTypeDim(hashtagDim: DataFrame, tripOds: DataFrame,
                        typeDim: DataFrame): DataFrame =
    hashtagDim.select("name", "attraction_id")
      .join(tripOds.select("name", "type").distinct(), Seq("name"), "left")
      .join(broadcast(typeDim.select(col("type_id"),
          col("name").as("__type_name"))),
        col("type") === col("__type_name"), "left")
      .filter(col("type_id").isNotNull)
      .select("attraction_id", "type_id")
      .distinct()

  /** dim_attraction_detail: hashtag names left-joined to the trip ods
    * detail columns, with the reference's DELETE×19 batch folded in as
    * an exclusion list (`… AND info IS NULL` rows for the listed ids —
    * `create_dim_attraction_detail.py:123-199`). */
  def attractionDetailDim(hashtagDim: DataFrame, tripOds: DataFrame,
                          deleteIds: Seq[String]): DataFrame = {
    val base = hashtagDim.select("name", "attraction_id")
      .join(tripOds.select("name", "info", "photo_url").distinct(),
        Seq("name"), "left")
      .select("attraction_id", "info", "photo_url")
      .distinct()
    Mutations.deleteWhere(base,
      col("attraction_id").isin(deleteIds: _*) && col("info").isNull)
  }

  // ===================================================================
  // CWA monthly weather → weather_history
  // (reference `weatherINFO/a1-2.ipynb` cells 14-17; target star table
  // `sql/init.sql:100-112`)
  // ===================================================================

  /** Measure columns as scraped (units embedded in headers). */
  val weatherMeasures: Seq[String] = Seq(
    "Minimum AirTemperature (˚C)", "Maximum AirTemperature (˚C)",
    "Mean AirTemperature (˚C)", "Accumulation Precipitation (mm)",
    "Minimum RelativeHumidity (%)", "Total SunshineDuration (hr)")

  /** The notebook's cleaning: project station + Year-Month + measures,
    * split "yyyy-MM" into year/month, numeric-coerce everything with
    * null-on-failure (`pd.to_numeric(errors='coerce')` → `try_cast`).
    * Trace values ("T") and sentinel dashes null out exactly like the
    * reference. */
  def weatherHistory(raw: DataFrame): DataFrame = {
    val projected = raw.select(
      (col("ID") +: col("Year-Month") +: weatherMeasures.map(col)): _*)
    val coerced = weatherMeasures.foldLeft(projected) { (df, m) =>
      df.withColumn(m, col(m).try_cast("double"))
    }
    coerced
      .withColumn("year",
        split(col("Year-Month"), "-").getItem(0).try_cast("int"))
      .withColumn("month",
        split(col("Year-Month"), "-").getItem(1).try_cast("int"))
  }

  // ===================================================================
  // Facebook posts normalization → Normalization_<place>_<date>.csv
  // (reference `fb_scraper/normalization.py:7-85`)
  // ===================================================================

  /** Normalize scraped fb posts: place + reference date parsed from the
    * source filename (F12), skip-rows dropped (null time, 在線上,
    * leading "+"), Chinese date strings resolved per [[ColFns.fbDate]]
    * (parse failures keep the row with a null created_at — exactly the
    * reference's except→None path). Output columns mirror
    * `normalization.py:70-81`. */
  def fbNormalize(raw: DataFrame, fileName: Column): DataFrame = {
    val pat = "postsInformation_(.+?)_(\\d{4}-\\d{2}-\\d{2})\\.csv$"
    raw
      .withColumn("place", regexp_extract(fileName, pat, 1))
      .withColumn("ref_date", regexp_extract(fileName, pat, 2).cast(DateType))
      .filter(col("time").isNotNull &&
        !col("time").contains("在線上") && !col("time").startsWith("+"))
      .withColumn("created_at", ColFns.fbDate(col("time"), col("ref_date")))
      .select(col("id"), col("attraction_id"),
        col("poster_name").as("author"),
        col("content").as("description"),
        col("post_link").as("url"),
        lit("fb").as("source_platform_id"),
        col("created_at"), col("place"))
  }
}
