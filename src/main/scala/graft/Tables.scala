package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver's synthetic lake (TESTDATA.md).
  *
  * One parquet file per table under `\$sfDir/`. Mirrors the reference's
  * layered-warehouse table access (`airflow/utils/config.yml:12-17`,
  * `airflow/utils/gcp.py:222-238`) as plain `spark.read.parquet` +
  * temp views — schema-on-read external tables, Spark-side.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table. `events.ts` is nanosecond-precision INT64 in the
    * parquet footer, which Spark only reads via the nanosAsLong legacy
    * conf; we convert back to a proper timestamp column (microsecond
    * truncation — the driver's DuckDB oracle sees identical values for
    * every derived date/hour/minute expression).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a temp view (SURVEY §2 S7/S15/S16: external
    * table over a blob glob + SQL over it). */
  def createViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
