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

  /** Read one table. `events.ts` has shipped in two physical forms
    * across driver testdata generations — nanosecond-precision INT64
    * (readable only as a long via the nanosAsLong legacy conf) and
    * plain `timestamp[us]` (read natively as TIMESTAMP_NTZ) — so the
    * normalization is schema-driven, not hardcoded: whatever the
    * footer says, callers always see one session-zone (UTC) timestamp
    * column with microsecond values identical to what the driver's
    * DuckDB oracle derives for every date/hour/minute expression.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.withColumn("ts", normalizeTs(raw, "ts"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Normalize an event-time column to session-zone TimestampType
    * regardless of the physical form it was written in (INT64 nanos →
    * micros truncation; TIMESTAMP_NTZ → session-zone cast, identity
    * under the UTC sessions every entrypoint builds). */
  def normalizeTs(df: DataFrame, colName: String): org.apache.spark.sql.Column =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr(s"$colName div 1000"))
      case _ => col(colName).cast("timestamp")
    }

  /** Register every table as a temp view (SURVEY §2 S7/S15/S16: external
    * table over a blob glob + SQL over it). */
  def createViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
