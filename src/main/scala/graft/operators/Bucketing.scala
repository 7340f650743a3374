package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) tables — the co-located-join primitive.
  *
  * Writing both sides of a recurring join bucketed by the join key and
  * with the same bucket count lets every subsequent join run with ZERO
  * shuffle on either side: Spark matches the output partitioning of the
  * bucketed scans to the join's required distribution. On a 1000-executor
  * cluster this turns the nightly fact⋈fact join from the dominant
  * all-to-all network stage into a map-side zip — you pay the shuffle
  * once at write time, then amortize it over every downstream run.
  *
  * Buckets are catalog metadata, so tables are registered via
  * `saveAsTable` with an explicit `path` (external) under the caller's
  * lake root; re-registration is idempotent.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table and return it. */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
                    path: String, key: String, buckets: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Equi-join two same-bucket-count tables on their bucket keys —
    * planner-verified shuffle-free when both sides are bucketed. */
  def colocatedJoin(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey))
}
