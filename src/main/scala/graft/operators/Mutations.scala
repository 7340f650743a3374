package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** DML emulation over immutable parquet tables (SURVEY §2.10): the
  * reference's BigQuery `UPDATE` / `INSERT … WHERE NOT IN` / `DELETE`
  * batches (`create_dim_attraction_hashtag.py:134-191`,
  * `create_dim_attraction_detail.py:123-199`) re-expressed as
  * deterministic read → transform → overwrite rewrites.
  *
  * Scale notes: each rewrite is one pass over the table — a narrow
  * projection for update/delete, one anti-join shuffle for
  * insert-missing. Repair maps are broadcast-sized by construction
  * (hand-written rule lists). Folding these into the upstream build
  * (same final table, no second pass) stays the preferred shape; these
  * operators exist for when the target is already materialized.
  */
object Mutations {

  /** M1 — `UPDATE target SET col=v, … WHERE cond`: conditional column
    * rewrite (reference's ×13 synonym-id repair). */
  def updateWhere(df: DataFrame, cond: Column,
                  assignments: Map[String, Column]): DataFrame =
    assignments.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, when(cond, v).otherwise(col(c)))
    }

  /** M1 variant — key→value repair map on one column (the reference's
    * literal UPDATE-per-name list as data). */
  def repairByKey(df: DataFrame, keyCol: String, valueCol: String,
                  repairs: Map[String, String]): DataFrame = {
    val m = map(repairs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    df.withColumn(valueCol, coalesce(element_at(m, col(keyCol)), col(valueCol)))
  }

  /** M2 — `INSERT INTO target SELECT … FROM source WHERE key NOT IN
    * (SELECT key FROM target)`: left-anti join + union. */
  def insertMissing(target: DataFrame, source: DataFrame,
                    keys: Seq[String]): DataFrame =
    target.unionByName(source.join(target, keys, "left_anti"))

  /** M3 — `DELETE FROM target WHERE cond`: filter-out rewrite. Null
    * predicate rows are kept (SQL DELETE only removes WHERE=true). */
  def deleteWhere(df: DataFrame, cond: Column): DataFrame =
    df.filter(!coalesce(cond, lit(false)))

  /** Atomic overwrite for rewrite cycles (§7.4): materialize to a temp
    * dir, then swap into place, so a failed rewrite never destroys the
    * target. Reruns are idempotent. */
  def overwriteAtomic(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    val fs = target.getFileSystem(hconf)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"atomic swap failed: $tmp -> $target")
  }
}
