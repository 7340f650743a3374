package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** VERSION-KEYED standing-state ledgers — the shared persistence form
  * behind every "train once, consumers read standing state" operator
  * (x97b/x98b's classifier model, x104b's tokenizer merge table,
  * st19's frozen stream model): a bundle of named parquet relations
  * plus a `meta` relation carrying the producing RECIPE's version
  * string.
  *
  * The version contract is what makes standing state safe to share:
  * consumers name the version they were built against, [[read]]
  * fails fast on a mismatch, and callers derive the ledger PATH from
  * the version too — so a recipe change moves the state aside
  * instead of letting a consumer silently score against weights (or
  * encode against merges) trained under different rules.
  *
  * Write order: INVALIDATE `meta` first, then data parts, then
  * re-stamp `meta` LAST — a reader that finds a valid meta sees
  * complete parts, and during a same-version rewrite no valid meta
  * coexists with partially-rewritten parts (the window a
  * meta-last-only discipline leaves open: overwrite deletes part
  * files while the previous meta still validates). Single-WRITER
  * discipline still applies — two concurrent trainers need a table
  * format's atomic metadata pointer, per Lake.compact's notes — but
  * the invalidate-first order makes the reader side safe against one
  * writer's rewrite. All filesystem probes go through Hadoop
  * `FileSystem` (the Lake.scala idiom), so the guard works on local
  * disk, HDFS, or any object store with a Hadoop connector — the
  * lakes the 100 TB story assumes. All state here is KB-to-MB model
  * artifacts; at 100 TB the corpus never flows through this surface,
  * only the distilled model state does.
  */
object VersionedState {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Persist `parts` (name → relation) under `path`, stamping
    * `version` last. Any previous meta is deleted FIRST, so a
    * concurrent reader can never validate against mid-rewrite parts;
    * deterministic producers (the fixed-point training discipline)
    * make redelivery byte-identical, so overwrite-on-rewrite is
    * idempotent. */
  def write(path: String, version: String,
            parts: (String, DataFrame)*): Unit = {
    require(parts.nonEmpty, "VersionedState.write: no parts")
    require(!parts.exists(_._1 == "meta"),
      "VersionedState.write: 'meta' is reserved for the version stamp")
    val spark = parts.head._2.sparkSession
    val metaDir = new Path(s"$path/meta")
    val f = fs(spark, metaDir)
    if (f.exists(metaDir)) f.delete(metaDir, true) // invalidate first
    parts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$path/$name")
    }
    spark.range(1)
      .select(lit(version).as("version"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** True when a COMPLETE bundle of exactly `version` exists at
    * `path` — the S10 exists-guard (meta is written last, so its
    * presence implies the parts landed). Probes via Hadoop
    * `FileSystem`, not `java.io.File`, so the guard is live on
    * HDFS/S3 ledger paths too — a local-only probe would read false
    * there and silently retrain on every call.
    *
    * CONCURRENCY caveat (the single-writer contract, stated where
    * guards are written): between [[write]]'s meta-invalidate and its
    * re-stamp, this reads false, so a concurrent exists-guarded
    * caller (standingQualityModel / standingAnnIndex style) can start
    * a DUPLICATE build racing the in-flight one. Deterministic
    * producers make the duplicate byte-identical (wasted work, not
    * corruption), but cross-process first-caller dedup needs a table
    * format's atomic metadata pointer — per Lake.compact's notes. */
  def exists(spark: SparkSession, path: String,
             version: String): Boolean = {
    val meta = new Path(s"$path/meta/_SUCCESS")
    fs(spark, meta).exists(meta) && {
      val rows = spark.read.parquet(s"$path/meta").collect()
      rows.nonEmpty && rows(0).getString(0) == version
    }
  }

  /** Read one named part back, failing fast unless the persisted
    * version is exactly what the caller expects. */
  def read(spark: SparkSession, path: String, version: String,
           part: String): DataFrame = {
    val rows = spark.read.parquet(s"$path/meta").collect()
    require(rows.nonEmpty && rows(0).getString(0) == version,
      s"VersionedState: ledger at $path has version " +
        s"'${rows.headOption.map(_.getString(0)).getOrElse("<none>")}'" +
        s" but this build expects '$version' — rebuild (derive the " +
        "ledger path from the version to make this unreachable)")
    spark.read.parquet(s"$path/$part")
  }
}
