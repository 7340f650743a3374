package graft.sources

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
  * Write order: data parts first, `meta` LAST — a reader that finds
  * a valid meta sees complete parts (single-writer discipline;
  * concurrent-writer regimes need a table format's metadata pointer,
  * per Lake.compact's notes). All state here is KB-to-MB model
  * artifacts; at 100 TB the corpus never flows through this surface,
  * only the distilled model state does.
  */
object VersionedState {

  /** Persist `parts` (name → relation) under `path`, stamping
    * `version` last. Deterministic producers (the fixed-point
    * training discipline) make redelivery byte-identical, so
    * overwrite-on-rewrite is idempotent. */
  def write(path: String, version: String,
            parts: (String, DataFrame)*): Unit = {
    require(parts.nonEmpty, "VersionedState.write: no parts")
    require(!parts.exists(_._1 == "meta"),
      "VersionedState.write: 'meta' is reserved for the version stamp")
    parts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$path/$name")
    }
    parts.head._2.sparkSession.range(1)
      .select(lit(version).as("version"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** True when a COMPLETE bundle of exactly `version` exists at
    * `path` — the S10 exists-guard (meta is written last, so its
    * presence implies the parts landed). */
  def exists(spark: SparkSession, path: String,
             version: String): Boolean = {
    val meta = new java.io.File(s"$path/meta", "_SUCCESS")
    meta.exists() && {
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
