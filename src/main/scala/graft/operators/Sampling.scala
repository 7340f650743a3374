package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling.
  *
  * `df.sample(fraction)` is seed-stable only within one Spark version
  * and partition layout; a training-data pipeline needs samples that are
  * (a) reproducible across reruns and cluster sizes, (b) auditable — a
  * row's membership is a pure function of its key, and (c) cheap — no
  * shuffle, no count pass. Hashing the key and keeping rows below a
  * threshold gives all three: the md5 of the key is uniform, so keeping
  * `m` of the 16 first-nibble values yields an m/16 sample of each
  * stratum independent of row order, partitioning, or engine.
  *
  * This is the per-row filter a 100 TB scan wants: fully pushed into the
  * scan stage, codegen'd, embarrassingly parallel.
  */
object Sampling {

  private val nibbles = "0123456789abcdef"

  /** Keep rows whose md5(key) first nibble < m — an m/16 deterministic
    * sample. `key` should be a stable unique id (cast to string). */
  def hashSample(df: DataFrame, key: Column, m: Int): DataFrame = {
    require(m >= 0 && m <= 16, s"m must be in [0,16], got $m")
    df.filter(substring(md5(key.cast("string")), 1, 1)
      .isin(nibbles.take(m).map(_.toString): _*))
  }

  /** Stratified variant: the nibble is drawn from md5(stratum || '|' ||
    * key), so each stratum is sampled at m/16 independently — a skewed
    * stratum cannot starve the others of hash space. */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
                           m: Int): DataFrame = {
    require(m >= 0 && m <= 16, s"m must be in [0,16], got $m")
    df.filter(
      substring(md5(concat(stratum.cast("string"), lit("|"),
        key.cast("string"))), 1, 1)
        .isin(nibbles.take(m).map(_.toString): _*))
  }
}
