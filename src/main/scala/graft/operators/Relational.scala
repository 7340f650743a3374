package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / filter / rename helpers (SURVEY §2.2): the reference's
  * pandas column surgery as tolerant, pure DataFrame transforms.
  */
object Relational {

  /** Drop a fixed column set, tolerating absent columns (reference
    * `d_gmaps_places_src_to_ods.py:71-94` catches missing-col errors). */
  def dropCols(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.contains)
    df.drop(present: _*)
  }

  /** Drop columns whose *name* matches a regex (reference `^Unnamed`
    * drop, `tripadvisor/d_tripadvisor_src_to_ods.py:45-48`). */
  def dropColsRegex(df: DataFrame, pattern: String): DataFrame =
    df.select(df.columns.filterNot(_.matches(pattern)).toIndexedSeq.map(col): _*)

  /** Bulk rename (reference zh→en maps,
    * `tripadvisor/d_tripadvisor_src_to_ods.py:51-63`). */
  def renameAll(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** Add an overwritten column while keeping the original under
    * `<name>_raw` (reference place_id handling,
    * `d_gmaps_places_src_to_ods.py:62-69`). */
  def overwriteKeepRaw(df: DataFrame, name: String, value: Column): DataFrame =
    df.withColumn(s"${name}_raw", col(name)).withColumn(name, value)

  /** Deterministic pseudo-random shuffle (reference `sample(frac=1)`
    * de-skew, `d_gmaps_crawler_to_src.py:49` — seeded here so reruns are
    * stable and a SQL oracle can reproduce the order). */
  def deterministicShuffle(df: DataFrame, keyCol: Column): DataFrame =
    df.orderBy(md5(keyCol.cast("string")), keyCol)

  /** Skew-resistant equi-join: salt the skewed (left) side's key into
    * `salt` sub-keys and replicate the build (right) side once per salt
    * value, so one hot key spreads over `salt` shuffle partitions
    * instead of hot-spotting one reducer.
    *
    * Inner equi-join semantics are unchanged: every (l, r) key match
    * meets in exactly one salted bucket. This is the manual fallback
    * for when AQE skew-join can't kick in (e.g. the skew is in a
    * grouping key feeding the join, or AQE is off); prefer plain joins
    * + AQE where possible. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
