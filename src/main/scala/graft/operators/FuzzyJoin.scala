package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fuzzy best-match join — the reference's fuzzywuzzy
  * `process.extractOne` (`airflow/utils/common.py:22-28`): for every left
  * row, the right row whose string is closest to the left string.
  *
  * Implementation: broadcast the (small) right side, score every
  * candidate with a normalized Levenshtein similarity (built-in, codegen'd
  * — no UDF), keep the arg-max per left row via window `row_number`.
  * Ties break on the right string ascending so results are deterministic.
  *
  * Scale: the right side is a dimension (attraction names ≈ 1.5 k rows in
  * the reference) — broadcast × full scan is one shuffle-free pass over
  * the left table at any left-side scale. A large right side would need
  * blocking (e.g. [[Dedup.simhashBands]] keys) first.
  */
object FuzzyJoin {

  /** similarity in [0,1]: 1 − lev / max(len); both sides lowercased. */
  def levSimilarity(a: Column, b: Column): Column = {
    val la = lower(a); val lb = lower(b)
    lit(1.0d) - levenshtein(la, lb).cast(DoubleType) /
      greatest(length(la), length(lb), lit(1)).cast(DoubleType)
  }

  /** For each left row: the best-matching right row.
    * Output = left columns + `match_<rightKey>` + `match_score`. */
  def bestMatch(left: DataFrame, leftKey: String,
                right: DataFrame, rightKey: String): DataFrame = {
    val r = right.select(col(rightKey).as("__cand")).distinct()
    val scored = left.crossJoin(broadcast(r))
      .withColumn("match_score", levSimilarity(col(leftKey), col("__cand")))
    val w = Window.partitionBy(left.columns.map(col): _*)
      .orderBy(col("match_score").desc, col("__cand").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed("__cand", s"match_$rightKey")
      .withColumn("match_score", round(col("match_score"), 4))
  }
}
