package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-in-interval (range/banded) join.
  *
  * Spark's built-in planner can only execute `l.point >= r.lo AND
  * l.point < r.hi` as a broadcast-nested-loop (or sort-merge over a
  * non-equi condition) — every left row tested against every interval.
  * The classic scale rewrite is *bucketing*: quantize the value domain
  * with a fixed `step`, explode each interval into the buckets it
  * covers, tag each point with its bucket, equi-join on the bucket key,
  * and re-check the exact predicate as a residual filter.
  *
  * Shape at 100 TB: one hash shuffle of the point side on a uniform
  * bucket key (or a broadcast when the exploded interval side is small,
  * as dimension-style band tables are), instead of an O(|L|·|R|)
  * nested loop. Bucket explosion is bounded by ceil(span/step)+1 rows
  * per interval, so `step` trades shuffle width against join fan-in —
  * pick it near the median interval width.
  *
  * Semantics: intervals are half-open `[lo, hi)`; rows whose point
  * matches no interval are dropped (inner).
  */
object RangeJoin {

  /** Inner point-in-interval join of `left.pointCol` into
    * `right.[loCol, hiCol)`, bucketed with width `step`. The interval
    * side is broadcast when `broadcastRight` (the common dimension-band
    * case); set it false to hash-shuffle both sides on the bucket key. */
  def bucketed(left: DataFrame, pointCol: String,
               right: DataFrame, loCol: String, hiCol: String,
               step: Double, broadcastRight: Boolean = true): DataFrame = {
    require(step > 0, s"bucket step must be positive, got $step")
    val lb = left.withColumn("__bucket",
      floor(col(pointCol).cast(DoubleType) / step))
    // interval [lo, hi) covers buckets floor(lo/step) .. floor(hi/step);
    // the last bucket is included only when hi doesn't sit exactly on a
    // bucket boundary (half-open upper bound).
    val hiBucket = when(
      col(hiCol).cast(DoubleType) === floor(col(hiCol) / step) * step,
      floor(col(hiCol) / step) - 1).otherwise(floor(col(hiCol) / step))
    val rb = right
      .withColumn("__bucket",
        explode(sequence(floor(col(loCol).cast(DoubleType) / step),
          greatest(hiBucket, floor(col(loCol).cast(DoubleType) / step)))))
    val rside = if (broadcastRight) broadcast(rb) else rb
    lb.join(rside, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
