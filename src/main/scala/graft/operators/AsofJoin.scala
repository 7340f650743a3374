package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — attach to each left row the payload of the
  * *latest* right row with the same key and time ≤ the left row's time
  * (left-outer semantics: unmatched left rows keep null payloads).
  *
  * The reference has no as-of join (SURVEY §2.4 — all joins are string
  * equi-joins); this is a beyond-parity operator for event-to-snapshot
  * enrichment at scale (e.g. "state of the customer's last order at
  * event time").
  *
  * Scale shape: the classic union + keyed-window formulation —
  *  1. union left probes and right states on (key, time),
  *  2. one shuffle: `Window.partitionBy(key).orderBy(time, side)`,
  *  3. `last(payload, ignoreNulls)` carries the most recent right
  *     payload forward onto each probe row.
  * Cost is a single hash shuffle + per-partition sort — linear, no
  * range cross-product, no per-key driver loop; skew behaves exactly
  * like any keyed window (salt upstream if one key dominates).
  *
  * Ties: a right row at exactly the probe time wins (sorted before the
  * probe via the side flag). Multiple right rows on the same (key,
  * time) are ambiguous — pre-dedup the right side (e.g.
  * [[Dedup.keepLast]]) for deterministic output.
  */
object AsofJoin {

  /** @param payload right-side columns to carry onto each left row */
  def backward(left: DataFrame, lKey: String, lTime: String,
               right: DataFrame, rKey: String, rTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(lKey)).withColumn("__t", col(lTime))
      .withColumn("__side", lit(1)) // probes sort after states at equal time
      .select((Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) ++ payload.map(c => lit(null).as(c))): _*)
    val r = right
      .withColumn("__k", col(rKey)).withColumn("__t", col(rTime))
      .withColumn("__side", lit(0))
      .select((Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).as(c)) ++ payload.map(col)): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Nearest as-of join — attach the right row whose time is CLOSEST
    * to each left row's, in either direction ("the purchase nearest
    * this click"). Same union + keyed-window shape as [[backward]], run
    * in both frame directions in ONE shuffle: the backward frame
    * carries the latest state at/before the probe, the forward frame
    * the earliest state strictly after it, and a row-local comparison
    * of the two deltas picks the winner (ties prefer backward; equal
    * state times resolve by `tiebreak` — max for backward, min for
    * forward — so output is deterministic without pre-dedup).
    *
    * Emits the payload columns plus `delta_us` (signed right−left
    * micros, null when the key has no right rows). Times must be
    * timestamps. */
  def nearest(left: DataFrame, lKey: String, lTime: String,
              right: DataFrame, rKey: String, rTime: String,
              payload: Seq[String], tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val pcols = (payload :+ tiebreak).distinct
    val l = left
      .withColumn("__k", col(lKey)).withColumn("__t", col(lTime))
      .withColumn("__side", lit(1))
      .select((Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) ++
        pcols.map(c => lit(null).as(s"__p_$c")) :+
        lit(null).cast("timestamp").as("__st")): _*)
    val r = right
      .withColumn("__k", col(rKey)).withColumn("__t", col(rTime))
      .withColumn("__side", lit(0))
      .select((Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).as(c)) ++
        pcols.map(c => col(c).as(s"__p_$c")) :+
        col(rTime).cast("timestamp").as("__st")): _*)
    val ord = Seq(col("__t"), col("__side"), col(s"__p_$tiebreak"))
    val wb = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = pcols.foldLeft(
      l.unionByName(r)
        .withColumn("__pt", last(col("__st"), ignoreNulls = true).over(wb))
        .withColumn("__nt", first(col("__st"), ignoreNulls = true).over(wf))) {
      (df, c) =>
        df.withColumn(s"__prev_$c",
            last(when(col("__side") === 0, col(s"__p_$c")),
              ignoreNulls = true).over(wb))
          .withColumn(s"__next_$c",
            first(when(col("__side") === 0, col(s"__p_$c")),
              ignoreNulls = true).over(wf))
    }
    val takePrev = col("__nt").isNull || (col("__pt").isNotNull &&
      (unix_micros(col("__t")) - unix_micros(col("__pt"))) <=
        (unix_micros(col("__nt")) - unix_micros(col("__t"))))
    val out = both.filter(col("__side") === 1)
      .withColumn("delta_us",
        when(takePrev, unix_micros(col("__pt")) - unix_micros(col("__t")))
          .otherwise(unix_micros(col("__nt")) - unix_micros(col("__t"))))
    payload.foldLeft(out) { (df, c) =>
      df.withColumn(c,
        when(takePrev, col(s"__prev_$c")).otherwise(col(s"__next_$c")))
    }.select((leftCols ++ payload :+ "delta_us").map(col): _*)
  }
}
