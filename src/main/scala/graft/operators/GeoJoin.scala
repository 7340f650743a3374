package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ColFns

/** Grid-cell (geohash-style) blocked nearest-neighbor geo join — the
  * scale path for "nearest place to every point" (the reference domain
  * is mapped places; its gmaps pipeline carries lat/lng on every
  * attraction). The brute formulation (broadcast dim × every point,
  * window top-1) is O(|left|·|right|) — fine while the dim is small,
  * a scale-killer once it isn't. This is the geo analog of the IVF
  * cell blocking in [[Similarity.ivfTopK]] and the LSH band buckets in
  * [[Dedup.minhashPairs]]: bucket space, join on bucket, verify with
  * the exact distance.
  *
  * Plan shape: each RIGHT point registers in its own + 8 neighbor
  * cells (fan-out ×9 on the SMALL side); each left point probes only
  * its own cell — the big side is never exploded, never broadcast,
  * and shuffles once on the cell key (AQE broadcasts the exploded
  * right side when it fits). The per-left argmin is a map-side-partial
  * `min(struct(dist, id))` aggregation, not a window, so candidate
  * rows reduce before they shuffle.
  *
  * EXACTNESS: a 3×3 neighborhood provably contains the true nearest
  * neighbor only when that neighbor is within one cell's width. After
  * the grid pass, any left point whose best candidate is farther than
  * `cellDeg × kmPerDeg` (the km lower bound of one cell at the
  * worst-case latitude), or that found no candidate at all, falls back
  * to an exact brute pass — so the result equals the brute join on
  * every input, and cell size tunes performance, never correctness.
  * Tune `cellDeg` so a typical cell holds a handful of right points;
  * the fallback set is then empty or tiny.
  *
  * Longitude cells are MODULAR: the axis is divided into
  * `nLng = floor(360/cellDeg)` uniform cells of width `360/nLng`
  * (≥ cellDeg, dividing 360 exactly so the seam cell is never
  * narrower than the others), and neighbor offsets wrap with `pmod` —
  * the 3×3 neighborhood joins across ±180°, so a probe at lng 179.9°
  * sees candidates at −179.9°. Haversine itself is periodic in Δlng,
  * so the verify distance needs no special-casing.
  *
  * Limitation: `maxAbsLatDeg` must bound the data's |latitude| (the
  * km-per-degree-longitude lower bound degenerates toward the poles).
  */
object GeoJoin {

  /** For every left point, the nearest right point by haversine
    * distance (ties → smaller right id). Output: (<leftId>,
    * `nearest_id`, `dist_km`), distances unrounded.
    *
    * @param cellDeg       grid cell width in degrees (both axes)
    * @param maxAbsLatDeg  upper bound on |lat| across BOTH inputs;
    *                      used only for the provable-radius km bound
    * @param exactFallback when false, SKIP the brute re-resolve pass:
    *                      only grid-resolved rows return and far/lonely
    *                      left points silently drop. A diagnostic seam
    *                      so tests can prove the blocked path alone
    *                      finds the true neighbor (the exact fallback
    *                      would mask a broken cell mapping — e.g. a
    *                      non-wrapping antimeridian seam — as a silent
    *                      full-brute slowdown). Production callers keep
    *                      the default.
    */
  def nearest(left: DataFrame, lid: String, llat: String, llng: String,
              right: DataFrame, rid: String, rlat: String, rlng: String,
              cellDeg: Double = 0.5,
              maxAbsLatDeg: Double = 66.0,
              exactFallback: Boolean = true): DataFrame = {
    require(cellDeg > 0, "cellDeg must be positive")
    require(maxAbsLatDeg < 90.0, "maxAbsLatDeg must be < 90")
    val l = left.select(col(lid).as("__lid"),
      col(llat).cast("double").as("__llat"),
      col(llng).cast("double").as("__llng"))
    val r = right.select(col(rid).as("__rid"),
      col(rlat).cast("double").as("__rlat"),
      col(rlng).cast("double").as("__rlng"))

    // one degree of latitude is ≥ 110.5 km everywhere; one degree of
    // longitude is ≥ 111.0·cos(maxAbsLat) km on this data — any point
    // OUTSIDE the 3×3 block differs by > cellDeg in some axis, hence
    // is provably farther than safeKm away
    val kmPerDeg = math.min(110.5,
      111.0 * math.cos(math.toRadians(maxAbsLatDeg)))
    val safeKm = cellDeg * kmPerDeg

    val cx = (c: org.apache.spark.sql.Column) =>
      floor(c / cellDeg).cast("long")
    // modular longitude axis: nLng uniform cells of width 360/nLng
    // (≥ cellDeg, dividing 360 exactly, so the safe-radius bound below
    // holds for every cell including the one at the seam); lng = +180
    // lands on index nLng and pmod-wraps to 0, i.e. the same meridian
    // as −180
    val nLng = math.max(1L, math.floor(360.0 / cellDeg).toLong)
    val lngCell = 360.0 / nLng
    val cyBase = (c: org.apache.spark.sql.Column) =>
      floor((c + lit(180.0d)) / lngCell).cast("long")
    val cy = (c: org.apache.spark.sql.Column, dy: Int) =>
      pmod(cyBase(c) + dy, lit(nLng))
    // with < 3 longitude cells the wrapped ±1 offsets collide; shrink
    // the offset set so a right point never registers twice in one cell
    val dys = if (nLng >= 3) -1 to 1 else if (nLng == 2) 0 to 1 else 0 to 0
    val offsets = for (dx <- -1 to 1; dy <- dys) yield (dx, dy)
    val rCells = r.select(col("*"), explode(array(offsets.map {
        case (dx, dy) => struct(
          (cx(col("__rlat")) + dx).as("gx"),
          cy(col("__rlng"), dy).as("gy"))
      }: _*)).as("g"))
      .select(col("__rid"), col("__rlat"), col("__rlng"),
        col("g.gx").as("gx"), col("g.gy").as("gy"))
    val lCells = l
      .withColumn("gx", cx(col("__llat")))
      .withColumn("gy", cy(col("__llng"), 0))

    val best = lCells.join(rCells, Seq("gx", "gy"))
      .withColumn("__d", ColFns.haversineKm(col("__llat"), col("__llng"),
        col("__rlat"), col("__rlng")))
      .groupBy(col("__lid"))
      .agg(min(struct(col("__d"), col("__rid"))).as("b"))
      .select(col("__lid"), col("b.__d").as("__d"),
        col("b.__rid").as("__rid"))
    val hit = best.filter(col("__d") <= safeKm)

    // misses — no candidate in the 3×3 block, or a candidate beyond
    // the provable radius — re-resolve exactly against the full right
    // side; with a density-tuned cellDeg this set is empty or tiny
    val resolved = if (!exactFallback) hit else {
      val missed = l.join(hit.select("__lid"), Seq("__lid"), "left_anti")
      val brute = missed.crossJoin(broadcast(r))
        .withColumn("__d", ColFns.haversineKm(col("__llat"), col("__llng"),
          col("__rlat"), col("__rlng")))
        .groupBy(col("__lid"))
        .agg(min(struct(col("__d"), col("__rid"))).as("b"))
        .select(col("__lid"), col("b.__d").as("__d"),
          col("b.__rid").as("__rid"))
      hit.unionByName(brute)
    }

    resolved
      .select(col("__lid").as(lid), col("__rid").as("nearest_id"),
        col("__d").as("dist_km"))
  }
}
