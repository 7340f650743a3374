package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorExprs

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — LLM-pipeline surface (BASELINE.json north star).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k via broadcast of the (small) query
  *    set against the full corpus — one scan of the corpus, no corpus
  *    shuffle; the right plan when |queries| ≪ |corpus| even at 100 TB.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing (sign sketch) so only
  *    same-bucket candidates are scored — the scale path when the query
  *    set itself is large. Hyperplane coefficients derive from
  *    xxhash64(plane, dim): deterministic, no driver-side randomness.
  *
  * Norms are precomputed per row; the per-pair dot product is the native
  * codegen'd [[graft.functions.DotProduct]] expression. cos =
  * dot/(norm_q*norm_c), arithmetically identical to the naive form (and
  * the DuckDB oracle).
  */
object Similarity {

  /** Deterministic ±1 hyperplane coefficient for (plane j, dimension i). */
  private def coef(j: Column, i: Column): Column =
    when(pmod(xxhash64(j, i), lit(2)) === 0, 1.0d).otherwise(-1.0d)

  /** Sign-sketch bucket id over `planes` random hyperplanes. */
  def signBucket(vec: Column, planes: Int = 8): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), j => {
        val dotj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast(DoubleType) * coef(j, i)),
          lit(0.0d), (acc, v) => acc + v)
        struct(j.as("j"), when(dotj >= 0, 1L).otherwise(0L).as("bit"))
      }),
      lit(0L),
      (acc, s) => acc + s.getField("bit") * pow(lit(2.0d),
        s.getField("j").cast(DoubleType)).cast(LongType))

  private def scoreAndRank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Exact top-k neighbors for each query vector (cosine, descending;
    * ties broken by ascending corpus id for determinism). `queries` and
    * `corpus` both expose (`idCol`, `vecCol`). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame,
                idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorExprs.norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorExprs.norm(col(vecCol)).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        VectorExprs.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    scoreAndRank(scored, k)
  }

  /** Sign-sketch bucket for LSH table `t` (each table uses a disjoint
    * slice of the hyperplane family: planes t*b .. t*b+b-1). */
  private def tableBucket(vec: Column, t: Column, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), j => {
        val plane = t * planes + j
        val dotj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast(DoubleType) * coef(plane, i)),
          lit(0.0d), (acc, v) => acc + v)
        struct(j.as("j"), when(dotj >= 0, 1L).otherwise(0L).as("bit"))
      }),
      lit(0L),
      (acc, s) => acc + s.getField("bit") * pow(lit(2.0d),
        s.getField("j").cast(DoubleType)).cast(LongType))

  /** Multi-table LSH ANN: `tables` independent sign sketches of `planes`
    * hyperplanes each; a candidate pair only needs to collide in ONE
    * table (the standard OR-amplification), so recall rises steeply with
    * `tables` while each table's bucket join stays selective. Candidates
    * are deduped before scoring; the bucket joins replace the cross
    * product — the only shuffles that scale with corpus size. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 8, tables: Int = 4): DataFrame = {
    def sketch(df: DataFrame, id: String, vec: String, n: String) = df
      .select(col(idCol).as(id), col(vecCol).as(vec),
        VectorExprs.norm(col(vecCol)).as(n),
        // outer: `tables`-length array is never empty; the non-outer
        // form's inferred guard would re-run every table's projection
        posexplode_outer(transform(sequence(lit(0), lit(tables - 1)),
          t => tableBucket(col(vecCol), t, planes)))
          .as(Seq("table", "bucket")))
    val q = sketch(queries, "query_id", "qv", "qn")
    val c = sketch(corpus, "neighbor_id", "cv", "cn")
    val scored = c.join(q, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "qn", "cv", "cn")
      .dropDuplicates("query_id", "neighbor_id")   // OR across tables
      .withColumn("cos_sim",
        VectorExprs.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    scoreAndRank(scored, k)
  }

  /** Fixed-point (×1e7, half-up) quantization of a float vector to
    * longs — the shared exactness primitive behind [[assignCells]],
    * the x44 centroid means, and the x45 Lloyd step: integer sums and
    * L2² distances can never drift by float ulps across engines. */
  def quantize1e7(vec: Column): Column =
    transform(vec, v => floor(v.cast("double") * 1e7d + 0.5d).cast("long"))

  /** Exact-arithmetic centroid-cell assignment: vectors and the k seed
    * centroids (the first `k` ids) quantize to ×1e7 longs; L2²
    * distances are exact integer sums, so the argmin is deterministic
    * (ties break by centroid id). Broadcast centroids × one scan.
    * Returns (cid, `idName`, `vecName`) — input columns pass through. */
  def assignCells(df: DataFrame, idName: String, vecName: String,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qv = df.select(col(idName), col(vecName),
      quantize1e7(col(vecName)).as("__qv"))
    val cents = qv.filter(col(idName) < k)
      .select(col(idName).as("cid"), col("__qv").as("__cv"))
    qv.crossJoin(broadcast(cents))
      .withColumn("__d2", aggregate(
        zip_with(col("__qv"), col("__cv"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(idName))
          .orderBy(col("__d2").asc, col("cid").asc)))
      .filter(col("__rk") === 1)
      .select(col("cid"), col(idName), col(vecName))
  }

  /** Per-vector symmetric int8 quantization — the memory/IO scale lever
    * for 100 TB embedding stores (4× smaller than float32, dot products
    * stay SIMD-friendly). scale = 127/max|x|; q_i = floor(x_i·scale+0.5)
    * (explicit half-up so any engine reproduces it bit-for-bit —
    * `round()` rounding modes differ across engines). Returns
    * (q: array<int>, scale: double); dequantize ≈ q/scale. */
  def quantizeInt8(vec: Column): Column = {
    val absMax = array_max(transform(vec, v => abs(v.cast(DoubleType))))
    val scale = when(absMax === 0.0d, lit(1.0d)).otherwise(lit(127.0d) / absMax)
    struct(
      transform(vec, v =>
        floor(v.cast(DoubleType) * scale + 0.5d).cast(IntegerType)).as("q"),
      scale.as("scale"))
  }

  /** Max reconstruction error |x − q/scale| of a quantized vector
    * against its source — the quality bound a pipeline asserts. */
  def dequantError(vec: Column, quant: Column): Column =
    array_max(zip_with(vec, quant.getField("q"),
      (x, q) => abs(x.cast(DoubleType) -
        q.cast(DoubleType) / quant.getField("scale"))))

  /** IVF (inverted-file) ANN — the other classic scale path: a coarse
    * quantizer splits the corpus into `nlist` cells; each query probes
    * only its `nprobe` nearest cells.
    *
    *  - Centroids: the `nlist` corpus vectors with the smallest
    *    xxhash64(id) — a deterministic uniform sample, no driver-side
    *    randomness, no iterative k-means (good enough as a coarse
    *    quantizer; swappable for trained centroids).
    *  - Assignment: one broadcast pass over the corpus, cell = argmax
    *    cosine vs centroids (`max(struct(cos, id))` — no window shuffle).
    *  - Search: probe lists meet assigned cells in a hash join on
    *    cell id — the only shuffle that scales with corpus size.
    *
    * With nprobe = nlist this degenerates to exact brute force (every
    * cell probed), which the test suite uses as an equivalence oracle
    * — a property independent of how the centroids were obtained, so
    * it also pins the trained-centroid path.
    *
    * `trainIters` > 0 runs that many Lloyd (k-means) refinement steps
    * on the hash-sampled seeds: assign corpus vectors to their nearest
    * centroid, recompute each cell's elementwise mean. Each step is
    * one broadcast assignment pass + one (cell, dimension) aggregation
    * — at 100 TB train on a `sample()` of the corpus instead (the
    * centroids only need to see the distribution, not every row). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              trainIters: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorExprs.norm(col(vecCol)).as("cn"))
    val seeds = c
      .withColumn("__h", xxhash64(col("neighbor_id")))
      .orderBy(col("__h"), col("neighbor_id")).limit(nlist)
      .select(col("neighbor_id").as("cent_id"), col("cv").as("cent_v"),
        col("cn").as("cent_n"))
    val cents = (1 to trainIters).foldLeft(seeds) { (cur, _) =>
      val assigned = c.join(broadcast(cur))
        .groupBy(col("neighbor_id"))
        .agg(max(struct(
            (VectorExprs.dot(col("cv"), col("cent_v")) /
              (col("cn") * col("cent_n"))).as("cos"),
            col("cent_id"))).getField("cent_id").as("cell"),
          first(col("cv")).as("cv"))
      // elementwise mean per cell: explode to (cell, pos, v), average,
      // reassemble position-sorted — empty cells drop (fewer, denser
      // cells is fine for a coarse quantizer)
      assigned
        .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cell").as("cent_id"),
          transform(col("pm"), e => e.getField("m").cast("float"))
            .as("cent_v"))
        .withColumn("cent_n", VectorExprs.norm(col("cent_v")))
    }
    def centCos(v: Column, n: Column): Column =
      VectorExprs.dot(v, col("cent_v")) / (n * col("cent_n"))
    val assigned = c.join(broadcast(cents))
      .groupBy(col("neighbor_id"))
      .agg(max(struct(centCos(col("cv"), col("cn")).as("cos"),
          col("cent_id"))).getField("cent_id").as("cell"),
        first(col("cv")).as("cv"), first(col("cn")).as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorExprs.norm(col(vecCol)).as("qn"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("probe_cos").desc, col("cent_id").asc)
    val probes = q.join(broadcast(cents))
      .withColumn("probe_cos", centCos(col("qv"), col("qn")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"),
        col("cent_id").as("cell"))
    val scored = assigned.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        VectorExprs.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    scoreAndRank(scored, k)
  }
}
