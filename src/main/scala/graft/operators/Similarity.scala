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

  /** LSH-bucketed ANN: corpus and queries sketched into sign buckets,
    * candidates scored only within matching buckets, then per-query
    * top-k. Recall < 1 by construction; the bucket-join shuffle replaces
    * the cross product. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorExprs.norm(col(vecCol)).as("qn"),
      signBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorExprs.norm(col(vecCol)).as("cn"),
      signBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        VectorExprs.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    scoreAndRank(scored, k)
  }
}
