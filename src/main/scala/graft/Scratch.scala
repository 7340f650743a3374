package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteTopK(q, emb, "vec_id", "embedding", k = 5).cache()
    def recallOf(approx: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val r = brute.as("b").join(approx.as("l"),
          col("b.query_id") === col("l.query_id") &&
            col("b.neighbor_id") === col("l.neighbor_id"), "left")
        .groupBy(col("b.query_id"))
        .agg((count(col("l.neighbor_id")) / 5.0d).as("recall"))
      r.agg(avg(col("recall")).as("avg"), min(col("recall")).as("min")).show()
      println(s"^ $name")
    }
    recallOf(Similarity.lshTopK(q, emb, "vec_id", "embedding", 5, planes = 4, tables = 8), "lsh")
    recallOf(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5, nlist = 16, nprobe = 4), "ivf nprobe=4")
    recallOf(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5, nlist = 16, nprobe = 4, trainIters = 2), "ivf nprobe=4 trained")
    spark.stop()
  }
}
