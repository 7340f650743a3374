package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the query surface on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Timing uses the noop sink so every query is fully materialized
  * (count() would let Catalyst prune most of the work). One untimed
  * warmup query amortizes JVM/codegen startup out of the numbers.
  *
  * Each query is timed twice and the minimum reported: the host is a
  * shared micro-VM with episodic multi-second pauses (observed: >90%
  * idle CPU while a sub-second query "takes" 30 s), and min-of-2 keeps
  * one unlucky pause from poisoning a query's number. CPU cost stays
  * bounded (~2× a single pass) and the min is still honest work — the
  * full pipeline runs both times.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: JVM + codegen + parquet footer caches (untimed)
    SparkEntry.queries("j4_mart_flagship")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      }
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = ordered.map { case (n, fn) => n -> timeOnce(n, fn) }.toMap
    val pass2 = ordered.map { case (n, fn) => n -> timeOnce(n, fn) }.toMap
    val results = ordered.map { case (n, _) =>
      val (a, b) = (pass1(n), pass2(n))
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
