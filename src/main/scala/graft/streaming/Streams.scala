package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface. The reference is all `@daily` batch
  * (SURVEY §2.11) — its incremental daily file drops map to file-source
  * streams with `Trigger.AvailableNow`; this module provides that shape
  * plus windowed/watermarked aggregation over the `events` table.
  */
object Streams {

  /** Stream the events parquet as a file source and run an hourly
    * windowed count/sum into an in-memory sink, synchronously
    * (AvailableNow processes the backlog then stops — the batch-parity
    * mode). Returns the materialized result. */
  def hourlyEventRollup(spark: SparkSession, sfDir: String,
                        queryName: String = "graft_stream_out"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file stream sources need a directory: stage the single parquet file
    val stage = new java.io.File("/root/repo/target/qtmp/st1_src")
    stage.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(stage.getAbsolutePath, "events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(stage.getAbsolutePath).schema
    val stream = spark.readStream.schema(schema)
      .parquet(stage.getAbsolutePath)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
