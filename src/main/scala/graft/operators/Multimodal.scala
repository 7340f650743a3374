package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with partition-wise batch decode /
  * feature-extraction. The Spark-side shape (schema, batching,
  * partitioning) is real, and so is image decoding: [[decode]] probes
  * real width/height from PNG/JPEG/GIF/BMP payloads with the JDK's
  * ImageIO (header-only, no raster decode). Payloads that are not a
  * decodable image — and the audio/video kinds, which have no JDK
  * codec — fall back to deterministic md5-derived dimensions, and the
  * 8-float feature vector is always an md5 fingerprint (no embedding
  * model ships in a JDK); both are reproducible by any engine with
  * md5(), which is what the oracle contract checks. Swap
  * `fingerprintFeatures` for a model-backed extractor (JNI / FFmpeg /
  * ONNX) without touching the plumbing.
  */
object Multimodal {

  /** One decoded media row. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      feat_hash: Long, width: Int, height: Int, feature: Array[Float])

  /** Canonical media schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType), StructField("n_bytes", LongType))))))

  /** Wrap any (id, string) table as a media table — payload = utf-8
    * bytes. Stands in for reading real image/audio blobs. */
  def asMedia(df: DataFrame, id: String, data: String, kind: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(
      col(id).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      encode(col(data), "UTF-8").as("payload"),
      struct(lit("synthetic").as("source"),
        length(col(data)).cast(LongType).as("n_bytes")).as("meta"))

  // ---- fingerprint fallback ------------------------------------------
  // Deterministic features derived from the portable 60-bit md5 hash of
  // the payload (first 15 hex digits — the same value any engine's
  // md5() yields, so the DuckDB oracle can recompute every derived
  // column). Used for dimensions only when the payload is not a
  // decodable image; always used for the feature vector.
  private def fingerprintFeatures(md: java.security.MessageDigest, id: Long,
                           kind: String, bytes: Array[Byte]): MediaFeatures = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    md.reset()
    val digest = md.digest(b)
    // top 60 bits of the md5 = first 15 hex digits, kept positive
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h = h >>> 4
    val feat = Array.tabulate(8) { k =>
      java.lang.Math.floorMod(h ^ (0x9e3779b97f4a7c15L * (k + 1)), 1000L)
        .toFloat / 1000.0f
    }
    MediaFeatures(id, kind, b.length, h, 1 + (h % 640).toInt,
      1 + ((h >> 7) % 480).toInt, feat)
  }

  /** Real image dimensions from the payload header via the JDK's
    * ImageIO: format sniff + header read only (`reader.getWidth(0)`
    * never decodes the raster), so probing is cheap even for large
    * blobs. None when no installed reader recognizes the bytes. */
  private def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
          finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Partition-wise batch decode (the `mapInPandas` analog: one
    * iterator per partition, so per-batch init — digest instance,
    * codec registry, a real model's JNI context — amortizes across
    * rows). `image` payloads that ImageIO recognizes get their REAL
    * width/height; everything else keeps the md5-derived fallback. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init: one digest; ImageIO's reader
        // registry is JVM-wide and thread-safe
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, kind, bytes) =>
          val f = fingerprintFeatures(md, id, kind, bytes)
          if (kind == "image")
            imageDims(bytes) match {
              case Some((w, h)) => f.copy(width = w, height = h)
              case None => f
            }
          else f
        }
      }
  }

  /** Aspect-preserving resize metadata: fit (width, height) within
    * maxDim × maxDim, never upscale. Pure column arithmetic over the
    * decoded dims — a real resizer would also transform the pixels; the
    * geometry (what a pipeline joins/filters on) is exact. Rounding is
    * explicit half-up (`floor(x + 0.5)`) rather than `round()`: engines
    * disagree on round-half semantics for doubles, and floor over the
    * same IEEE ops reproduces bit-for-bit everywhere (same reasoning as
    * [[Similarity.quantizeInt8]]). */
  def resizeMeta(decoded: DataFrame, maxDim: Int = 224): DataFrame = {
    val s = least(lit(1.0d),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")).cast(DoubleType))
    decoded
      .withColumn("scale", floor(s * 1e6d + 0.5d) / 1e6d)
      .withColumn("out_w",
        greatest(floor(col("width") * s + 0.5d).cast(IntegerType), lit(1)))
      .withColumn("out_h",
        greatest(floor(col("height") * s + 0.5d).cast(IntegerType), lit(1)))
  }

  /** "Video" frame sampling: slice the opaque payload into fixed-size
    * byte frames and fingerprint each — one output row per sampled
    * frame. The slice/explode plumbing (binary substr, per-frame rows,
    * partition-parallel) is exactly what real frame extraction needs;
    * md5-of-slice stands in for the decoded frame. */
  def frameSample(media: DataFrame, every: Int = 64): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast(DoubleType) / every)
      .cast(IntegerType)
    media
      .withColumn("__frames", transform(
        sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => md5(col("payload").substr(i * every + 1, lit(every)))))
      .select(col("media_id"),
        posexplode(col("__frames")).as(Seq("frame_no", "frame_md5")))
  }
}
