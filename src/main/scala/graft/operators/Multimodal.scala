package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` payloads + typed metadata, processed
  * in partition-sized batches.
  *
  * The decode kernels themselves are STUBBED (this container ships no
  * image/audio codecs — see `fakeDecode`, a deterministic stand-in): what
  * is real and tested here is everything Spark-side — the schema, the
  * mapPartitions batch shape (one buffer reuse per partition, the same
  * shape a Pandas-UDF/`mapInPandas` pipeline uses), size-aware
  * repartitioning, and the metadata projections.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      payload: Array[Byte],    // opaque encoded bytes
      width: Int, height: Int, // -1 when unknown/not applicable
      duration_ms: Long)       // -1 for still images

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])   // fixed-dim feature vector

  /** Deterministic fake "decode + embed" kernel: stands in for a real
    * codec call (??? in production without codecs). Derives a fixed-dim
    * feature from payload bytes so tests can assert exact values. */
  private[operators] def fakeDecode(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    var h = 1125899906842597L
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / math.max(1, payload.length / dim); j += 1 }
    out
  }

  private def checksum64(payload: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h ^= payload(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Batched feature extraction: mapPartitions so a real implementation
    * can amortize codec/model initialization per partition (exactly the
    * Pandas-UDF batch contract). Stays a Dataset op — fully distributed,
    * no driver collection. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (codec handles, model weights...)
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          checksum64(m.payload), fakeDecode(m.payload, dim))
      }
    }
  }

  /** Size-aware repartitioning: media payloads are wildly skewed (a video
    * is 1000x an image); distribute by cumulative payload size so each
    * partition carries a comparable byte budget rather than row count. */
  def repartitionBySize(media: Dataset[MediaRecord], targetPartitionBytes: Long): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    val totalBytes = media.map(_.payload.length.toLong).reduce(_ + _)
    val nParts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.repartition(nParts, col("media_id"))
  }

  /** Frame sampling for video-kind records: emits one record per sampled
    * frame index (every `everyMs` of duration) with the frame decode
    * itself stubbed to a payload slice. The explode shape — one input row
    * to N frame rows — is the real contract. */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          (greatest(col("duration_ms") - 1, lit(0L)) / everyMs).cast("long"))))
      .withColumn("frame_ts_ms", col("frame_idx") * everyMs)
      // stub: a real decoder seeks to frame_ts_ms; here we slice bytes
      .withColumn("frame_payload",
        expr("substring(payload, cast(frame_idx % greatest(octet_length(payload), 1) as int) + 1, 16)"))
      .select("media_id", "frame_idx", "frame_ts_ms", "frame_payload")
  }

  /** Aspect-preserving resize planning for image-kind records: the target
    * geometry (scale factor, output dims, letterbox padding) is REAL
    * arithmetic — the part a pipeline must get right and the part worth
    * testing — while the pixel resample itself is the stubbed codec call
    * (payload passed through; a real kernel replaces exactly that one
    * line). Non-images pass through untouched. */
  def resizeImages(media: Dataset[MediaRecord], maxW: Int, maxH: Int): DataFrame = {
    import media.sparkSession.implicits._
    val isImg = col("kind") === "image" && col("width") > 0 && col("height") > 0
    media.toDF()
      .withColumn("scale",
        when(isImg, least(
          lit(maxW).cast("double") / col("width"),
          lit(maxH).cast("double") / col("height"),
          lit(1.0))).otherwise(lit(1.0)))
      .withColumn("out_width",
        when(isImg, greatest(floor(col("width") * col("scale")), lit(1)).cast("int"))
          .otherwise(col("width")))
      .withColumn("out_height",
        when(isImg, greatest(floor(col("height") * col("scale")), lit(1)).cast("int"))
          .otherwise(col("height")))
      .withColumn("pad_x", when(isImg, (lit(maxW) - col("out_width")) / 2).cast("int"))
      .withColumn("pad_y", when(isImg, (lit(maxH) - col("out_height")) / 2).cast("int"))
      // stub: a real resample kernel transforms pixels here
      .withColumn("out_payload", col("payload"))
      .select("media_id", "kind", "width", "height", "scale",
        "out_width", "out_height", "pad_x", "pad_y", "out_payload")
  }

  /** Demo corpus: documents' text bytes as fake media payloads — gives the
    * plumbing a deterministic, driver-data-backed input. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, dir).select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRecord(id, kind, text.getBytes("UTF-8"),
          if (kind == "image") (n % 640).toInt + 16 else -1,
          if (kind == "image") (n % 480).toInt + 16 else -1,
          if (kind == "video" || kind == "audio") n * 100 else -1L)
      }
  }
}
