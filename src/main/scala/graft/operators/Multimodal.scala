package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` payloads + typed metadata, processed
  * in partition-sized batches.
  *
  * Decode is REAL for the formats the JDK ships codecs for — PNG/JPEG/
  * BMP/GIF via `javax.imageio` (headless-safe) and WAV/AIFF PCM via
  * `javax.sound.sampled` — with zero extra dependencies. Only video and
  * compressed-audio bitstreams (MP4/MP3/OGG…), which no stock JDK can
  * decode, fall back to a deterministic byte-level feature (`byteFeature`),
  * and that fallback also catches corrupt/undecodable payloads instead of
  * failing the task. The Spark-side contract — schema, the mapPartitions
  * batch shape (per-partition codec init, the same shape a Pandas-UDF/
  * `mapInPandas` pipeline uses), size-aware repartitioning, metadata
  * projections — is unchanged and fully tested.
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

  /** Decode an encoded image payload with the JDK's ImageIO (PNG, JPEG,
    * BMP, GIF, WBMP). None for bitstreams ImageIO has no reader for
    * (e.g. WebP, TIFF-less builds) or corrupt payloads — callers fall
    * back rather than fail the Spark task. */
  private[graft] def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Image formats THIS JVM's ImageIO service registry can decode,
    * lowercased. [[decodeImage]] dispatches through the registry, so a
    * reader plugin on the executor classpath (a TwelveMonkeys-style
    * WebP/PSD jar) extends decode coverage with NO code change here —
    * this probe makes the coverage observable instead of silently
    * deployment-dependent. Stock JDK 17: bmp, gif, jpg/jpeg, png, tiff,
    * wbmp. */
  private[graft] def decodableImageFormats(): Set[String] =
    ImageIO.getReaderFormatNames.map(_.toLowerCase).toSet

  /** Audio file types THIS JVM's sampled-audio stack can open (stock
    * JDK: wave, aiff, au/snd); same plugin-extensibility story via the
    * javax.sound SPI. */
  private[graft] def decodableAudioFormats(): Set[String] =
    AudioSystem.getAudioFileTypes.map(_.getExtension.toLowerCase).toSet

  /** Capability probe as a QUERY: one (kind, format) row per media
    * format decodable on the executors — run before a decode job to see
    * what this deployment actually decodes (executor classpaths, not the
    * driver's, are what matter; the probe executes ON the executors via
    * mapPartitions, one registry scan per partition). */
  def mediaCapabilities(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(s.sparkContext.defaultParallelism)
      .mapPartitions { _ =>
        decodableImageFormats().iterator.map(("image", _)) ++
          decodableAudioFormats().iterator.map(("audio", _))
      }
      .toDF("kind", "format")
      .distinct()
      .orderBy("kind", "format")
  }

  /** Real pixel feature: mean luminance (Rec. 601 weights) per vertical
    * strip, `dim` strips across the image width, each in [0,1]. Row-bulk
    * getRGB keeps the per-pixel cost at one int read. */
  private[graft] def imageFeature(img: BufferedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val cnt = new Array[Int](dim)
    val w = img.getWidth
    val h = img.getHeight
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val lum = (0.299f * ((rgb >> 16) & 0xff) +
          0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)) / 255.0f
        val cell = x * dim / w
        out(cell) += lum
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    var j = 0
    while (j < dim) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
    out
  }

  /** Decode a WAV/AIFF/AU payload to mono float samples in [-1,1] with
    * the JDK's sampled-audio stack: any PCM layout the JDK can convert is
    * first normalized to 16-bit signed little-endian, then channel-
    * averaged. None for compressed formats (MP3/OGG) the JDK lacks. */
  private[graft] def decodeAudio(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
          src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val ch = src.getChannels
        val nFrames = bytes.length / (2 * ch)
        val out = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var sum = 0.0f
          var c = 0
          while (c < ch) {
            val i = (f * ch + c) * 2
            sum += (((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort) / 32768.0f
            c += 1
          }
          out(f) = sum / ch
          f += 1
        }
        Some(out)
      } finally in.close()
    } catch { case _: Exception => None }

  /** Real audio feature: RMS energy per temporal segment, `dim` equal
    * segments across the clip. */
  private[graft] def audioFeature(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    val cnt = new Array[Int](dim)
    var i = 0
    while (i < samples.length) {
      val cell = (i.toLong * dim / samples.length).toInt
      out(cell) += samples(i) * samples(i)
      cnt(cell) += 1
      i += 1
    }
    var j = 0
    while (j < dim) {
      out(j) = if (cnt(j) > 0) math.sqrt(out(j) / cnt(j)).toFloat else 0f
      j += 1
    }
    out
  }

  /** Deterministic byte-level fallback feature for payloads no JDK codec
    * can open: video and compressed-audio bitstreams, plus corrupt or
    * mislabeled data. Derives a fixed-dim vector from raw bytes so the
    * pipeline stays total and testable even off the decode path. */
  private[graft] def byteFeature(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
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

  /** Batched feature extraction: mapPartitions so codec initialization is
    * amortized per partition (exactly the Pandas-UDF batch contract).
    * Images decode via ImageIO → luminance-strip feature; audio via
    * javax.sound → segment-RMS feature; video (no JDK codec) and
    * undecodable payloads take the byte-level fallback. Stays a Dataset
    * op — fully distributed, no driver collection. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init: never spool decode scratch to executor disk
      ImageIO.setUseCache(false)
      it.map { m =>
        val feat = m.kind match {
          case "image" => decodeImage(m.payload).map(imageFeature(_, dim))
            .getOrElse(byteFeature(m.payload, dim))
          case "audio" => decodeAudio(m.payload).map(audioFeature(_, dim))
            .getOrElse(byteFeature(m.payload, dim))
          case _ => byteFeature(m.payload, dim)
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          checksum64(m.payload), feat)
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
    * itself stubbed to a payload slice (no stock-JDK video codec exists;
    * a real decoder seeks to frame_ts_ms). The explode shape — one input
    * row to N frame rows — is the real contract. */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          (greatest(col("duration_ms") - 1, lit(0L)) / everyMs).cast("long"))))
      .withColumn("frame_ts_ms", col("frame_idx") * everyMs)
      .withColumn("frame_payload",
        expr("substring(payload, cast(frame_idx % greatest(octet_length(payload), 1) as int) + 1, 16)"))
      .select("media_id", "frame_idx", "frame_ts_ms", "frame_payload")
  }

  /** Real bilinear resample + PNG re-encode for a JDK-decodable image
    * payload at the planned output geometry; payloads ImageIO cannot open
    * (or that are already at target size) pass through unchanged. The
    * destination raster keeps the source's alpha channel (ARGB in, ARGB
    * out) — an RGB-only destination would silently flatten transparency
    * onto black. */
  private[graft] def resamplePayload(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] =
    decodeImage(payload) match {
      case Some(img) if outW > 0 && outH > 0 &&
          (outW != img.getWidth || outH != img.getHeight) =>
        val dstType = if (img.getColorModel.hasAlpha) BufferedImage.TYPE_INT_ARGB
          else BufferedImage.TYPE_INT_RGB
        val dst = new BufferedImage(outW, outH, dstType)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, outW, outH, null)
        } finally g.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(dst, "png", bos)
        bos.toByteArray
      case Some(_) => payload
      case None    => payload
    }

  /** Aspect-preserving resize for image-kind records: the target geometry
    * (scale factor, output dims, letterbox padding) is computed in native
    * columns, then the pixel resample runs for real (bilinear via
    * java.awt.image + PNG re-encode) on every payload ImageIO can decode.
    * The codec call is an opaque binary→binary transform, so it lives in
    * a Scala UDF — the one shape Catalyst cannot express — applied after
    * the geometry plan. Non-images pass through untouched. */
  def resizeImages(media: Dataset[MediaRecord], maxW: Int, maxH: Int): DataFrame = {
    import media.sparkSession.implicits._
    val isImg = col("kind") === "image" && col("width") > 0 && col("height") > 0
    val resample = udf { (p: Array[Byte], ow: Int, oh: Int, k: String) =>
      if (k == "image") resamplePayload(p, ow, oh) else p
    }
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
      .withColumn("out_payload",
        resample(col("payload"), col("out_width"), col("out_height"), col("kind")))
      .select("media_id", "kind", "width", "height", "scale",
        "out_width", "out_height", "pad_x", "pad_y", "out_payload")
  }

  /** Demo corpus: documents' text bytes as fake media payloads — gives the
    * plumbing a deterministic, driver-data-backed input (these payloads are
    * not decodable bitstreams, so they exercise the fallback path; see
    * `syntheticMedia` for real encoded fixtures). */
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

  /** Deterministic PNG fixture: w×h RGB gradient keyed by `seed`. */
  private[graft] def makePng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255 / math.max(1, w - 1) + seed) & 0xff
        val g = (y * 255 / math.max(1, h - 1) + seed * 7) & 0xff
        val b = (x ^ y ^ seed) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic WAV fixture: 16-bit PCM mono sine at `hz` for
    * `nSamples` samples at `rate` Hz. */
  private[graft] def makeWav(hz: Double, nSamples: Int, rate: Float = 8000f): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val bytes = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * 0.6 * 32767).toInt.toShort
      bytes(i * 2) = (s & 0xff).toByte
      bytes(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthetic corpus of REAL encoded media: PNG images (decodable by
    * ImageIO), WAV clips (decodable by javax.sound), and raw "video"
    * bytes (the honest no-JDK-codec case). Built on executors — the
    * encoders run distributed, exactly where production decode runs. */
  def syntheticMedia(s: SparkSession, n: Int = 60): Dataset[MediaRecord] = {
    import s.implicits._
    s.range(n).as[Long].map { id =>
      (id % 3) match {
        case 0 =>
          val w = 16 + (id % 48).toInt
          val h = 16 + (id % 32).toInt
          MediaRecord(id, "image", makePng(w, h, id.toInt), w, h, -1L)
        case 1 =>
          val nSamp = 800 + (id % 5).toInt * 160
          MediaRecord(id, "audio", makeWav(220.0 + id, nSamp), -1, -1,
            (nSamp * 1000L) / 8000L)
        case _ =>
          val raw = Array.tabulate[Byte](256)(i => ((i * 31 + id) & 0xff).toByte)
          MediaRecord(id, "video", raw, -1, -1, 30000L + id * 100)
      }
    }
  }
}
