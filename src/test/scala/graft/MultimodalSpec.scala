package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing specs: schema, batch shape, determinism, frame
  * explode, size-aware partitioning. Decode itself is a deterministic
  * stub (no codecs in this environment). */
class MultimodalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val media = Multimodal.mediaFromDocuments(spark, dir).cache()

  test("feature extraction preserves ids, emits fixed-dim vectors, is deterministic") {
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(feats.length == media.count())
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(_.n_bytes > 0))
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(feats.map(f => (f.media_id, f.checksum)).toSet ==
      again.map(f => (f.media_id, f.checksum)).toSet)
  }

  test("frame sampling explodes videos into per-frame rows with timestamps") {
    val frames = Multimodal.sampleFrames(media, everyMs = 5000).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.getAs[Long]("media_id"))
    val durations = media.filter(_.kind == "video").collect()
      .map(m => m.media_id -> m.duration_ms).toMap
    byMedia.foreach { case (id, fs) =>
      val expected = (durations(id) - 1) / 5000 + 1
      assert(fs.length == expected, s"media $id: ${fs.length} frames, want $expected")
      assert(fs.map(_.getAs[Long]("frame_ts_ms")).sorted.toSeq ==
        (0L until expected).map(_ * 5000))
      assert(fs.forall(f => f.getAs[Array[Byte]]("frame_payload").nonEmpty))
    }
  }

  test("size-aware repartitioning spreads byte budget") {
    val parts = Multimodal.repartitionBySize(media, targetPartitionBytes = 4096)
    assert(parts.rdd.getNumPartitions >= 2)
    assert(parts.count() == media.count())
  }

  test("resize planning scales within bounds, preserves aspect, pads symmetrically") {
    val out = Multimodal.resizeImages(media, maxW = 128, maxH = 96).collect()
    assert(out.length == media.count())
    val imgs = out.filter(_.getAs[String]("kind") == "image")
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      val s = r.getAs[Double]("scale")
      assert(ow <= 128 && oh <= 96 && ow >= 1 && oh >= 1)
      assert(s <= 1.0 && s > 0.0)
      // never upscale; aspect preserved to floor rounding
      assert(ow == math.max(1, math.floor(w * s).toInt))
      assert(oh == math.max(1, math.floor(h * s).toInt))
      // at least one axis is tight against the bound unless scale==1
      assert(s == 1.0 || ow == 128 || oh == 96 ||
        math.floor((w * s) + 1e-9).toInt == 128 || math.floor((h * s) + 1e-9).toInt == 96)
      assert(r.getAs[Int]("pad_x") == (128 - ow) / 2)
      assert(r.getAs[Int]("pad_y") == (96 - oh) / 2)
    }
    // non-images pass through untouched
    out.filter(_.getAs[String]("kind") != "image").foreach { r =>
      assert(r.getAs[Double]("scale") == 1.0)
      assert(r.getAs[Int]("out_width") == r.getAs[Int]("width"))
    }
  }
}
