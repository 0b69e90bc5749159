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
}
