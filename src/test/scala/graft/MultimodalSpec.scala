package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(
    Seq((1L, "hello binary world this is media one"),
      (2L, "another payload with different bytes"),
      (3L, "short"), (4L, "yet another longer synthetic video payload " * 20))
      .toDF("id", "text"), "id", "text")

  test("synthetic media: binary payload + typed metadata map") {
    val r = media.orderBy("media_id").head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getAs[Map[String, String]]("metadata")("source") == "synthetic")
    assert(media.select("kind").distinct().count() == 3)
  }

  test("decode is deterministic and shape-consistent") {
    val d1 = Multimodal.decodeImages(media, partitions = 2).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(d1.map(_.media_id).toSeq == d2.map(_.media_id).toSeq)
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height)
      assert(a.pixels.toSeq == b.pixels.toSeq)
      assert(a.pixels.length == a.width * a.height * a.channels)
    }
  }

  test("resize produces exact target shape, preserving determinism") {
    val resized = Multimodal.resize(Multimodal.decodeImages(media), 8, 8).collect()
    assert(resized.forall(d => d.width == 8 && d.height == 8))
    assert(resized.forall(d => d.pixels.length == 8 * 8 * 3))
  }

  test("feature extraction yields stats and a normalized hash embedding") {
    val feats = Multimodal.extractFeatures(Multimodal.decodeImages(media), dim = 8)
      .collect().sortBy(_.media_id)
    assert(feats.length == 4)
    feats.foreach { f =>
      assert(f.mean_intensity >= 0 && f.mean_intensity <= 255)
      assert(f.embedding.length == 8)
      assert(math.abs(f.embedding.sum - 1.0f) < 1e-3) // histogram sums to 1
    }
  }

  test("frame sampling keeps every Nth fixed-size chunk of video payloads") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, everyN = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_index % 2 == 0))
    // only 'video' kind rows contribute
    val videoIds = media.filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
  }
}
