package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY payloads with
  * typed metadata, processed by per-partition batch operators.
  *
  * The Spark-side plumbing is real — schema, typed Datasets, partition-
  * balanced decode, batch-at-a-time iteration via mapPartitions (the Scala
  * analogue of mapInPandas: one decoder instance per partition, amortized
  * over the batch, no per-row setup) — while the actual codec is stubbed
  * behind [[Decoder]] because no image/audio libraries ship in this
  * environment. [[StubDecoder]] is DETERMINISTIC FAKE DECODE: it
  * synthesizes pixel buffers from the payload bytes so every downstream
  * operator (resize, features) runs real arithmetic on realistic shapes.
  * Swap in a JNI/ImageIO-backed Decoder for production without touching
  * any operator.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            metadata: Map[String, String])

  /** Decoded raster: row-major interleaved channels. */
  final case class Decoded(media_id: Long, width: Int, height: Int,
                           channels: Int, pixels: Array[Byte])

  /** Per-image features: simple stats + a fixed-dim hash embedding. */
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 mean_intensity: Double, std_intensity: Double,
                                 embedding: Array[Float])

  /** One sampled frame of a video payload. */
  final case class Frame(media_id: Long, frame_index: Int, payload: Array[Byte])

  /** Codec boundary — the only piece that is stubbed. */
  trait Decoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): Decoded
  }

  /** STUB: deterministic fake decode (no codec libraries in this
    * environment). Dimensions derive from the payload hash; "pixels" are a
    * cheap deterministic expansion of the payload bytes. Replace with a
    * real codec (ImageIO/libjpeg via JNI) behind the same trait. */
  object StubDecoder extends Decoder {
    def decode(id: Long, payload: Array[Byte]): Decoded = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 16 + math.abs(h % 48)        // 16..63
      val height = 16 + math.abs((h / 64) % 48)
      val channels = 3
      val n = width * height * channels
      val px = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val src = if (payload.isEmpty) 0 else payload(i % payload.length)
        px(i) = ((src + i * 31) & 0xff).toByte
        i += 1
      }
      Decoded(id, width, height, channels, px)
    }
  }

  /** Deterministic synthetic media table derived from any source column —
    * payload = UTF-8 bytes of the text (stands in for real image bytes). */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("kind"),
      col(textCol).cast("binary").as("payload"),
      map(lit("source"), lit("synthetic"),
        lit("bytes"), length(col(textCol)).cast("string")).as("metadata"))

  /** Decode a media frame batch-at-a-time. Repartitions by media_id first so
    * decode work is spread evenly regardless of upstream file layout (the
    * classic skew hazard: all large payloads in one input split). */
  def decodeImages(df: DataFrame, decoder: Decoder = StubDecoder,
                   partitions: Int = 0): Dataset[Decoded] = {
    import df.sparkSession.implicits._
    val media = df.select(col("media_id"), col("kind"), col("payload"),
      col("metadata")).as[MediaRow]
    val balanced =
      if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    balanced.mapPartitions { rows =>
      // one decoder per partition, amortized across the batch
      rows.map(r => decoder.decode(r.media_id, r.payload))
    }
  }

  /** Nearest-neighbor resize — real resampling arithmetic on the decoded
    * buffer (works unchanged once a real decoder is plugged in). */
  def resize(ds: Dataset[Decoded], outW: Int, outH: Int): Dataset[Decoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { d =>
        val out = new Array[Byte](outW * outH * d.channels)
        var y = 0
        while (y < outH) {
          val sy = y * d.height / outH
          var x = 0
          while (x < outW) {
            val sx = x * d.width / outW
            var c = 0
            while (c < d.channels) {
              out((y * outW + x) * d.channels + c) =
                d.pixels((sy * d.width + sx) * d.channels + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        Decoded(d.media_id, outW, outH, d.channels, out)
      }
    }
  }

  /** Per-image features: intensity stats + a `dim`-bucket hash embedding of
    * the pixel histogram (all real arithmetic; deterministic). */
  def extractFeatures(ds: Dataset[Decoded], dim: Int = 16): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { d =>
        var sum = 0.0; var sumSq = 0.0
        val emb = new Array[Float](dim)
        var i = 0
        val n = math.max(d.pixels.length, 1)
        while (i < d.pixels.length) {
          val v = d.pixels(i) & 0xff
          sum += v; sumSq += v.toDouble * v
          emb(v % dim) += 1.0f
          i += 1
        }
        val mean = sum / n
        val std = math.sqrt(math.max(sumSq / n - mean * mean, 0.0))
        var j = 0
        while (j < dim) { emb(j) = emb(j) / n; j += 1 }
        ImageFeatures(d.media_id, d.width, d.height,
          mean, std, emb)
      }
    }
  }

  /** Frame sampling for video payloads: fixed-size frame chunks, keep every
    * `everyN`th — the flatMap shape (1 row -> many frames) is the real
    * plumbing; chunking stands in for container demux. */
  def sampleFrames(df: DataFrame, frameBytes: Int = 256,
                   everyN: Int = 2): Dataset[Frame] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("kind"), col("payload"), col("metadata"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.filter(_.kind == "video").flatMap { r =>
          r.payload.grouped(frameBytes).zipWithIndex.collect {
            case (chunk, idx) if idx % everyN == 0 => Frame(r.media_id, idx, chunk)
          }
        }
      }
  }
}
