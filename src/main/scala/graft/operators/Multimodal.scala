package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed partition-wise in
  * batches (the Scala analog of `mapInPandas`: one buffer per batch, not
  * one closure call per row).
  *
  * The actual codecs are NOT in this container, so the decode kernels
  * below are STUBS — `FakeCodec` is a deterministic stand-in (clearly
  * marked) that parses our own synthetic header format. The Spark-side
  * contract is real and tested: schema, batch iteration, partitioning,
  * and the feature-vector output shape are exactly what a real
  * libjpeg/ffmpeg kernel would plug into.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, data: Array[Byte])
  case class AssetMeta(asset_id: Long, kind: String, width: Int, height: Int,
                       durationMs: Int, sizeBytes: Int, sha256: String)
  case class AssetFeatures(asset_id: Long, features: Array[Float])

  /** STUB codec: deterministic fake "decode". Real deployment swaps this
    * object for a JNI/libjpeg/ffmpeg-backed implementation with the same
    * signature. Header layout (ours, synthetic): bytes 0-3 width,
    * 4-7 height, 8-11 durationMs (big-endian). */
  object FakeCodec {
    def decode(kind: String, data: Array[Byte]): (Int, Int, Int) = {
      def be(o: Int): Int =
        if (data.length >= o + 4)
          ((data(o) & 0xff) << 24) | ((data(o + 1) & 0xff) << 16) |
            ((data(o + 2) & 0xff) << 8) | (data(o + 3) & 0xff)
        else 0
      (be(0), be(4), be(8))
    }
    /** fake feature extractor: dim hash-derived floats — deterministic */
    def features(data: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("SHA-256").digest(data)
      Array.tabulate(dim)(i => ((md(i % md.length) & 0xff) - 128) / 128.0f)
    }
    /** resize / frame-sample stubs: real kernels go here */
    def resize(data: Array[Byte], w: Int, h: Int): Array[Byte] =
      data.take(64) // ??? real implementation: scaled pixel buffer
    def sampleFrames(data: Array[Byte], everyMs: Int): Seq[Array[Byte]] =
      Seq(data.take(64)) // ??? real implementation: decoded frames
  }

  /** Synthesize a deterministic asset table from any id column (the
    * binary payload embeds a parseable header + content bytes). */
  def synthesize(df: DataFrame, id: org.apache.spark.sql.Column): Dataset[Asset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("asset_id")).as[Long].map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 16 + (i % 64).toInt; val h = 16 + (i % 48).toInt; val d = 1000 + (i % 9000).toInt
      val header = Array(
        (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
        (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
        (d >> 24).toByte, (d >> 16).toByte, (d >> 8).toByte, d.toByte)
      val body = Array.tabulate(64)(j => ((i * 131 + j * 17) % 251).toByte)
      Asset(i, kind, header ++ body)
    }
  }

  /** Partition-wise metadata extraction (the mapInPandas-shaped pass):
    * each partition decodes its batch sequentially, no per-row closure
    * dispatch overhead beyond the iterator. */
  def extractMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { a =>
        val (w, h, d) = FakeCodec.decode(a.kind, a.data)
        md.reset()
        val sha = md.digest(a.data).map("%02x".format(_)).mkString
        AssetMeta(a.asset_id, a.kind, w, h, d, a.data.length, sha)
      }
    }
  }

  /** Partition-wise feature extraction → embedding column compatible
    * with the Similarity operators. */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(a => AssetFeatures(a.asset_id, FakeCodec.features(a.data, dim))))
  }
}
