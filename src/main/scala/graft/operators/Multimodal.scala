package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed partition-wise in
  * batches (the Scala analog of `mapInPandas`: one buffer per batch, not
  * one closure call per row).
  *
  * IMAGE decode/resize/feature-extract are REAL — `javax.imageio` ships
  * with the JDK (PNG/JPEG/BMP/GIF readers, pure-JVM surface, no native
  * libs to install), so [[ImageCodec]] decodes genuine image bytes end to
  * end and is oracle-checked on lossless PNG round trips (q_mm_decode,
  * q_mm_resize). Only VIDEO/AUDIO decoding remains a stub — those
  * genuinely need ffmpeg-class codecs absent from this container —
  * behind the clearly-marked [[FakeCodec]], which also keeps parsing the
  * synthetic 12-byte-header payloads used to test the batch plumbing
  * independently of any codec.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, data: Array[Byte])
  case class AssetMeta(asset_id: Long, kind: String, width: Int, height: Int,
                       durationMs: Int, sizeBytes: Int, sha256: String)
  case class AssetFeatures(asset_id: Long, features: Array[Float])
  case class PixelStats(asset_id: Long, width: Int, height: Int,
                        red_sum: Long, pixel_sha: String)

  /** REAL image codec on the JDK's `javax.imageio` — decodes and
    * re-encodes PNG/JPEG/BMP/GIF with zero native dependencies.
    *
    * Determinism contract (what makes it oracle-checkable):
    *  - PNG is lossless, so `decode(encodePng(img))` recovers every pixel
    *    bit-exactly;
    *  - [[resize]] uses OUR explicit nearest-neighbor mapping
    *    `src = dst * srcDim div dstDim` (pure integer arithmetic), NOT
    *    Java2D's implementation-defined `Graphics2D` sampling, so the
    *    resampled pixels are reproducible in any engine — DuckDB
    *    re-derives them from the fixture formula in q_mm_resize. */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Pixel formula of the synthetic fixtures — small coprime strides so
      * every (x, y, channel) is distinct and any decode/resample slip
      * shifts the checked sums. Mirrored in the q_mm_resize oracle SQL. */
    def rgb(i: Long, x: Int, y: Int): Int = {
      val r = ((i * 131 + x * 17 + y * 29) % 256).toInt
      val g = ((i * 37 + x * 5 + y * 11) % 256).toInt
      val b = ((i * 73 + x * 3 + y * 7) % 256).toInt
      (r << 16) | (g << 8) | b
    }

    /** Deterministic real PNG: w×h, pixels from [[rgb]]. */
    def syntheticPng(i: Long, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb(i, x, y)); x += 1 }
        y += 1
      }
      encodePng(img)
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** None when the bytes are not a decodable image (wrong magic,
      * truncated stream) — callers degrade instead of failing the task. */
    def decode(data: Array[Byte]): Option[BufferedImage] =
      Option(try ImageIO.read(new ByteArrayInputStream(data))
             catch { case _: Exception => null })

    def dims(data: Array[Byte]): Option[(Int, Int)] =
      decode(data).map(im => (im.getWidth, im.getHeight))

    /** Nearest-neighbor resample to wT×hT with the explicit integer
      * mapping srcX = dx·w div wT (see object doc), re-encoded PNG. */
    def resize(data: Array[Byte], wT: Int, hT: Int): Option[Array[Byte]] = {
      require(wT > 0 && hT > 0, s"target ${wT}x$hT")
      decode(data).map { im =>
        val out = new BufferedImage(wT, hT, BufferedImage.TYPE_INT_RGB)
        var dy = 0
        while (dy < hT) {
          val sy = (dy.toLong * im.getHeight / hT).toInt
          var dx = 0
          while (dx < wT) {
            out.setRGB(dx, dy, im.getRGB((dx.toLong * im.getWidth / wT).toInt, sy) & 0xffffff)
            dx += 1
          }
          dy += 1
        }
        encodePng(out)
      }
    }

    /** Real feature vector: `dim`-bin luminance histogram (integer
      * luma = (2r+5g+b)/8 — exact arithmetic), normalized to sum 1. */
    def histFeatures(im: BufferedImage, dim: Int): Array[Float] = {
      val counts = new Array[Long](dim)
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          val p = im.getRGB(x, y)
          val luma = (2 * ((p >> 16) & 0xff) + 5 * ((p >> 8) & 0xff) + (p & 0xff)) / 8
          counts(luma * dim / 256) += 1
          x += 1
        }
        y += 1
      }
      val n = im.getWidth.toLong * im.getHeight
      counts.map(c => c.toFloat / n)
    }

    /** Exact decoded-pixel summary: dims, channel sum, sha256 over the
      * row-major RGB byte stream (the golden-testable pixel identity). */
    def pixelStats(id: Long, data: Array[Byte]): Option[PixelStats] =
      decode(data).map { im =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        var redSum = 0L
        var y = 0
        while (y < im.getHeight) {
          var x = 0
          while (x < im.getWidth) {
            val p = im.getRGB(x, y)
            redSum += (p >> 16) & 0xff
            md.update(((p >> 16) & 0xff).toByte)
            md.update(((p >> 8) & 0xff).toByte)
            md.update((p & 0xff).toByte)
            x += 1
          }
          y += 1
        }
        PixelStats(id, im.getWidth, im.getHeight, redSum,
          md.digest().map("%02x".format(_)).mkString)
      }
  }

  /** STUB codec for the formats the container genuinely cannot decode
    * (video/audio — ffmpeg-class native codecs). Also parses the
    * synthetic 12-byte header used to exercise the batch plumbing
    * without any codec. Header layout (ours, synthetic): bytes 0-3
    * width, 4-7 height, 8-11 durationMs (big-endian). */
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
    /** video-frame sampling stub: a real implementation needs ffmpeg */
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

  /** Synthesize REAL PNG assets (decodable by any image library), one per
    * id: (16 + i%64) × (16 + i%48) with [[ImageCodec.rgb]] pixels. */
  def synthesizeImages(df: DataFrame, id: org.apache.spark.sql.Column): Dataset[Asset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("asset_id")).as[Long].map { i =>
      Asset(i, "image", ImageCodec.syntheticPng(i, 16 + (i % 64).toInt, 16 + (i % 48).toInt))
    }
  }

  /** Partition-wise metadata extraction (the mapInPandas-shaped pass):
    * each partition decodes its batch sequentially, no per-row closure
    * dispatch overhead beyond the iterator. Image payloads take the REAL
    * ImageIO decode; bytes no reader claims (including the synthetic
    * header fixtures) fall back to the header parse — one undecodable
    * blob degrades, it never fails the task. */
  def extractMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { a =>
        val (w, h, d) =
          (if (a.kind == "image") ImageCodec.dims(a.data).map { case (iw, ih) => (iw, ih, 0) }
           else None).getOrElse(FakeCodec.decode(a.kind, a.data))
        md.reset()
        val sha = md.digest(a.data).map("%02x".format(_)).mkString
        AssetMeta(a.asset_id, a.kind, w, h, d, a.data.length, sha)
      }
    }
  }

  /** Partition-wise feature extraction → embedding column compatible
    * with the Similarity operators. Decodable images get the REAL
    * luminance-histogram features; everything else the deterministic
    * hash-derived stand-in. */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 64): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val feats =
        (if (a.kind == "image") ImageCodec.decode(a.data).map(ImageCodec.histFeatures(_, dim))
         else None).getOrElse(FakeCodec.features(a.data, dim))
      AssetFeatures(a.asset_id, feats)
    })
  }

  /** Partition-wise image resize (real ImageIO decode → explicit
    * nearest-neighbor resample → PNG re-encode). Undecodable payloads
    * pass through unchanged. */
  def resizeImages(assets: Dataset[Asset], wT: Int, hT: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map(a =>
      a.copy(data = ImageCodec.resize(a.data, wT, hT).getOrElse(a.data))))
  }

  /** Exact decoded-pixel stats per asset (undecodable payloads dropped) —
    * the oracle surface for the real decode path. */
  def imagePixelStats(assets: Dataset[Asset]): Dataset[PixelStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.flatMap(a => ImageCodec.pixelStats(a.asset_id, a.data)))
  }
}
