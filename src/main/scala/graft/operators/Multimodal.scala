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
  * q_mm_resize). AUDIO PCM decode is REAL too — `javax.sound.sampled`
  * reads WAV/AIFF/AU ([[AudioCodec]], q_mm_audio oracle on lossless PCM),
  * and multi-frame GIF streams give REAL frame sampling
  * ([[FrameCodec]], q_mm_frames oracle). Only COMPRESSED video/audio
  * (mp4/webm/mp3) remains a stub — those genuinely need ffmpeg-class
  * codecs absent from this container — behind the clearly-marked
  * [[FakeCodec]], which also keeps parsing the synthetic 12-byte-header
  * payloads used to test the batch plumbing independently of any codec.
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

  /** REAL audio codec on the JDK's `javax.sound.sampled` — WAV/AIFF/AU
    * PCM decode with zero native dependencies. PCM is lossless, so the
    * decoded samples are bit-exact and oracle-checkable (q_mm_audio
    * re-derives the sample sums from the fixture formula in SQL). Only
    * COMPRESSED audio (mp3/aac/ogg) genuinely needs codecs absent from
    * this container and stays with [[FakeCodec]]. */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

    /** Sample formula of the synthetic fixtures — integer sawtooth, every
      * value exact in any engine; |s| ≤ 1001 fits 16-bit PCM. Mirrored in
      * the q_mm_audio oracle SQL. */
    def sample(i: Long, t: Int): Int = (((i * 7 + t * 13) % 2003) - 1001).toInt

    /** Deterministic real WAV: 16-bit signed little-endian mono PCM,
      * `n` samples of [[sample]] at `sampleRate`. */
    def syntheticWav(i: Long, n: Int, sampleRate: Int = 8000): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      var t = 0
      while (t < n) {
        val s = sample(i, t)
        data(2 * t) = (s & 0xff).toByte
        data(2 * t + 1) = ((s >> 8) & 0xff).toByte
        t += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode 16-bit mono PCM audio bytes → (sampleRate, samples); None
      * for anything the JDK can't read (or non-16-bit/mono streams) so
      * callers degrade instead of failing the task. */
    def decode(data: Array[Byte]): Option[(Int, Array[Int])] =
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(data))
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var j = 0
          while (j < n) {
            out(j) =
              if (fmt.isBigEndian) ((bytes(2 * j).toInt << 8) | (bytes(2 * j + 1) & 0xff))
              else ((bytes(2 * j + 1).toInt << 8) | (bytes(2 * j) & 0xff))
            j += 1
          }
          Some((fmt.getSampleRate.toInt, out))
        }
      } catch { case _: Exception => None }
  }

  case class AudioStats(asset_id: Long, sample_rate: Int, n_samples: Int,
                        duration_ms: Long, abs_sum: Long)

  /** REAL frame extraction for animated GIF — ImageIO reads multi-frame
    * GIFs natively, so "sample every k-th frame" is genuinely decodable
    * in-JVM. Fixtures are grayscale (a 256-gray palette is exact in GIF,
    * unlike quantized RGB), so decoded frame pixels are bit-exact and
    * oracle-checkable (q_mm_frames). True video containers (mp4/webm)
    * remain with [[FakeCodec]] — those need ffmpeg-class codecs. */
  object FrameCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Gray value of the synthetic fixtures at (frame f, x, y) — coprime
      * strides; mirrored in the q_mm_frames oracle SQL. */
    def gray(i: Long, f: Int, x: Int, y: Int): Int =
      ((i * 31 + f * 57 + x * 17 + y * 29) % 256).toInt

    /** Identity gray palette: index g ↔ color (g,g,g). An EXPLICIT
      * IndexColorModel sidesteps Java2D's gray-colorspace conversion
      * (TYPE_BYTE_GRAY's getRGB/setRGB run an ICC transform that is NOT
      * identity) — with it, raster samples and palette colors round-trip
      * bit-exactly through GIF and PNG. */
    private def grayPalette: java.awt.image.IndexColorModel = {
      val ramp = Array.tabulate(256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    /** Deterministic real animated GIF: `frames` full frames of w×h
      * 8-bit grayscale [[gray]] pixels. */
    def syntheticGif(i: Long, frames: Int, w: Int, h: Int): Array[Byte] = {
      val imgs = (0 until frames).map { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.getRaster.setSample(x, y, 0, gray(i, f, x, y))
            x += 1
          }
          y += 1
        }
        img
      }
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      imgs.foreach(im => writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), null))
      writer.endWriteSequence()
      ios.close(); writer.dispose()
      bos.toByteArray
    }

    /** All frames of a multi-frame image stream (each decoded as a full
      * frame — our fixtures write full frames, no inter-frame disposal);
      * Nil when the bytes aren't a decodable image sequence. */
    def decodeFrames(data: Array[Byte]): Seq[BufferedImage] =
      try {
        val it = ImageIO.getImageReaders(
          ImageIO.createImageInputStream(new ByteArrayInputStream(data)))
        if (!it.hasNext) Nil
        else {
          val reader = it.next()
          reader.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(data)))
          val n = reader.getNumImages(true)
          val out = (0 until n).map(reader.read)
          reader.dispose()
          out
        }
      } catch { case _: Exception => Nil }

    /** Every k-th frame (0, k, 2k, …) re-encoded as PNG — the real
      * implementation of the frame-sampling stage. Frames are converted
      * to TYPE_INT_RGB first: the PNG writer turns an all-gray palette
      * into a GRAYSCALE PNG whose getRGB then runs the non-identity
      * CS_GRAY→sRGB ICC transform — truecolor sidesteps it (proven
      * exact by the q_mm_decode round trip). */
    def sampleFrames(data: Array[Byte], everyK: Int): Seq[Array[Byte]] = {
      require(everyK >= 1, s"everyK=$everyK")
      decodeFrames(data).zipWithIndex.collect {
        case (im, idx) if idx % everyK == 0 => ImageCodec.encodePng(toRgb(im))
      }
    }

    /** Pixel-exact copy into the sRGB-identity TYPE_INT_RGB raster
      * (IndexColorModel.getRGB returns raw palette entries — exact). */
    private def toRgb(im: BufferedImage): BufferedImage = {
      val out = new BufferedImage(im.getWidth, im.getHeight, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) { out.setRGB(x, y, im.getRGB(x, y) & 0xffffff); x += 1 }
        y += 1
      }
      out
    }
  }

  case class FrameStats(asset_id: Long, n_frames: Int, n_sampled: Int,
                        gray_sum: Long)

  /** STUB codec for the formats the container genuinely cannot decode
    * (compressed video/audio — ffmpeg-class native codecs; images, WAV
    * audio, and GIF frame streams are REAL, see [[ImageCodec]],
    * [[AudioCodec]], [[FrameCodec]]). Also parses the synthetic 12-byte
    * header used to exercise the batch plumbing without any codec.
    * Header layout (ours, synthetic): bytes 0-3 width, 4-7 height,
    * 8-11 durationMs (big-endian). */
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
    /** frame sampling stub for TRUE video containers (mp4/webm — needs
      * ffmpeg); GIF frame streams take the real [[FrameCodec]] path. */
    def sampleFrames(data: Array[Byte], everyMs: Int): Seq[Array[Byte]] =
      Seq(data.take(64)) // ??? real mp4 implementation needs ffmpeg
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

  /** Synthesize REAL WAV assets, one per id: 500 + i%300 samples at
    * 8 kHz with [[AudioCodec.sample]] values. */
  def synthesizeAudio(df: DataFrame, id: org.apache.spark.sql.Column): Dataset[Asset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("asset_id")).as[Long].map { i =>
      Asset(i, "audio", AudioCodec.syntheticWav(i, 500 + (i % 300).toInt))
    }
  }

  /** Synthesize REAL animated-GIF assets, one per id: 3 + i%5 grayscale
    * frames of (8 + i%8) × (8 + i%4) with [[FrameCodec.gray]] pixels. */
  def synthesizeGifs(df: DataFrame, id: org.apache.spark.sql.Column): Dataset[Asset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("asset_id")).as[Long].map { i =>
      Asset(i, "video",
        FrameCodec.syntheticGif(i, 3 + (i % 5).toInt, 8 + (i % 8).toInt, 8 + (i % 4).toInt))
    }
  }

  /** Exact decoded-audio stats per asset (undecodable payloads dropped):
    * sample rate, count, integer-div duration, |sample| sum — the oracle
    * surface for the real audio decode path. */
  def audioStats(assets: Dataset[Asset]): Dataset[AudioStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.flatMap { a =>
      AudioCodec.decode(a.data).map { case (rate, samples) =>
        var s = 0L
        var j = 0
        while (j < samples.length) { s += math.abs(samples(j)); j += 1 }
        AudioStats(a.asset_id, rate, samples.length,
          samples.length.toLong * 1000L / rate, s)
      }
    })
  }

  /** Exact frame-sampling stats per asset: total frames, frames kept at
    * every-`everyK` sampling, gray-channel sum over the KEPT frames
    * (each sampled frame PNG-round-trips through [[ImageCodec]], so the
    * sum proves the whole GIF→frames→PNG chain byte-exact). */
  def frameStats(assets: Dataset[Asset], everyK: Int): Dataset[FrameStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.flatMap { a =>
      val total = FrameCodec.decodeFrames(a.data).length
      if (total == 0) None
      else {
        var s = 0L
        var kept = 0
        FrameCodec.sampleFrames(a.data, everyK).foreach { png =>
          kept += 1
          val im = ImageCodec.decode(png).get
          var y = 0
          while (y < im.getHeight) {
            var x = 0
            while (x < im.getWidth) { s += (im.getRGB(x, y) >> 16) & 0xff; x += 1 }
            y += 1
          }
        }
        Some(FrameStats(a.asset_id, total, kept, s))
      }
    })
  }

  /** Partition-wise metadata extraction (the mapInPandas-shaped pass):
    * each partition decodes its batch sequentially, no per-row closure
    * dispatch overhead beyond the iterator. Image payloads take the REAL
    * ImageIO decode, audio the REAL javax.sound PCM decode; bytes no
    * reader claims (including the synthetic header fixtures) fall back
    * to the header parse — one undecodable blob degrades, it never fails
    * the task. */
  def extractMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { a =>
        val (w, h, d) =
          (a.kind match {
            case "image" => ImageCodec.dims(a.data).map { case (iw, ih) => (iw, ih, 0) }
            case "audio" => AudioCodec.decode(a.data).map { case (rate, ss) =>
              (0, 0, (ss.length.toLong * 1000L / rate).toInt)
            }
            case _ => None
          }).getOrElse(FakeCodec.decode(a.kind, a.data))
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
