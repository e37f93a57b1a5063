package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque binary
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample plumbing a training-data pipeline runs over them.
  *
  * Image, audio AND video decode are REAL: the JDK bundles ImageIO
  * (PNG/BMP/JPEG) and javax.sound (PCM WAV) codecs, and MJPEG-in-AVI
  * video needs only RIFF chunk walking on top of the JPEG reader
  * ([[Mjpeg]]) — [[decodeImages]]/[[decodeWavs]]/[[decodeVideos]] run
  * them on the executors. [[decodeStub]] remains as the documented
  * deterministic stand-in SHAPE for formats with no JVM codec at all
  * (e.g. H.264): swap it for a JNI/codec call in production; nothing
  * else changes.
  *
  * Scale design: decoding is mapPartitions (per-partition codec init
  * amortized across rows, the Scala analogue of a batched pandas UDF);
  * frame sampling is a generate/explode that Spark parallelizes per
  * row; nothing touches the driver.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int, height: Int, durationMs: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      feature: Array[Float], // FeatureDim floats
      decodeOk: Boolean)

  val FeatureDim = 16

  /** Deterministic synthetic media corpus (binary payload = seeded bytes). */
  def synthetic(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val rnd = new scala.util.Random(i)
      val payload = Array.fill[Byte](256 + (i % 512).toInt)(rnd.nextInt().toByte)
      MediaRow(i, kind, payload,
        width = if (kind == "image" || kind == "video") 64 + (i % 4).toInt * 32 else 0,
        height = if (kind == "image" || kind == "video") 64 else 0,
        durationMs = if (kind == "image") 0 else 1000 + (i % 10).toInt * 500)
    }
  }

  /** STUB decode — the stand-in for formats the JVM ships no codec for
    * (video): a real implementation would decode the payload and pool
    * pixel/sample values; this fake derives FeatureDim floats from a
    * rolling byte hash — deterministic, so tests can assert exact
    * values. The mapPartitions shape (iterator → iterator, one "codec"
    * per partition) is the production contract; [[decodeImages]] and
    * [[decodeWavs]] are the same shape with real codecs in the loop.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" init would go here (amortized, like
      // mapInPandas batch setup)
      rows.map { m =>
        val feat = new Array[Float](FeatureDim)
        var h = 1125899906842597L // FNV-ish rolling hash
        var i = 0
        while (i < m.bytes.length) {
          h = h * 31 + m.bytes(i)
          feat(i % FeatureDim) += (h & 0xFFFF) / 65535.0f
          i += 1
        }
        val norm = math.sqrt(feat.map(x => x * x.toDouble).sum).toFloat
        MediaFeatures(m.media_id, m.kind,
          if (norm > 0) feat.map(_ / norm) else feat, decodeOk = true)
      }
    }
  }

  case class ImageRow(media_id: Long, bytes: Array[Byte])
  case class ImageFeatures(
      media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, decodeOk: Boolean)

  /** Deterministic REAL PNG corpus: pixel (x,y) of image i is
    * r=(i+x)%256, g=(i+y)%256, b=(i+x+y)%256, encoded losslessly with
    * the JDK's own ImageIO PNG writer on the executors. Because PNG is
    * lossless and the pattern is closed-form, decoded features are
    * exactly predictable — which is what lets a SQL oracle verify a
    * REAL decode path (not the hash stub).
    */
  def syntheticImages(spark: SparkSession, n: Int): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val w = 16 + (i % 8).toInt
      val h = 16
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((i + x) % 256).toInt
          val g = ((i + y) % 256).toInt
          val b = ((i + x + y) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      ImageRow(i, out.toByteArray)
    }
  }

  /** REAL image decode over the binary column: the JDK's ImageIO (PNG /
    * BMP / JPEG readers ship with Java SE — no external codecs needed)
    * inside mapPartitions, pooling per-channel means. Malformed payloads
    * yield decodeOk=false rather than failing the partition. This is
    * the production shape [[decodeStub]] stands in for on formats whose
    * codecs the JVM does not bundle.
    */
  def decodeImages(images: Dataset[ImageRow]): Dataset[ImageFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      rows.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.bytes))
          if (img == null) ImageFeatures(r.media_id, 0, 0, 0, 0, 0, decodeOk = false)
          else {
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            ImageFeatures(r.media_id, w, h,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, decodeOk = true)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            ImageFeatures(r.media_id, 0, 0, 0, 0, 0, decodeOk = false)
        }
      }
    }
  }

  case class AudioRow(media_id: Long, bytes: Array[Byte])
  case class AudioFeatures(
      media_id: Long, sampleRate: Int, nSamples: Int,
      mean: Double, rms: Double, decodeOk: Boolean)

  /** Deterministic REAL WAV corpus: 16-bit PCM mono at 8 kHz, sample k
    * of clip i is ((i*31 + k*7) % 2003) - 1001 — closed-form, so decoded
    * features are exactly predictable. The RIFF/fmt/data header is
    * written by hand (44 bytes, the PCM WAV layout).
    */
  def syntheticWavs(spark: SparkSession, n: Int): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val ns = 800 + (i % 5).toInt * 100
      val dataLen = ns * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(8000).putInt(16000) // sample rate, byte rate
        .putShort(2).putShort(16) // block align, bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var k = 0
      while (k < ns) {
        buf.putShort((((i * 31 + k * 7) % 2003) - 1001).toShort)
        k += 1
      }
      AudioRow(i, buf.array())
    }
  }

  /** REAL audio decode: javax.sound.sampled (the JDK's bundled WAV/PCM
    * codec) parses the container and hands back the PCM frames; mean
    * and RMS amplitude are pooled per clip. Malformed payloads yield
    * decodeOk=false.
    */
  def decodeWavs(audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.bytes))
          val fmt = in.getFormat
          val data = in.readAllBytes()
          in.close()
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val ns = data.length / 2
          var sum = 0L; var sumSq = 0L
          var k = 0
          while (k < ns) {
            val s = bb.getShort(k * 2).toLong
            sum += s; sumSq += s * s
            k += 1
          }
          AudioFeatures(r.media_id, fmt.getSampleRate.toInt, ns,
            sum.toDouble / ns, math.sqrt(sumSq.toDouble / ns), decodeOk = true)
        } catch {
          case scala.util.control.NonFatal(_) =>
            AudioFeatures(r.media_id, 0, 0, 0, 0, decodeOk = false)
        }
      }
    }
  }

  case class VideoRow(media_id: Long, bytes: Array[Byte])
  case class VideoFeatures(
      media_id: Long, width: Int, height: Int, nFrames: Int, fps: Double,
      mean_r: Double, mean_g: Double, mean_b: Double, decodeOk: Boolean)

  /** Deterministic REAL video corpus: MJPEG-in-AVI — a public container
    * format whose frames are plain JPEGs, i.e. the one video format the
    * bare JDK can fully decode (RIFF framing is ~100 lines of chunk
    * walking; the per-frame codec is ImageIO's bundled JPEG reader).
    * Clip i has 4+(i%3) frames of 32x24 SOLID color
    * (r,g,b) = ((i*7+k*13)%256, (i*11+k*17)%256, (i*3+k*29)%256) for
    * frame k: JPEG is lossy, but a solid frame round-trips within ~2
    * intensity units (constant-block DCT is exact up to rounding), so
    * decoded per-channel means are closed-form predictable to a small
    * tolerance — a REAL decode path an oracle can still pin.
    */
  def syntheticMjpegAvis(spark: SparkSession, n: Int): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val frames = (0 until 4 + (i % 3).toInt).map { k =>
        val img = new java.awt.image.BufferedImage(
          32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = ((((i * 7 + k * 13) % 256).toInt << 16) |
          (((i * 11 + k * 17) % 256).toInt << 8) |
          ((i * 3 + k * 29) % 256).toInt)
        val g2 = img.createGraphics()
        g2.setColor(new java.awt.Color(rgb)); g2.fillRect(0, 0, 32, 24)
        g2.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", out)
        out.toByteArray
      }
      VideoRow(i, Mjpeg.writeAvi(frames, width = 32, height = 24, fps = 10))
    }
  }

  /** REAL video decode: walk the AVI RIFF tree (hdrl for the frame rate,
    * movi for the `..dc`/`..db` frame chunks), decode each MJPEG frame
    * with ImageIO, pool per-channel means across frames. Same
    * mapPartitions shape as image/audio; malformed payloads yield
    * decodeOk=false. This retires the last decode stub — image, audio
    * AND video now run real codecs on the executors ([[decodeStub]]
    * remains only as the documented stand-in shape for formats with no
    * JVM codec at all, e.g. H.264).
    */
  def decodeVideos(videos: Dataset[VideoRow]): Dataset[VideoFeatures] = {
    import videos.sparkSession.implicits._
    videos.mapPartitions { rows =>
      rows.map { r =>
        try {
          val avi = Mjpeg.readAvi(r.bytes)
          var sr = 0.0; var sg = 0.0; var sb = 0.0
          var w = 0; var h = 0
          avi.frames.foreach { jb =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(jb))
            w = img.getWidth; h = img.getHeight
            var fr = 0L; var fg = 0L; var fb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                fr += (p >> 16) & 0xFF; fg += (p >> 8) & 0xFF; fb += p & 0xFF
                x += 1
              }
              y += 1
            }
            val np = w.toLong * h
            sr += fr.toDouble / np; sg += fg.toDouble / np; sb += fb.toDouble / np
          }
          val nf = avi.frames.length
          if (nf == 0) VideoFeatures(r.media_id, 0, 0, 0, 0, 0, 0, 0, decodeOk = false)
          else VideoFeatures(r.media_id, w, h, nf, avi.fps,
            sr / nf, sg / nf, sb / nf, decodeOk = true)
        } catch {
          case scala.util.control.NonFatal(_) =>
            VideoFeatures(r.media_id, 0, 0, 0, 0, 0, 0, 0, decodeOk = false)
        }
      }
    }
  }

  /** Frame sampling for video rows: one row per sampled frame at
    * `everyMs` intervals (explode of a sequence — fully parallel).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int = 500): DataFrame = {
    media.toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0), col("durationMs"), lit(everyMs))))
      .select(col("media_id"), col("kind"), col("frame_ms"),
        col("width"), col("height"))
  }

  /** Resize metadata transform (the pixel work is in the stubbed codec;
    * the metadata contract — aspect-preserving target box — is real).
    */
  def resizePlan(media: Dataset[MediaRow], maxSide: Int): DataFrame = {
    media.toDF()
      .filter(col("kind").isin("image", "video"))
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("out_w"), col("out_h"))
  }
}
