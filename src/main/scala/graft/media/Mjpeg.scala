package graft.media

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal MJPEG-in-AVI container IO — the RIFF-AVI layout is a public
  * Microsoft format (little-endian FOURCC chunks: `RIFF('AVI '
  * LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' 00dc...))`).
  * Only what a deterministic video fixture needs: one MJPG video
  * stream, no index, no audio. The reader is a structural chunk walker
  * (it trusts sizes, not our writer's offsets), so any MJPEG AVI with
  * `..dc`/`..db` frame chunks decodes.
  */
object Mjpeg {

  case class Avi(frames: Seq[Array[Byte]], fps: Double, width: Int, height: Int)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** One MJPG video stream of `frames` (each an encoded JPEG). */
  def writeAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int): Array[Byte] = {
    val usPerFrame = 1000000 / math.max(1, fps)
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2 // RIFF chunks are word-aligned
      val b = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc(id)).putInt(body.length).put(body)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("LIST")).putInt(4 + body.length).put(fourcc(kind)).put(body)
      b.array()
    }

    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame).putInt(maxFrame * fps).putInt(0)
        .putInt(0x10) // AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE-ish flags are advisory
        .putInt(frames.length).putInt(0).putInt(1).putInt(maxFrame)
        .putInt(width).putInt(height)
      b.array() // trailing reserved[4] stays zero
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")).put(fourcc("MJPG"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(fps) // scale=1, rate=fps
        .putInt(0).putInt(frames.length).putInt(maxFrame)
        .putInt(-1).putInt(0) // quality, sampleSize
      // rcFrame
      b.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      b.array()
    }
    val strf = { // BITMAPINFOHEADER
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .put(fourcc("MJPG")).putInt(width * height * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put(fourcc("RIFF")).putInt(body.length).put(body)
    out.array()
  }

  /** Structural parse: frames from the `movi` list (chunk ids `..dc` /
    * `..db`), fps from `avih`'s microseconds-per-frame, dimensions from
    * `strf`. Throws on a non-AVI payload (callers map that to
    * decodeOk=false).
    */
  def readAvi(bytes: Array[Byte]): Avi = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fcc(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    require(fcc() == "RIFF", "not a RIFF file")
    b.getInt // riff size
    require(fcc() == "AVI ", "not an AVI")

    val frames = Seq.newBuilder[Array[Byte]]
    var fps = 0.0
    var width = 0
    var height = 0

    def walk(end: Int): Unit = {
      while (b.position() + 8 <= end) {
        val id = fcc()
        val sz = b.getInt
        // A corrupt/adversarial chunk size must FAIL, not hang: a
        // negative sz makes `next` move backward (JVM % keeps the sign),
        // so the loop would re-parse the same bytes forever — an
        // executor task spinning on malformed input instead of the
        // decodeOk=false path (callers catch IllegalArgumentException).
        require(sz >= 0 && sz <= end - b.position(),
          s"bad RIFF chunk size $sz at ${b.position() - 8}")
        val next = b.position() + sz + (sz % 2)
        if (id == "LIST") {
          val bodyEnd = b.position() + sz // sz includes the 4-byte kind
          fcc() // list kind — walk into every list (hdrl, strl, movi)
          walk(bodyEnd)
          b.position(next)
        } else {
          if (id == "avih" && sz >= 4) {
            val us = b.getInt
            if (us > 0) fps = 1000000.0 / us
          } else if (id == "strf" && sz >= 12) {
            b.getInt // biSize
            width = b.getInt
            height = math.abs(b.getInt) // negative = top-down rows
          } else if (id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db")) && sz > 0) {
            val f = new Array[Byte](sz)
            b.get(f)
            frames += f
          }
          b.position(next)
        }
      }
    }
    walk(bytes.length)
    Avi(frames.result(), fps, width, height)
  }
}
