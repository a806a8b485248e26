package graft.core

/** Pure-spec RIFF/AVI container codec for MJPEG video — the same policy as
  * [[Wav]]: AVI is a published RIFF chunk format and MJPEG frames are
  * plain JPEG payloads, so a video column can be REAL in this sandbox
  * (container walked here, frames decodable by javax.imageio, no codec
  * library involved). Writer emits a minimal spec-conformant file
  * (hdrl: avih + one 'vids'/'MJPG' stream; movi: one '00dc' chunk per
  * frame); reader tolerates extra chunks/lists and both '..dc'/'..db'
  * frame ids.
  */
object Avi {

  /** Parsed MJPEG video: per-frame JPEG payloads plus header metadata. */
  final case class Mjpeg(width: Int, height: Int, fps: Double,
                         frames: IndexedSeq[Array[Byte]])

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
    ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Parse a RIFF/AVI payload: walk the chunk list, read dims/rate from
    * 'avih', collect every video frame chunk inside LIST 'movi'. Throws
    * IllegalArgumentException on malformed input. */
  def decode(bytes: Array[Byte]): Mjpeg = {
    require(bytes.length >= 24, s"not an AVI: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ",
      "not an AVI: missing RIFF/AVI magic")
    var width = -1; var height = -1; var usPerFrame = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = tag(bytes, off)
        val len = leInt(bytes, off + 4)
        require(len >= 0 && off + 8 + len <= end, s"truncated chunk $id")
        if (id == "LIST") {
          require(len >= 4, "LIST too short")
          val listType = tag(bytes, off + 8)
          walk(off + 12, off + 8 + len, inMovi || listType == "movi")
        } else if (id == "avih") {
          require(len >= 40, "avih too short")
          usPerFrame = leInt(bytes, off + 8)
          width = leInt(bytes, off + 8 + 32)
          height = leInt(bytes, off + 8 + 36)
        } else if (inMovi && id.length == 4 &&
                   (id.endsWith("dc") || id.endsWith("db"))) {
          frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length, inMovi = false)
    require(width > 0 && height > 0, "no avih header")
    require(frames.nonEmpty, "no video frames in movi")
    val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
    Mjpeg(width, height, fps, frames.toIndexedSeq)
  }

  /** Build a minimal MJPEG AVI around pre-encoded JPEG frame payloads
    * (the JPEG encoding itself is the caller's business — javax.imageio
    * in this sandbox). */
  def encode(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
             fps: Double = 10.0): Array[Byte] = {
    require(jpegFrames.nonEmpty, "need at least one frame")
    require(fps > 0, s"fps must be positive, got $fps")
    val paddedSizes = jpegFrames.map(f => f.length + (f.length & 1))
    val moviLen = 4 + paddedSizes.map(_ + 8).sum
    val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val b = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    val maxFrame = jpegFrames.map(_.length).max

    fourcc("RIFF"); b.putInt(riffLen); fourcc("AVI ")
    // ---- hdrl ----
    fourcc("LIST"); b.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(math.round(1e6 / fps).toInt)   // dwMicroSecPerFrame
    b.putInt(0)                             // dwMaxBytesPerSec
    b.putInt(0)                             // dwPaddingGranularity
    b.putInt(0)                             // dwFlags
    b.putInt(jpegFrames.length)             // dwTotalFrames
    b.putInt(0)                             // dwInitialFrames
    b.putInt(1)                             // dwStreams
    b.putInt(maxFrame)                      // dwSuggestedBufferSize
    b.putInt(width); b.putInt(height)
    (0 until 4).foreach(_ => b.putInt(0))   // dwReserved
    // ---- strl ----
    fourcc("LIST"); b.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    b.putInt(0); b.putShort(0); b.putShort(0) // flags, priority, language
    b.putInt(0)                               // dwInitialFrames
    // fps as a RATIONAL (rate/scale = fps): scale 1000 keeps sub-integer
    // frame rates (e.g. 29.97) consistent with avih's dwMicroSecPerFrame
    // instead of truncating to the nearest integer fps in stream metadata
    b.putInt(1000)                            // dwScale
    b.putInt(math.round(fps * 1000.0).toInt)  // dwRate (fps = rate/scale)
    b.putInt(0)                               // dwStart
    b.putInt(jpegFrames.length)               // dwLength
    b.putInt(maxFrame)                        // dwSuggestedBufferSize
    b.putInt(-1)                              // dwQuality
    b.putInt(0)                               // dwSampleSize
    b.putShort(0); b.putShort(0); b.putShort(width.toShort); b.putShort(height.toShort)
    fourcc("strf"); b.putInt(40)
    b.putInt(40)                              // biSize
    b.putInt(width); b.putInt(height)
    b.putShort(1); b.putShort(24)             // planes, bitcount
    fourcc("MJPG")                            // biCompression
    b.putInt(width * height * 3)              // biSizeImage
    b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
    // ---- movi ----
    fourcc("LIST"); b.putInt(moviLen); fourcc("movi")
    jpegFrames.foreach { f =>
      fourcc("00dc"); b.putInt(f.length); b.put(f)
      if ((f.length & 1) == 1) b.put(0.toByte)
    }
    b.array()
  }
}
