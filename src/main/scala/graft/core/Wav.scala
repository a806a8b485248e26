package graft.core

/** Pure-spec RIFF/WAVE PCM codec — no codec libraries involved: WAV PCM is
  * a fully published container (RIFF chunks: "fmt " with audioFormat=1,
  * then "data" holding little-endian interleaved samples). Supports 16-bit
  * and 8-bit PCM, any channel count/sample rate. This makes the audio
  * column REAL end-to-end in this sandbox (images have javax.imageio;
  * audio has nothing, but WAV needs nothing).
  */
object Wav {

  /** Decoded PCM audio: samples normalized to [-1, 1], channel-interleaved
    * exactly as stored. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Double]) {
    def frames: Int = samples.length / math.max(1, channels)
    def durationS: Double = frames.toDouble / sampleRate
  }

  private def readLeInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
    ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def readLeShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)).toShort.toInt
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE byte payload. Walks the chunk list (tolerating
    * extra chunks like LIST/fact in either order), requires PCM
    * (audioFormat 1) at 8 or 16 bits. Throws IllegalArgumentException on
    * malformed input — callers decide whether that is an error row. */
  def decode(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 44, s"not a WAV: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a WAV: missing RIFF/WAVE magic")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var data: (Int, Int) = null // (offset, len)
    while (off + 8 <= bytes.length && (sampleRate < 0 || data == null)) {
      val id = tag(bytes, off)
      val len = readLeInt(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"truncated chunk $id")
      if (id == "fmt ") {
        require(len >= 16, "fmt chunk too short")
        val fmt = readLeShort(bytes, off + 8)
        require(fmt == 1, s"only PCM (format 1) supported, got $fmt")
        channels = readLeShort(bytes, off + 10)
        sampleRate = readLeInt(bytes, off + 12)
        bits = readLeShort(bytes, off + 22)
        require(bits == 8 || bits == 16, s"only 8/16-bit PCM supported, got $bits")
        require(channels >= 1, s"bad channel count $channels")
        require(sampleRate >= 1, s"bad sample rate $sampleRate")
      } else if (id == "data") data = (off + 8, len)
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "no fmt chunk")
    require(data != null, "no data chunk")
    val (dOff, dLen) = data
    val n = if (bits == 16) dLen / 2 else dLen
    val out = new Array[Double](n)
    var i = 0
    if (bits == 16) {
      while (i < n) { out(i) = readLeShort(bytes, dOff + 2 * i) / 32768.0; i += 1 }
    } else {
      // 8-bit WAV is UNSIGNED with midpoint 128 (per the spec)
      while (i < n) { out(i) = ((bytes(dOff + i) & 0xFF) - 128) / 128.0; i += 1 }
    }
    Pcm(sampleRate, channels, out)
  }

  /** Encode 16-bit PCM WAV (the generator's format). `samples` are
    * channel-interleaved in [-1, 1]; values are clipped then scaled. */
  def encode(samples: Array[Double], sampleRate: Int, channels: Int): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + dataLen); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16)
    b.putShort(1)                           // PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * channels * 2)     // byte rate
    b.putShort((channels * 2).toShort)      // block align
    b.putShort(16)                          // bits per sample
    b.put("data".getBytes); b.putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0, math.min(1.0, samples(i)))
      b.putShort(math.round(v * 32767.0).toShort)
      i += 1
    }
    b.array()
  }

  /** Deterministic synthetic audio: a sine at `freqHz` plus seeded
    * splitmix noise — the audio-table generator's payload (stable across
    * runs, so goldens and dual-path checks hold byte-for-byte). */
  def synth(seed: Long, freqHz: Double, amplitude: Double, noise: Double,
            seconds: Double, sampleRate: Int = 16000): Array[Byte] = {
    val n = math.max(1, (seconds * sampleRate).toInt)
    val out = new Array[Double](n)
    var s = seed
    var i = 0
    while (i < n) {
      // splitmix64 step for the noise term
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      val u = (z >>> 11).toDouble / (1L << 53).toDouble // [0, 1)
      out(i) = amplitude * math.sin(2.0 * math.Pi * freqHz * i / sampleRate) +
               noise * (2.0 * u - 1.0)
      i += 1
    }
    encode(out, sampleRate, 1)
  }
}
