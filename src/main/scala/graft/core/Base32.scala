package graft.core

/** Geohash base32 codec (alphabet per the geohash spec, no a/i/l/o) —
  * capability of pangeo-geohash `core/include/geohash/base32.hpp`
  * (SURVEY.md §3.1 #4). 5 bits per character, MSB-first.
  */
object Base32 {
  final val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  // char -> 5-bit value; -1 for invalid. Case-insensitive on input.
  private val Decode: Array[Byte] = {
    val t = Array.fill[Byte](128)(-1)
    var i = 0
    while (i < Alphabet.length) {
      t(Alphabet.charAt(i).toInt) = i.toByte
      t(Alphabet.charAt(i).toUpper.toInt) = i.toByte
      i += 1
    }
    t
  }

  /** Encode the low 5*chars bits of `code` as a geohash string, MSB-first. */
  def encode(code: Long, chars: Int): String = {
    require(chars >= 1 && chars <= 12, s"geohash length must be 1..12, got $chars")
    val sb = new java.lang.StringBuilder(chars)
    var shift = 5 * (chars - 1)
    while (shift >= 0) {
      sb.append(Alphabet.charAt(((code >>> shift) & 0x1FL).toInt))
      shift -= 5
    }
    sb.toString
  }

  /** Decode a geohash string to its right-justified integer code.
    * @return code with 5*s.length significant bits, or throws on invalid char.
    */
  def decode(s: String): Long = {
    require(s.length >= 1 && s.length <= 12, s"geohash length must be 1..12, got '$s'")
    var code = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      val v = if (c < 128) Decode(c) else -1
      require(v >= 0, s"invalid geohash character '${s.charAt(i)}' in '$s'")
      code = (code << 5) | v
      i += 1
    }
    code
  }

  def isValid(s: String): Boolean =
    s.nonEmpty && s.length <= 12 && s.forall(c => c < 128 && Decode(c.toInt) >= 0)
}
