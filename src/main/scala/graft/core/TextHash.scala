package graft.core

/** Character-level rolling (polynomial) document fingerprint: h_{i+1} =
  * h_i * 31 + codepoint, 64-bit wraparound, sign-cleared — the classic
  * streaming fingerprint (per-char loop, hence a Catalyst expression rather
  * than an oracle-SQL op). */
object TextHash {
  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31L + s.charAt(i); i += 1 }
    h & Long.MaxValue
  }
}
