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

  /** Second, independently-arranged implementation of the same polynomial
    * (right-to-left with an accumulated power instead of Horner): dual-path
    * verification for the no-SQL-oracle q45 (VERDICT round-1 #7). Both
    * compute Σ c_i·31^(n-1-i) mod 2^64; 64-bit wraparound arithmetic makes
    * them exactly equal for every input. */
  def rollingHashAlt(s: String): Long = {
    var h = 0L
    var pow = 1L
    var i = s.length - 1
    while (i >= 0) { h += s.charAt(i) * pow; pow *= 31L; i -= 1 }
    h & Long.MaxValue
  }
}
