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

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of the md5 digest as a non-negative BIGINT — the exact
    * value of `CAST(CONV(SUBSTRING(md5(s), 1, 15), 16, 10) AS BIGINT)`:
    * the first 15 hex chars of the digest ARE its top 60 bits. Computed
    * straight from the digest bytes — no 32-char hex string, no substring,
    * no base-16 string parse — because this runs once per shingle/token in
    * every dedup-family operator (the innermost hot loop at 100 TB). */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val d = md5Local.get().digest(bytes) // digest() resets the instance
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h >>> 4
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
