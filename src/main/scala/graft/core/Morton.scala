package graft.core

/** Morton (Z-order) bit interleaving for 30-bit coordinate indices.
  *
  * Re-expresses the bit-parallel interleave of the reference's int64 geohash
  * codec (pangeo-geohash `core/include/geohash/int64.hpp` — see SURVEY.md §3.1
  * #1-3) using the standard "Binary Magic Numbers" spread/compact sequences
  * (public domain, Stanford Bit Twiddling Hacks). No per-bit loops — each
  * spread/compact is 5 shift/mask steps, branch-free, and therefore also
  * expressible as a single SQL expression for the DuckDB oracle
  * (see [[graft.OracleSql]]).
  *
  * Convention: `interleave(x, y)` puts x (longitude index) at ODD bit
  * positions and y (latitude index) at EVEN positions, so the MSB of the
  * 60-bit result is an x/longitude bit — matching the geohash spec where the
  * leading bit of a code is a longitude bit.
  */
object Morton {
  final val MaxBits = 30 // per dimension; 60-bit codes stay positive in Long

  /** Spread the low 30 bits of v so bit i lands at position 2*i. */
  @inline def spread(v: Long): Long = {
    var x = v & 0x3FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of [[spread]]: gather bits at even positions 2*i back to i. */
  @inline def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** Interleave 30-bit x (odd positions / leading) and y (even positions). */
  @inline def interleave(x: Long, y: Long): Long =
    (spread(x) << 1) | spread(y)

  /** De-interleave: (x, y) from a 60-bit Morton code. */
  @inline def deinterleaveX(m: Long): Long = compact(m >>> 1)
  @inline def deinterleaveY(m: Long): Long = compact(m)
}
