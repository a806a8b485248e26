package graft.core

/** Hexagonal cell index: pointy-top axial hex binning of the lon/lat plane
  * (cube-coordinate rounding, public-domain algorithm per Red Blob Games'
  * hex-grid reference). This supplies the north_star's hexagonal ("H3")
  * cell capability HONESTLY scoped: a planar hex lattice parameterized by
  * cell size in degrees — NOT H3-compatible ids (no icosahedral projection,
  * no aperture-7 hierarchy); that remains flagged as a stretch item
  * (SURVEY.md §8). Hexagons still give the property quadtrees lack:
  * uniform 6-neighbor adjacency with equidistant centers — what hex kNN
  * ring expansion wants.
  *
  * All math is +,×,/,floor — no loops, no trig — so the DuckDB oracle can
  * reproduce ids bit-for-bit. Rounding is floor(x+0.5) (written explicitly
  * on both sides; never a library round(), whose half-rule differs).
  */
object HexGrid {
  private final val Sqrt3 = math.sqrt(3.0)
  private final val Offset = 1L << 20 // keeps packed axial coords positive
  private final val Mask = (1L << 21) - 1

  @inline private def rnd(x: Double): Double = math.floor(x + 0.5)

  /** Axial (q, r) of the hex containing (lon, lat); `size` = hex radius in
    * degrees of latitude. */
  def axial(lon: Double, lat: Double, size: Double): (Long, Long) = {
    val q = (Sqrt3 / 3.0 * lon - 1.0 / 3.0 * lat) / size
    val r = (2.0 / 3.0 * lat) / size
    // cube rounding: x + y + z == 0 must hold after rounding
    val x = q; val z = r; val y = -x - z
    var rx = rnd(x); var ry = rnd(y); var rz = rnd(z)
    val dx = math.abs(rx - x); val dy = math.abs(ry - y); val dz = math.abs(rz - z)
    if (dx > dy && dx > dz) rx = -ry - rz
    else if (dy > dz) ry = -rx - rz
    else rz = -rx - ry
    (rx.toLong, rz.toLong)
  }

  /** Packed 42-bit hex id: (q + 2^20) in the high 21 bits, (r + 2^20) low. */
  def pack(q: Long, r: Long): Long = {
    require(math.abs(q) < Offset && math.abs(r) < Offset, s"axial out of range: ($q, $r)")
    ((q + Offset) << 21) | (r + Offset)
  }
  @inline def unpackQ(id: Long): Long = (id >>> 21) - Offset
  @inline def unpackR(id: Long): Long = (id & Mask) - Offset

  def cell(lon: Double, lat: Double, size: Double): Long = {
    val (q, r) = axial(lon, lat, size)
    pack(q, r)
  }

  /** Hex center (lon, lat) — inverse of the axial transform. */
  def center(id: Long, size: Double): (Double, Double) = {
    val q = unpackQ(id).toDouble; val r = unpackR(id).toDouble
    (size * (Sqrt3 * q + Sqrt3 / 2.0 * r), size * 1.5 * r)
  }

  private val Dirs = Array((1L, 0L), (1L, -1L), (0L, -1L), (-1L, 0L), (-1L, 1L), (0L, 1L))

  /** The 6 adjacent hexes. */
  def neighbors(id: Long): Array[Long] = {
    val q = unpackQ(id); val r = unpackR(id)
    Dirs.map { case (dq, dr) => pack(q + dq, r + dr) }
  }

  /** The ring of hexes at exactly distance k (6k cells; the cell itself for
    * k=0) — the expansion primitive for hex kNN. */
  def ring(id: Long, k: Int): Array[Long] = {
    if (k == 0) return Array(id)
    var q = unpackQ(id) + Dirs(4)._1 * k // start k steps in direction 4
    var r = unpackR(id) + Dirs(4)._2 * k
    val out = new Array[Long](6 * k)
    var n = 0
    var side = 0
    while (side < 6) {
      var step = 0
      while (step < k) {
        out(n) = pack(q, r); n += 1
        q += Dirs(side)._1; r += Dirs(side)._2
        step += 1
      }
      side += 1
    }
    out
  }

  /** Axial hex distance between two cells. */
  def distance(a: Long, b: Long): Long = {
    val dq = unpackQ(a) - unpackQ(b); val dr = unpackR(a) - unpackR(b)
    (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2
  }
}
