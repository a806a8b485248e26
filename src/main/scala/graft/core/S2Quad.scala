package graft.core

/** S2-STYLE quadtree cell index: unit sphere → 6 cube faces → quadratic
  * (s,t) reprojection → Hilbert-curve position within the face.
  *
  * This is the BASELINE.json north_star "S2 cell indexing" extension (the
  * reference library is geohash-only). It follows the published S2 design
  * (face frames, u→s quadratic transform, Hilbert locality) but does NOT
  * claim bit-compatibility with the S2 library's cell IDs: ids here are
  * right-justified `face(3 bits) ++ hilbert(2·level bits)` longs with the
  * level carried explicitly, matching this engine's geohash key convention
  * (parent == shift). Levels 0..29.
  */
object S2Quad {
  final val MaxLevel = 29

  // ---- sphere ↔ cube-face (u,v) ----

  def xyzFromLonLat(lon: Double, lat: Double): (Double, Double, Double) = {
    val phi = math.toRadians(lat); val theta = math.toRadians(lon)
    val cosphi = math.cos(phi)
    (cosphi * math.cos(theta), cosphi * math.sin(theta), math.sin(phi))
  }

  def lonLatFromXyz(x: Double, y: Double, z: Double): (Double, Double) = {
    val lon = math.toDegrees(math.atan2(y, x))
    val lat = math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))
    (lon, lat)
  }

  /** Face 0..5: axis of largest |component|; +3 when negative. */
  def faceOf(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) { if (x >= 0) 0 else 3 }
    else if (ay >= az) { if (y >= 0) 1 else 4 }
    else { if (z >= 0) 2 else 5 }
  }

  /** (u, v) on the given face (central projection). */
  def uvOnFace(face: Int, x: Double, y: Double, z: Double): (Double, Double) = face match {
    case 0 => (y / x, z / x)
    case 1 => (-x / y, z / y)
    case 2 => (-x / z, -y / z)
    case 3 => (z / x, y / x)
    case 4 => (z / y, -x / y)
    case 5 => (-y / z, -x / z)
    case _ => throw new IllegalArgumentException(s"face $face")
  }

  /** Direction vector of face-plane point (u, v) — valid for |u|,|v| > 1
    * too, which is how cross-face neighbors are resolved. */
  def xyzFromFaceUv(face: Int, u: Double, v: Double): (Double, Double, Double) = face match {
    case 0 => (1, u, v)
    case 1 => (-u, 1, v)
    case 2 => (-u, -v, 1)
    case 3 => (-1, -v, -u)
    case 4 => (v, -1, -u)
    case 5 => (v, u, -1)
    case _ => throw new IllegalArgumentException(s"face $face")
  }

  /** S2's quadratic area-equalizing transform u∈[-1,1] → s∈[0,1]. */
  def stFromUv(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  /** Inverse transform (valid slightly outside [0,1] for neighbor steps). */
  def uvFromSt(s: Double): Double =
    if (s >= 0.5) (4 * s * s - 1) / 3 else (1 - 4 * (1 - s) * (1 - s)) / 3

  // ---- Hilbert curve (order-`level` on a 2^level grid; standard
  //      rotate/flip walk, public-domain algorithm) ----

  /** (i, j) → distance along the Hilbert curve of order `level`. */
  def hilbertD(level: Int, iIn: Long, jIn: Long): Long = {
    var rx = 0L; var ry = 0L; var d = 0L
    var x = iIn; var y = jIn
    var s = 1L << (level - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Distance → (i, j) on the 2^level grid. */
  def hilbertIJ(level: Int, dIn: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = dIn
    var s = 1L
    while (s < (1L << level)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx; y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  // ---- cell ids ----

  @inline private def clampIdx(v: Long, n: Long): Long =
    if (v < 0) 0 else if (v >= n) n - 1 else v

  def ijOf(face: Int, lon: Double, lat: Double, level: Int): (Long, Long) = {
    val (x, y, z) = xyzFromLonLat(lon, lat)
    val (u, v) = uvOnFace(face, x, y, z)
    val n = 1L << level
    (clampIdx((stFromUv(u) * n).toLong, n), clampIdx((stFromUv(v) * n).toLong, n))
  }

  /** Cell id at `level`: face in the top 3 bits of the used range, Hilbert
    * position below — right-justified, sortable within one level. */
  def cellId(lon: Double, lat: Double, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"level must be 0..$MaxLevel, got $level")
    val (x, y, z) = xyzFromLonLat(lon, lat)
    val face = faceOf(x, y, z)
    val (i, j) = ijOf(face, lon, lat, level)
    (face.toLong << (2 * level)) | hilbertD(level, i, j)
  }

  def faceOfCell(id: Long, level: Int): Int = (id >>> (2 * level)).toInt
  def posOfCell(id: Long, level: Int): Long = id & ((1L << (2 * level)) - 1)

  def parent(id: Long, level: Int, parentLevel: Int): Long = {
    require(parentLevel >= 0 && parentLevel <= level)
    id >>> (2 * (level - parentLevel))
  }

  def children(id: Long, level: Int): Array[Long] =
    Array.tabulate(4)(k => (id << 2) | k.toLong)

  /** Cell center (lon, lat). */
  def center(id: Long, level: Int): (Double, Double) = {
    val face = faceOfCell(id, level)
    val (i, j) = hilbertIJ(level, posOfCell(id, level))
    val n = (1L << level).toDouble
    val u = uvFromSt((i + 0.5) / n); val v = uvFromSt((j + 0.5) / n)
    val (x, y, z) = xyzFromFaceUv(face, u, v)
    lonLatFromXyz(x, y, z)
  }

  /** The ≤8 edge/corner neighbors. Same-face steps are exact (i, j) moves;
    * steps off the face project the stepped (s, t) — which extrapolates to
    * u/v beyond ±1 — back to a direction vector and re-encode, landing in
    * the adjacent face's boundary cell (S2 cells align across edges). */
  def neighbors(id: Long, level: Int): Array[Long] = {
    val face = faceOfCell(id, level)
    val (i, j) = hilbertIJ(level, posOfCell(id, level))
    val n = 1L << level
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var dj = -1
    while (dj <= 1) {
      var di = -1
      while (di <= 1) {
        if (di != 0 || dj != 0) {
          val ii = i + di; val jj = j + dj
          if (ii >= 0 && ii < n && jj >= 0 && jj < n) {
            out += ((face.toLong << (2 * level)) | hilbertD(level, ii, jj))
          } else {
            val u = uvFromSt((ii + 0.5) / n.toDouble)
            val v = uvFromSt((jj + 0.5) / n.toDouble)
            val (x, y, z) = xyzFromFaceUv(face, u, v)
            val (lon, lat) = lonLatFromXyz(x, y, z)
            val nid = cellId(lon, lat, level)
            if (nid != id) out += nid
          }
        }
        di += 1
      }
      dj += 1
    }
    out.toArray
  }

  /** Compact token (hex face.pos) for display/joins with string systems. */
  def token(id: Long, level: Int): String =
    s"${faceOfCell(id, level)}/${java.lang.Long.toHexString(posOfCell(id, level))}@$level"
}
