package graft.core

/** S2-cell-id implementation of the PUBLISHED S2 scheme (the layout and
  * algorithms documented by the S2 geometry library): 64-bit ids holding
  * `face(3 bits) ++ hilbert position(2·level bits) ++ 1 ++ 0…`, with the
  * quadratic uv↔st reprojection (S2's default S2_QUADRATIC_PROJECTION) and
  * the face-interleaved Hilbert curve.
  *
  * Derivation vs transcription (same policy as [[H3U]]): the only
  * transcribed data are the two CANONICAL 4-entry Hilbert traversal tables
  * (kPosToIJ row 0 and kPosToOrientation — the mathematical definition of
  * the Hilbert sub-cell order) and the 6 published face uv frames (shared
  * with [[S2Quad]]); the 4-bit-block lookup tables are DERIVED at class
  * load by the published recursive construction, and the other kPosToIJ
  * rows are derived from row 0 by applying swap/invert.
  *
  * Bit-compatibility caveat, stated honestly: this sandbox has no S2
  * library and no network, so official golden VECTORS cannot be checked
  * here. What IS pinned by tests: the documented layout facts (the six
  * level-0 face cells are tokens "1","3","5","7","9","b"; leaf ids are
  * odd; level = 30 − tz/2; parent = truncate-and-set-sentinel), Hilbert
  * curve continuity (consecutive leaf positions are lattice neighbors),
  * exact (face,i,j) round trips, the quadratic st transform inverse, and
  * a derived whole-sphere checksum golden that locks the implementation
  * against regressions.
  */
object S2U {
  final val MaxLevel = 30
  final val NumFaces = 6

  private final val LookupBits = 4
  private final val SwapMask = 1
  private final val InvertMask = 2

  // canonical Hilbert sub-cell order (orientation 0): traversal position →
  // ij quadrant, and the orientation change each sub-cell applies
  private val posToIJ0 = Array(0, 1, 3, 2)
  private val posToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)

  // rows 1..3 derived from row 0: orientation bits swap i/j and invert
  private val posToIJ: Array[Array[Int]] = Array.tabulate(4) { o =>
    Array.tabulate(4) { p =>
      val ij0 = posToIJ0(p)
      var i = ij0 >> 1; var j = ij0 & 1
      if ((o & SwapMask) != 0) { val t = i; i = j; j = t }
      if ((o & InvertMask) != 0) { i = 1 - i; j = 1 - j }
      (i << 1) | j
    }
  }

  // 4-bit-block lookups, built by the published recursive construction:
  // lookupPos[(ij << 2) | origOrientation] = (pos << 2) | orientation
  private val lookupPos = new Array[Int](1 << (2 * LookupBits + 2))
  private val lookupIj = new Array[Int](1 << (2 * LookupBits + 2))
  locally {
    def init(level: Int, i: Int, j: Int, origOrientation: Int,
             pos: Int, orientation: Int): Unit = {
      if (level == LookupBits) {
        val ij = (i << LookupBits) + j
        lookupPos((ij << 2) + origOrientation) = (pos << 2) + orientation
        lookupIj((pos << 2) + origOrientation) = (ij << 2) + orientation
      } else {
        val r = posToIJ(orientation)
        var sub = 0
        while (sub < 4) {
          init(level + 1, (i << 1) + (r(sub) >> 1), (j << 1) + (r(sub) & 1),
            origOrientation, (pos << 2) + sub, orientation ^ posToOrientation(sub))
          sub += 1
        }
      }
    }
    var o = 0
    while (o < 4) { init(0, 0, 0, o, 0, o); o += 1 }
  }
  // self-check of the derived rows: each is a permutation and the whole
  // level-4 curve is continuous (verified exhaustively in S2USpec)
  require(posToIJ.forall(_.sorted.sameElements(Array(0, 1, 2, 3))),
    "derived posToIJ rows are not permutations")

  // ---- quadratic st ↔ uv (published S2_QUADRATIC_PROJECTION) ----
  def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4.0 * s * s - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
  def uvToSt(u: Double): Double =
    if (u >= 0.0) 0.5 * math.sqrt(1.0 + 3.0 * u)
    else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)

  private def stToIj(s: Double): Int =
    math.max(0, math.min((1 << MaxLevel) - 1, math.floor(s * (1 << MaxLevel)).toInt))

  // ---- encode ----
  /** Leaf (level-30) cell id of a lon/lat point. */
  def lonLatToCell(lonDeg: Double, latDeg: Double): Long = {
    val (x, y, z) = S2Quad.xyzFromLonLat(lonDeg, latDeg)
    val face = S2Quad.faceOf(x, y, z)
    val (u, v) = S2Quad.uvOnFace(face, x, y, z)
    fromFaceIj(face, stToIj(uvToSt(u)), stToIj(uvToSt(v)))
  }

  /** Cell id at `level` containing the point. */
  def lonLatToCellAt(lonDeg: Double, latDeg: Double, level: Int): Long =
    parent(lonLatToCell(lonDeg, latDeg), level)

  /** Leaf id from (face, i, j) — the published FromFaceIJ 4-bit pipeline. */
  def fromFaceIj(face: Int, i: Int, j: Int): Long = {
    var n = face.toLong << 60
    var bits = face & SwapMask
    var k = 7
    while (k >= 0) {
      val mask = (1 << LookupBits) - 1
      var b = bits
      b += ((i >> (k * LookupBits)) & mask) << (LookupBits + 2)
      b += ((j >> (k * LookupBits)) & mask) << 2
      b = lookupPos(b)
      n |= (b >> 2).toLong << (k * 2 * LookupBits)
      bits = b & (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1
  }

  /** (face, i, j) of the id's position bits — published
    * ToFaceIJOrientation (for non-leaf cells this is the leaf encoded by
    * the remaining position bits; combine with [[centerLonLat]]). */
  def toFaceIj(id: Long): (Int, Int, Int) = {
    var i = 0; var j = 0
    val face = faceOf(id)
    var bits = face & SwapMask
    var k = 7
    while (k >= 0) {
      val nbits = if (k == 7) MaxLevel - 7 * LookupBits else LookupBits
      var b = bits
      b += (((id >>> (k * 2 * LookupBits + 1)) & ((1 << (2 * nbits)) - 1)).toInt) << 2
      b = lookupIj(b)
      i += (b >> (LookupBits + 2)) << (k * LookupBits)
      j += ((b >> 2) & ((1 << LookupBits) - 1)) << (k * LookupBits)
      bits = b & (SwapMask | InvertMask)
      k -= 1
    }
    (face, i, j)
  }

  // ---- id algebra (published layout invariants) ----
  @inline def faceOf(id: Long): Int = (id >>> 61).toInt
  @inline def lsb(id: Long): Long = id & (-id)
  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)
  def isLeaf(id: Long): Boolean = (id & 1L) != 0
  def isValid(id: Long): Boolean =
    faceOf(id) < NumFaces && (lsb(id) & 0x1555555555555555L) != 0

  def parent(id: Long, level: Int): Long = {
    require(level >= 0 && level <= this.level(id), s"level $level above cell")
    val nlsb = 1L << (2 * (MaxLevel - level))
    (id & -nlsb) | nlsb
  }

  /** The 4 children, in Hilbert traversal order. */
  def children(id: Long): Array[Long] = {
    require(!isLeaf(id), "leaf cells have no children")
    val childLsb = lsb(id) >> 2
    Array.tabulate(4)(p => id - lsb(id) + childLsb + 2L * p * childLsb)
  }

  /** Range of leaf ids contained in the cell: [rangeMin, rangeMax]. */
  def rangeMin(id: Long): Long = id - (lsb(id) - 1)
  def rangeMax(id: Long): Long = id + (lsb(id) - 1)
  def contains(id: Long, other: Long): Boolean =
    other >= rangeMin(id) && other <= rangeMax(id)

  /** Lower-case hex token with trailing zeros stripped (published form). */
  def token(id: Long): String = {
    if (id == 0) return "X"
    val s = f"$id%016x"
    s.reverse.dropWhile(_ == '0').reverse
  }
  def fromToken(t: String): Long =
    if (t == "X") 0L
    else java.lang.Long.parseUnsignedLong(t.padTo(16, '0'), 16)

  /** Cell center as (lon°, lat°) — published GetCenterSiTi: decode the
    * position bits to the corner leaf, then offset by the level's center
    * delta in the doubled-resolution (si, ti) grid. */
  def centerLonLat(id: Long): (Double, Double) = {
    val (face, i, j) = toFaceIj(id)
    val delta =
      if (isLeaf(id)) 1
      else if (((i ^ (id >>> 2).toInt) & 1) != 0) 2
      else 0
    val si = 2L * i + delta
    val ti = 2L * j + delta
    val u = stToUv(si.toDouble / (1L << (MaxLevel + 1)))
    val v = stToUv(ti.toDouble / (1L << (MaxLevel + 1)))
    val (x, y, z) = S2Quad.xyzFromFaceUv(face, u, v)
    S2Quad.lonLatFromXyz(x, y, z)
  }

  /** A LOWER bound (degrees) on the angular width of any level-`level`
    * cell: the quadratic transform's minimum du/ds is 4/3 (at the face
    * center) and dθ/du = 1/(1+u²) ≥ 1/2 on the face, so every cell is at
    * least (2/3)/2^level rad wide; (1/3)/2^level keeps an extra 2×
    * margin. Used as the per-ring coverage step of the kNN expansion —
    * under-estimating the width only ever OVER-expands. */
  def minCellWidthDeg(level: Int): Double =
    math.toDegrees((1.0 / 3.0) / (1L << level).toDouble)

  /** Conservative covering of a lon/lat box at `level` (same contract as
    * Geohash.covering / H3U.polyfillBox: a superset; callers refine
    * exactly). The box boundary is sampled densely; each touched face
    * contributes the padded (i, j) rectangle of its samples at `level`.
    * Extremes of the smooth uv maps over the closed box lie on its
    * boundary, and the ±1-cell pad absorbs inter-sample deviation —
    * soundness is property-tested in S2USpec. Non-wrapped boxes. */
  def coverBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
               level: Int, maxCells: Int = 1 << 20): Array[Long] = {
    require(minLon <= maxLon && minLat <= maxLat, "coverBox needs a non-wrapped box")
    require(level >= 0 && level <= MaxLevel, s"level $level")
    val shift = MaxLevel - level
    val samples = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val n = 256
    (0 to n).foreach { k =>
      val fLon = minLon + (maxLon - minLon) * k / n
      val fLat = minLat + (maxLat - minLat) * k / n
      samples += ((fLon, minLat)); samples += ((fLon, maxLat))
      samples += ((minLon, fLat)); samples += ((maxLon, fLat))
    }
    // u/v critical lines of the central projection can sit strictly inside
    // the box (e.g. lon = 0 on the ±x faces): include the interior grid
    // lines through multiples of 45° to capture them
    var g = math.ceil(minLon / 45.0) * 45.0
    while (g <= maxLon) {
      (0 to n).foreach { k => samples += ((g, minLat + (maxLat - minLat) * k / n)) }
      g += 45.0
    }
    g = math.ceil(minLat / 45.0) * 45.0
    while (g <= maxLat) {
      (0 to n).foreach { k => samples += ((minLon + (maxLon - minLon) * k / n, g)) }
      g += 45.0
    }
    val byFace = samples.toSeq.map { case (lo, la) =>
      val (x, y, z) = S2Quad.xyzFromLonLat(lo, la)
      val face = S2Quad.faceOf(x, y, z)
      val (u, v) = S2Quad.uvOnFace(face, x, y, z)
      (face, stToIj(uvToSt(u)) >> shift, stToIj(uvToSt(v)) >> shift)
    }.groupBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val maxIdx = (1 << level) - 1
    byFace.toSeq.sortBy(_._1).foreach { case (face, pts) =>
      val i0 = math.max(0, pts.map(_._2).min - 1)
      val i1 = math.min(maxIdx, pts.map(_._2).max + 1)
      val j0 = math.max(0, pts.map(_._3).min - 1)
      val j1 = math.min(maxIdx, pts.map(_._3).max + 1)
      require((i1 - i0 + 1).toLong * (j1 - j0 + 1) + out.size <= maxCells,
        s"coverBox would exceed $maxCells cells; use a coarser level")
      var i = i0
      while (i <= i1) {
        var j = j0
        while (j <= j1) {
          out += parent(fromFaceIj(face, i << shift, j << shift), level)
          j += 1
        }
        i += 1
      }
    }
    out.distinct.toArray
  }
}
