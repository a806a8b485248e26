package graft.core

/** Icosahedral aperture-7 hexagonal cell index — the H3-STYLE index the
  * north_star asks for (BASELINE.json:6 "H3/S2 cell indexing"), built from
  * the published H3 design: gnomonic projection onto the 20 faces of an
  * icosahedron, a hexagonal lattice per face whose unit shrinks by √7 and
  * rotates by atan(√3/5) ≈ 19.1066° per resolution (aperture 7), cells
  * addressed by (face, base-cell digit, per-resolution digits 0..6), parent
  * = digit truncation, children = digit extension.
  *
  * The lattice spacing equals the vertices' gnomonic radius, which makes
  * every face-triangle corner an exact lattice point — and since aperture-7
  * lattices nest (a parent center is always a child lattice point), each of
  * the 12 icosahedron vertices is a cell CENTER at every resolution. Cells
  * centered on a vertex are CANONICAL PENTAGON cells ([[pentagonId]]): the
  * five per-face encodings collapse to one id (owner = lowest adjacent
  * face), exactly detected by [[isVertexCell]], with the aperture-7
  * hierarchy preserved (a pentagon's parent and digit-0 child are the
  * pentagons at the adjacent resolutions).
  *
  * HONESTY NOTE (same posture as [[S2Quad]]): cell IDS ARE NOT Uber-H3
  * bit-compatible. This implementation uses the mathematical icosahedron
  * orientation (vertices at cyclic permutations of (0, ±1, ±φ)), one
  * center base cell per face plus corner/edge base positions (real H3
  * re-centers to 122 base cells), and anchors each non-pentagon cell to the
  * face whose center is nearest the ENCODED POINT — cells straddling face
  * edges are face-clipped fragments. Within face interiors the index has
  * exact H3 semantics: aperture-7 hierarchy by digit arithmetic, 6
  * neighbors, rings of size 6k; pentagons have 5-6 geometric neighbors.
  *
  * All functions are pure scalar math (argmax over 20 faces + res
  * iterations of integer lattice arithmetic), so Catalyst codegen calls
  * them statically inside WholeStageCodegen (see graft.sql H3* expressions).
  *
  * Id packing (59 bits): [face:5][c0:5][res:4][d1..d15: 3 bits each,
  * unused digits = 7] — like H3, unused digit slots hold the invalid
  * marker 7, so ids at different resolutions never collide. c0 indexes the
  * res-0 base position (center, ring 1, ring 2).
  */
object H3Ico {
  final val MaxRes = 15

  // ---- icosahedron geometry (class init, ~microseconds) ----
  private val phi = (1.0 + math.sqrt(5.0)) / 2.0

  /** 12 unit vertices: cyclic permutations of (0, ±1, ±φ). */
  val vertices: Array[Array[Double]] = {
    val n = math.sqrt(1.0 + phi * phi)
    val raw = for {
      s1 <- Seq(1.0, -1.0); s2 <- Seq(1.0, -1.0)
      v <- Seq(Array(0.0, s1 / n, s2 * phi / n),
               Array(s1 / n, s2 * phi / n, 0.0),
               Array(s2 * phi / n, 0.0, s1 / n))
    } yield v
    raw.toArray
  }

  @inline private def dot(a: Array[Double], b: Array[Double]): Double =
    a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  private def norm(a: Array[Double]): Array[Double] = {
    val l = math.sqrt(dot(a, a)); Array(a(0) / l, a(1) / l, a(2) / l)
  }
  private def cross(a: Array[Double], b: Array[Double]): Array[Double] =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))

  /** 20 faces as sorted vertex-index triples (pairwise at edge distance). */
  val faces: Array[(Int, Int, Int)] = {
    val edge = { // min pairwise distance = edge length
      val ds = for (i <- 0 until 12; j <- (i + 1) until 12)
        yield math.sqrt(2 - 2 * dot(vertices(i), vertices(j)))
      ds.min
    }
    def adj(i: Int, j: Int) =
      math.abs(math.sqrt(2 - 2 * dot(vertices(i), vertices(j))) - edge) < 1e-9
    (for {
      a <- 0 until 12; b <- (a + 1) until 12; c <- (b + 1) until 12
      if adj(a, b) && adj(b, c) && adj(a, c)
    } yield (a, b, c)).toArray
  }
  require(faces.length == 20, s"expected 20 faces, got ${faces.length}")

  val faceCenter: Array[Array[Double]] = faces.map { case (a, b, c) =>
    norm(Array(vertices(a)(0) + vertices(b)(0) + vertices(c)(0),
               vertices(a)(1) + vertices(b)(1) + vertices(c)(1),
               vertices(a)(2) + vertices(b)(2) + vertices(c)(2)))
  }
  // tangent-plane basis per face: ex toward vertex 0's gnomonic image, ey = c × ex
  private val faceEx: Array[Array[Double]] = faces.zipWithIndex.map { case ((a, _, _), f) =>
    val c = faceCenter(f); val va = vertices(a)
    val g = Array(va(0) / dot(va, c) - c(0), va(1) / dot(va, c) - c(1), va(2) / dot(va, c) - c(2))
    norm(g)
  }
  private val faceEy: Array[Array[Double]] =
    faceCenter.zip(faceEx).map { case (c, ex) => cross(c, ex) }

  // ---- hex lattice bases per resolution ----
  // res-0 center spacing = the gnomonic radius of the face's VERTICES
  // (≈0.7639, tan of the center→vertex angle). With ex aligned to vertex a
  // (see faceEx), the face triangle's corners are then EXACT res-0 lattice
  // points (1,0), (-1,1), (0,-1) — and because aperture-7 lattices nest
  // (every parent center is a child lattice point), each icosahedron vertex
  // is a cell CENTER at every resolution. That is what makes canonical
  // pentagon cells possible (see the vertex tables below).
  private val Sigma0 = {
    val c = dot(faceCenter(0), vertices(faces(0)._1))
    math.sqrt(1.0 - c * c) / c
  }
  // A_r, B_r: axial basis vectors (60° apart); aperture-7 refinement:
  // A_{r+1} = (3 A_r - B_r)/7, B_{r+1} = (A_r + 2 B_r)/7 (scale 1/√7,
  // rotate atan(√3/5) — the published aperture-7 relation).
  private val (basisA, basisB): (Array[(Double, Double)], Array[(Double, Double)]) = {
    val a = new Array[(Double, Double)](MaxRes + 1)
    val b = new Array[(Double, Double)](MaxRes + 1)
    a(0) = (Sigma0, 0.0)
    b(0) = (Sigma0 * 0.5, Sigma0 * math.sqrt(3.0) / 2.0)
    (0 until MaxRes).foreach { r =>
      val (ax, ay) = a(r); val (bx, by) = b(r)
      a(r + 1) = ((3 * ax - bx) / 7.0, (3 * ay - by) / 7.0)
      b(r + 1) = ((ax + 2 * bx) / 7.0, (ay + 2 * by) / 7.0)
    }
    (a, b)
  }
  private val invM: Array[(Double, Double, Double, Double)] =
    Array.tabulate(MaxRes + 1) { r =>
      val (ax, ay) = basisA(r); val (bx, by) = basisB(r)
      val det = ax * by - ay * bx
      (by / det, -bx / det, -ay / det, ax / det) // rows of M^-1
    }

  // ---- scalar geometry ----
  @inline private def toXyz(lon: Double, lat: Double): (Double, Double, Double) = {
    val lo = math.toRadians(lon); val la = math.toRadians(lat)
    val cl = math.cos(la)
    (cl * math.cos(lo), cl * math.sin(lo), math.sin(la))
  }

  private def faceOf(x: Double, y: Double, z: Double): Int = {
    var best = 0; var bestDot = -2.0
    var f = 0
    while (f < 20) {
      val c = faceCenter(f)
      val d = c(0) * x + c(1) * y + c(2) * z
      if (d > bestDot) { bestDot = d; best = f }
      f += 1
    }
    best
  }

  /** Gnomonic local coords of a unit vector on face f's tangent plane. */
  private def project(f: Int, x: Double, y: Double, z: Double): (Double, Double) = {
    val c = faceCenter(f)
    val s = 1.0 / (c(0) * x + c(1) * y + c(2) * z)
    val px = x * s - c(0); val py = y * s - c(1); val pz = z * s - c(2)
    val ex = faceEx(f); val ey = faceEy(f)
    (px * ex(0) + py * ex(1) + pz * ex(2), px * ey(0) + py * ey(1) + pz * ey(2))
  }

  /** Inverse: face-plane point → (lon, lat). */
  private def unproject(f: Int, u: Double, v: Double): (Double, Double) = {
    val c = faceCenter(f); val ex = faceEx(f); val ey = faceEy(f)
    val wx = c(0) + u * ex(0) + v * ey(0)
    val wy = c(1) + u * ex(1) + v * ey(1)
    val wz = c(2) + u * ex(2) + v * ey(2)
    val l = math.sqrt(wx * wx + wy * wy + wz * wz)
    (math.toDegrees(math.atan2(wy / l, wx / l)), math.toDegrees(math.asin(wz / l)))
  }

  /** Cube-round fractional axial coords to the containing hex. */
  private def hexRound(fq: Double, fr: Double): (Long, Long) = {
    val fs = -fq - fr
    var q = math.round(fq); var r = math.round(fr); val s = math.round(fs)
    val dq = math.abs(q - fq); val dr = math.abs(r - fr); val ds = math.abs(s - fs)
    if (dq > dr && dq > ds) q = -r - s
    else if (dr > ds) r = -q - s
    (q, r)
  }

  /** Fractional lattice coords of a face-plane point at res. */
  @inline private def toLattice(u: Double, v: Double, res: Int): (Double, Double) = {
    val (m00, m01, m10, m11) = invM(res)
    (m00 * u + m01 * v, m10 * u + m11 * v)
  }

  // digit order: center, then the 6 axial unit directions
  private val unitI = Array(0L, 1L, 0L, -1L, -1L, 0L, 1L)
  private val unitJ = Array(0L, 0L, 1L, 1L, 0L, -1L, -1L)
  private def digitOf(di: Long, dj: Long): Int = {
    var d = 0
    while (d < 7) { if (unitI(d) == di && unitJ(d) == dj) return d; d += 1 }
    throw new IllegalStateException(s"aperture-7 residual out of range: ($di,$dj)")
  }

  // res-0 base-cell positions on a face: center, ring 1, ring 2 (with the
  // tight vertex-radius lattice, the aperture-7 up-walk's res-0 landing can
  // drift up to ring 2 for face-corner points; bounded by |p|≤1 + rounding)
  private val baseI: Array[Long] =
    unitI ++ Array(2L, 1L, 0L, -1L, -2L, -2L, -2L, -1L, 0L, 1L, 2L, 2L)
  private val baseJ: Array[Long] =
    unitJ ++ Array(0L, 1L, 2L, 2L, 2L, 1L, 0L, -1L, -2L, -2L, -2L, -1L)
  private def baseIdxOf(i: Long, j: Long): Int = {
    var d = 0
    while (d < baseI.length) { if (baseI(d) == i && baseJ(d) == j) return d; d += 1 }
    throw new IllegalStateException(s"res-0 landing out of range: ($i,$j)")
  }

  /** [[baseIdxOf]] with graceful degradation for the hot cellId path: the
    * aperture-7 up-walk's res-0 landing is ring ≤ 2 for every point we have
    * property-tested (|p| ≤ 1 + rounding), but the bound is empirical, not
    * proven — a face-corner point drifting to ring 3 must degrade to the
    * NEAREST base position (hex distance), not crash the whole codegen
    * stage. */
  private def baseIdxNearest(i: Long, j: Long): Int = {
    var best = 0; var bestD = Long.MaxValue
    var d = 0
    while (d < baseI.length) {
      val di = i - baseI(d); val dj = j - baseJ(d)
      val dist = (math.abs(di) + math.abs(dj) + math.abs(di + dj)) / 2
      if (dist == 0L) return d
      if (dist < bestD) { bestD = dist; best = d }
      d += 1
    }
    // the empirical ring≤2 bound was violated — count it (per JVM) so a
    // silent snap-to-nearest degradation is observable in tests/benchmarks
    // instead of quietly producing a wrong-but-plausible cell id
    nearestFallbackCounter.incrementAndGet()
    best
  }

  private val nearestFallbackCounter = new java.util.concurrent.atomic.AtomicLong(0)
  /** Times [[baseIdxNearest]] failed to find an exact res-0 landing and
    * snapped to the nearest base position (expected 0 — asserted in
    * H3Spec's property runs; mirrors H3U.calibrationConflicts). */
  def nearestFallbacks: Long = nearestFallbackCounter.get()

  // ---- vertex (pentagon) tables ----
  // For each face: the base-cell index (1..6 unit positions) of each of its
  // 3 corner vertices, mapped to the global vertex id; for each vertex: the
  // canonical owner (lowest adjacent face id) and its unit index there.
  private val faceUnitVertex: Array[Map[Int, Int]] = Array.tabulate(20) { f =>
    val (a, b, c) = faces(f)
    Seq(a, b, c).map { vi =>
      val v = vertices(vi)
      val (u, w) = project(f, v(0), v(1), v(2))
      val (fq, fr) = toLattice(u, w, 0)
      val (i, j) = hexRound(fq, fr)
      baseIdxOf(i, j) -> vi
    }.toMap
  }
  private val vertexOwner: Array[(Int, Int)] = Array.tabulate(12) { vi =>
    val owner = (0 until 20).filter(f => faceUnitVertex(f).values.exists(_ == vi)).min
    val unit = faceUnitVertex(owner).collectFirst { case (u, v) if v == vi => u }.get
    (owner, unit)
  }

  // ---- id packing: [face:5][c0:5][res:4][d1..d15 × 3 bits] ----
  @inline def resolution(id: Long): Int = ((id >>> 45) & 0xF).toInt
  @inline def faceOfId(id: Long): Int = ((id >>> 54) & 0x1F).toInt
  @inline private def c0Of(id: Long): Int = ((id >>> 49) & 0x1F).toInt
  @inline def digit(id: Long, k: Int): Int = ((id >>> (45 - 3 * k)) & 0x7).toInt

  private def pack(face: Int, c0: Int, res: Int, digits: Array[Int]): Long = {
    var id = (face.toLong << 54) | (c0.toLong << 49) | (res.toLong << 45)
    var k = 1
    while (k <= MaxRes) {
      val d = if (k <= res) digits(k - 1) else 7
      id |= d.toLong << (45 - 3 * k)
      k += 1
    }
    id
  }

  /** The canonical PENTAGON cell of vertex `vi` at `res`: owner face =
    * lowest adjacent face id, lattice position = the vertex (a cell center
    * at every res — see Sigma0), digits all 0. The 5 per-face fragments
    * around a vertex all canonicalize to this one id. */
  def pentagonId(vi: Int, res: Int): Long = {
    val (owner, unit) = vertexOwner(vi)
    pack(owner, unit, res, new Array[Int](res))
  }

  /** (lon, lat) → cell id at `res`. The H3 pipeline: nearest face →
    * gnomonic → lattice round at res → aperture-7 up-walk extracting one
    * digit per resolution → vertex canonicalization (a cell centered on an
    * icosahedron vertex is the same PENTAGON cell no matter which of the 5
    * adjacent faces anchored it). */
  def cellId(lon: Double, lat: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"res must be 0..$MaxRes, got $res")
    val (x, y, z) = toXyz(lon, lat)
    val f = faceOf(x, y, z)
    val (u, v) = project(f, x, y, z)
    val (fq, fr) = toLattice(u, v, res)
    var (i, j) = hexRound(fq, fr)
    val digits = new Array[Int](res)
    var allZero = true
    var k = res
    while (k >= 1) {
      val (pi, pj) = hexRound((3.0 * i + j) / 7.0, (-i + 2.0 * j) / 7.0)
      val ci = 2 * pi - pj; val cj = pi + 3 * pj // parent center in child units
      val d = digitOf(i - ci, j - cj)
      if (d != 0) allZero = false
      digits(k - 1) = d
      i = pi; j = pj
      k -= 1
    }
    val c0 = baseIdxNearest(i, j)
    // vertex canonicalization: digits all 0 + landing on a corner vertex of
    // this face ⇒ the cell IS that vertex's pentagon
    if (allZero && faceUnitVertex(f).contains(c0))
      pentagonId(faceUnitVertex(f)(c0), res)
    else pack(f, c0, res, digits)
  }

  /** Integer lattice coords of the cell center at its own resolution. */
  private def latticeOfId(id: Long): (Long, Long) = {
    val res = resolution(id)
    val c0 = c0Of(id)
    var i = baseI(c0); var j = baseJ(c0)
    var k = 1
    while (k <= res) {
      val d = digit(id, k)
      val ni = 2 * i - j + unitI(d)
      val nj = i + 3 * j + unitJ(d)
      i = ni; j = nj
      k += 1
    }
    (i, j)
  }

  /** Cell center (lon, lat) — anchored to the cell's own face plane. */
  def center(id: Long): (Double, Double) = {
    val res = resolution(id); val f = faceOfId(id)
    val (i, j) = latticeOfId(id)
    val (ax, ay) = basisA(res); val (bx, by) = basisB(res)
    unproject(f, i * ax + j * bx, i * ay + j * by)
  }

  /** Zoom out by digit truncation — EXACT hierarchy (aperture-7 nesting is
    * by construction, like H3's h3ToParent). If truncation leaves a cell
    * centered on a vertex (all remaining digits 0 on a corner base
    * position), the result canonicalizes to the pentagon id — otherwise an
    * ancestor computed through a non-owner face would alias the same
    * pentagon under up to 5 distinct ids. */
  def parent(id: Long, parentRes: Int): Long = {
    val res = resolution(id)
    require(parentRes >= 0 && parentRes <= res, s"parentRes $parentRes !in 0..$res")
    var out = (id & ~(0xFL << 45)) | (parentRes.toLong << 45)
    var k = parentRes + 1
    while (k <= MaxRes) { out |= 0x7L << (45 - 3 * k); k += 1 }
    val c0 = c0Of(out)
    if ((1 to parentRes).forall(digit(out, _) == 0) &&
        faceUnitVertex(faceOfId(out)).contains(c0))
      pentagonId(faceUnitVertex(faceOfId(out))(c0), parentRes)
    else out
  }

  /** The 7 children of a cell at res+1 (digit extension 0..6). */
  def children(id: Long): Array[Long] = {
    val res = resolution(id)
    require(res < MaxRes, s"children beyond res $MaxRes")
    val base = (id & ~(0xFL << 45)) | ((res + 1).toLong << 45)
    val slot = 45 - 3 * (res + 1)
    Array.tabulate(7)(d => (base & ~(0x7L << slot)) | (d.toLong << slot))
  }

  /** ≤6 adjacent cells: step one lattice unit in the cell's face plane and
    * re-encode the stepped center — exact in face interiors, geometric
    * (nearest-face re-anchoring) across face edges. */
  def neighbors(id: Long): Array[Long] = {
    val res = resolution(id); val f = faceOfId(id)
    val (i, j) = latticeOfId(id)
    val (ax, ay) = basisA(res); val (bx, by) = basisB(res)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var d = 1
    while (d < 7) {
      val ni = i + unitI(d); val nj = j + unitJ(d)
      val (lon, lat) = unproject(f, ni * ax + nj * bx, ni * ay + nj * by)
      val n = cellId(lon, lat, res)
      if (n != id) out += n
      d += 1
    }
    out.toArray
  }

  /** All cells within hex-graph distance k (BFS over [[neighbors]]). */
  def disk(id: Long, k: Int): Array[Long] = {
    require(k >= 0 && k <= 64, s"disk k must be 0..64, got $k")
    var frontier = Set(id)
    val seen = scala.collection.mutable.LinkedHashSet(id)
    var step = 0
    while (step < k) {
      frontier = frontier.flatMap(c => neighbors(c)).filterNot(seen)
      seen ++= frontier
      step += 1
    }
    seen.toArray
  }

  /** Cells at hex-graph distance exactly k (6k in face interiors). */
  def ring(id: Long, k: Int): Array[Long] = {
    if (k == 0) return Array(id)
    val inner = disk(id, k - 1).toSet
    disk(id, k).filterNot(inner)
  }

  /** EXACT pentagon flag: the cell is one of the 12 canonical vertex cells
    * at its resolution (all digits 0, based on a corner-vertex position of
    * its owner face — [[pentagonId]]). */
  def isVertexCell(id: Long): Boolean = {
    val res = resolution(id); val c0 = c0Of(id)
    (1 to res).forall(digit(id, _) == 0) &&
      faceUnitVertex(faceOfId(id)).contains(c0) &&
      pentagonId(faceUnitVertex(faceOfId(id))(c0), res) == id
  }

  /** Gnomonic (≈ angular) circumradius of a cell at `res` — planner/test
    * helper. */
  def cellRadiusGnomonic(res: Int): Double = {
    val (ax, ay) = basisA(res)
    math.sqrt(ax * ax + ay * ay) / math.sqrt(3.0)
  }

  /** Display token: face.c0.res:digits — parseable, sortable within a res. */
  def token(id: Long): String = {
    val res = resolution(id)
    val ds = (1 to res).map(k => digit(id, k).toString).mkString
    s"${faceOfId(id)}.${c0Of(id)}.$res:$ds"
  }
}
