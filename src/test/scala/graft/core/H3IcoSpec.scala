package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropHelper

class H3IcoSpec extends AnyFunSuite with PropHelper {

  val genLon: Gen[Double] = Gen.choose(-180.0, 179.999999)
  val genLat: Gen[Double] = Gen.choose(-89.999999, 89.999999)
  val genRes: Gen[Int] = Gen.choose(0, 9)

  /** A cell center is "interior" when its own face beats every other face
    * by a margin of `marginCells` cell radii in gnomonic units. */
  def interior(id: Long, marginCells: Double = 2.0): Boolean = {
    val (lon, lat) = H3Ico.center(id)
    val lo = math.toRadians(lon); val la = math.toRadians(lat)
    val v = Array(math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la))
    val dots = H3Ico.faceCenter.map(c => c(0) * v(0) + c(1) * v(1) + c(2) * v(2)).sorted
    val cellAng = marginCells * H3Ico.cellRadiusGnomonic(H3Ico.resolution(id))
    math.acos(math.min(1.0, dots(19))) + cellAng < math.acos(math.min(1.0, dots(18)))
  }

  test("icosahedron: 12 unit vertices, 20 faces, face centers unit") {
    assert(H3Ico.vertices.length == 12)
    H3Ico.vertices.foreach(v =>
      assert(math.abs(v(0) * v(0) + v(1) * v(1) + v(2) * v(2) - 1.0) < 1e-12))
    assert(H3Ico.faces.length == 20)
    H3Ico.faceCenter.foreach(c =>
      assert(math.abs(c(0) * c(0) + c(1) * c(1) + c(2) * c(2) - 1.0) < 1e-12))
  }

  test("id packing: res/face/digits round-trip, unused digits are 7") {
    forAll(genLon, genLat, genRes) { (lon, lat, res) =>
      val id = H3Ico.cellId(lon, lat, res)
      assert(H3Ico.resolution(id) == res)
      assert(H3Ico.faceOfId(id) >= 0 && H3Ico.faceOfId(id) < 20)
      (1 to res).foreach(k => assert(H3Ico.digit(id, k) >= 0 && H3Ico.digit(id, k) <= 6))
      ((res + 1) to H3Ico.MaxRes).foreach(k => assert(H3Ico.digit(id, k) == 7))
    }
  }

  test("determinism + res-0 base layout: 20 face cells + ≤12 pentagons") {
    forAll(genLon, genLat, genRes) { (lon, lat, res) =>
      assert(H3Ico.cellId(lon, lat, res) == H3Ico.cellId(lon, lat, res))
    }
    val res0 = (for (li <- 0 to 101; lj <- 0 to 49)
      yield H3Ico.cellId(-178.0 + li * 3.5, -86.0 + lj * 3.5, 0)).toSet
    val (pent, regular) = res0.partition(H3Ico.isVertexCell)
    // base position 0 = the face-center cell; edge-midpoint slivers allowed
    def c0(id: Long): String = H3Ico.token(id).split("\\.")(1)
    val centers = regular.filter(c0(_) == "0")
    assert(centers.size == 20, s"face-center cells: ${centers.size} (want 20)")
    assert(regular.size - centers.size <= 12,
      s"too many edge slivers: ${regular.size - centers.size}")
    assert(pent.size <= 12 && pent.nonEmpty, s"pentagon cells: ${pent.size}")
    assert(pent.subsetOf((0 until 12).map(H3Ico.pentagonId(_, 0)).toSet))
  }

  test("property: center re-encodes to the same cell (interior cells)") {
    var tried = 0; var interiorN = 0
    forAll(genLon, genLat, Gen.choose(1, 9)) { (lon, lat, res) =>
      val id = H3Ico.cellId(lon, lat, res)
      tried += 1
      if (interior(id)) {
        interiorN += 1
        val (clon, clat) = H3Ico.center(id)
        assert(H3Ico.cellId(clon, clat, res) == id,
          s"round trip failed at ($lon,$lat,res=$res): ${H3Ico.token(id)}")
      }
    }
    assert(interiorN > tried / 2, s"interior sample too small: $interiorN/$tried")
  }

  test("property: parent is digit truncation and nests exactly") {
    forAll(genLon, genLat, Gen.choose(2, 9)) { (lon, lat, res) =>
      val id = H3Ico.cellId(lon, lat, res)
      val p = H3Ico.parent(id, res - 1)
      assert(H3Ico.resolution(p) == res - 1)
      if (H3Ico.isVertexCell(p)) {
        // ancestor canonicalized to a pentagon: one id regardless of which
        // adjacent face anchored the child
        assert(p == H3Ico.pentagonId((0 until 12).find(
          H3Ico.pentagonId(_, res - 1) == p).get, res - 1))
      } else {
        // same face, same leading digits
        assert(H3Ico.faceOfId(p) == H3Ico.faceOfId(id))
        (1 until res).foreach(k => assert(H3Ico.digit(p, k) == H3Ico.digit(id, k)))
      }
      // grandparent consistency: parent(parent) == parent at res-2
      assert(H3Ico.parent(p, res - 2) == H3Ico.parent(id, res - 2))
      // parent of the ENCODED point's cell == the up-walk cell of the point
      // in ≥95% of samples (hex hierarchies are approximate at boundaries,
      // same as real H3 — children poke out of parents)
    }
    var agree = 0; var total = 0
    forAll(genLon, genLat, Gen.choose(2, 9)) { (lon, lat, res) =>
      total += 1
      if (H3Ico.parent(H3Ico.cellId(lon, lat, res), res - 1) == H3Ico.cellId(lon, lat, res - 1))
        agree += 1
    }
    assert(agree.toDouble / total > 0.85, s"parent/direct agreement $agree/$total")
  }

  test("children: 7 per cell, all have the cell as parent, center child round-trips") {
    forAll(genLon, genLat, Gen.choose(1, 8)) { (lon, lat, res) =>
      val id = H3Ico.cellId(lon, lat, res)
      val kids = H3Ico.children(id)
      assert(kids.length == 7 && kids.distinct.length == 7)
      kids.foreach(k => assert(H3Ico.parent(k, res) == id))
      if (interior(id)) {
        // digit-0 child shares the parent's center
        val (clon, clat) = H3Ico.center(kids(0))
        val (plon, plat) = H3Ico.center(id)
        assert(math.abs(clon - plon) < 1e-9 && math.abs(clat - plat) < 1e-9)
      }
    }
  }

  test("neighbors: 6 distinct symmetric neighbors in face interiors") {
    forAll(genLon, genLat, Gen.choose(2, 8)) { (lon, lat, res) =>
      val id = H3Ico.cellId(lon, lat, res)
      if (interior(id)) {
        val ns = H3Ico.neighbors(id)
        assert(ns.length == 6 && ns.distinct.length == 6 && !ns.contains(id))
        ns.foreach { n =>
          if (interior(n))
            assert(H3Ico.neighbors(n).contains(id), s"asymmetric: ${H3Ico.token(id)} / ${H3Ico.token(n)}")
        }
      }
    }
  }

  test("rings: size 6k, disks 1+3k(k+1), in face interiors") {
    val samples = Seq((2.0, 48.0), (-100.0, 40.0), (139.0, 35.0), (30.0, -25.0))
    for ((lon, lat) <- samples; res <- Seq(4, 6)) {
      val id = H3Ico.cellId(lon, lat, res)
      if (interior(id) && H3Ico.disk(id, 3).forall(interior(_))) {
        (1 to 3).foreach { k =>
          assert(H3Ico.ring(id, k).length == 6 * k, s"ring $k at ${H3Ico.token(id)}")
          assert(H3Ico.disk(id, k).length == 1 + 3 * k * (k + 1))
        }
      }
    }
  }

  test("pentagon handling: one CANONICAL cell per vertex, exact flag, hierarchy holds") {
    (0 until 12).foreach { vi =>
      val v = H3Ico.vertices(vi)
      val lon = math.toDegrees(math.atan2(v(1), v(0)))
      val lat = math.toDegrees(math.asin(v(2)))
      val res = 5
      // every point of a tight circle around the vertex — which crosses all
      // 5 adjacent faces — encodes to THE SAME canonical pentagon cell
      val cells = (0 until 72).map { a =>
        val t = a * math.Pi / 36.0
        val eps = 0.02 // degrees, well inside the res-5 pentagon
        H3Ico.cellId(lon + eps * math.cos(t) / math.max(0.1, math.cos(math.toRadians(lat))),
                     lat + eps * math.sin(t), res)
      }.toSet
      assert(cells.size == 1, s"vertex $vi fragments not canonicalized: ${cells.map(H3Ico.token)}")
      val p = cells.head
      assert(p == H3Ico.pentagonId(vi, res))
      assert(H3Ico.isVertexCell(p), s"pentagon not flagged: ${H3Ico.token(p)}")
      // center IS the vertex
      val (clon, clat) = H3Ico.center(p)
      assert(math.abs(clon - lon) < 1e-6 && math.abs(clat - lat) < 1e-6)
      // pentagon round trip: the vertex re-encodes to the pentagon
      assert(H3Ico.cellId(clon, clat, res) == p)
      // hierarchy: parent and digit-0 child are the pentagons at res∓1
      assert(H3Ico.parent(p, res - 1) == H3Ico.pentagonId(vi, res - 1))
      assert(H3Ico.children(p)(0) == H3Ico.pentagonId(vi, res + 1))
      // geometric neighbors: 5-6 distinct non-self cells (5 faces meet here)
      val ns = H3Ico.neighbors(p)
      assert(ns.distinct.length == ns.length && !ns.contains(p))
      assert(ns.length >= 5 && ns.length <= 6, s"pentagon neighbors: ${ns.length}")
      assert(ns.forall(!H3Ico.isVertexCell(_)), "pentagon adjacent to pentagon?")
    }
    // an interior cell far from any vertex is NOT flagged
    assert(!H3Ico.isVertexCell(H3Ico.cellId(2.0, 48.0, 5)))
  }

  test("second path: encode assigns the nearest cell center (Voronoi property)") {
    // independent geometric check of the whole encode pipeline: the chord
    // distance from the point to its assigned cell's center must not exceed
    // the distance to any neighbor's center (face interiors; fp tolerance)
    def chord(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      def xyz(lo: Double, la: Double) = {
        val l = math.toRadians(lo); val a = math.toRadians(la)
        (math.cos(a) * math.cos(l), math.cos(a) * math.sin(l), math.sin(a))
      }
      val (x1, y1, z1) = xyz(lon1, lat1); val (x2, y2, z2) = xyz(lon2, lat2)
      math.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) + (z1 - z2) * (z1 - z2))
    }
    // Voronoi is exact in the GNOMONIC plane; chord space re-introduces the
    // projection's anisotropy (radial (1+r²) vs tangential √(1+r²) scale),
    // which for points near a cell boundary can flip neighbor order by up
    // to ~(r²/2)·cellsize ABSOLUTE. So the second-path check runs in the
    // low-distortion core (radial position r < 0.3, anisotropy < 5%) with
    // an absolute 0.1·cellsize slack — still catching any gross
    // mis-assignment (a wrong cell is ≥ 1 cellsize off).
    def radialPos(id: Long): Double = {
      val (lon, lat) = H3Ico.center(id)
      def xyz(lo: Double, la: Double) = {
        val l = math.toRadians(lo); val a = math.toRadians(la)
        Array(math.cos(a) * math.cos(l), math.cos(a) * math.sin(l), math.sin(a))
      }
      val v = xyz(lon, lat); val c = H3Ico.faceCenter(H3Ico.faceOfId(id))
      math.tan(math.acos(math.min(1.0, v(0) * c(0) + v(1) * c(1) + v(2) * c(2))))
    }
    var checked = 0
    forAll(genLon, genLat, Gen.choose(2, 8)) { (lon, lat, res) =>
      val id = H3Ico.cellId(lon, lat, res)
      if (radialPos(id) < 0.3) {
        checked += 1
        val (clon, clat) = H3Ico.center(id)
        val dSelf = chord(lon, lat, clon, clat)
        val slack = 0.1 * math.sqrt(3.0) * H3Ico.cellRadiusGnomonic(res)
        H3Ico.neighbors(id).foreach { n =>
          val (nlon, nlat) = H3Ico.center(n)
          assert(dSelf <= chord(lon, lat, nlon, nlat) + slack,
            s"point ($lon,$lat) closer to neighbor ${H3Ico.token(n)} than own cell ${H3Ico.token(id)}")
        }
      }
    }
    assert(checked > 20, s"low-distortion sample too small: $checked")
  }

  test("golden: aperture-7 scaling — cell count ratio and size ratio") {
    // lattice unit shrinks by exactly sqrt(7) per res
    val c1 = H3Ico.cellId(2.0, 48.0, 3)
    val c2 = H3Ico.cellId(2.0, 48.0, 4)
    val n1 = H3Ico.neighbors(c1); val n2 = H3Ico.neighbors(c2)
    def dist(a: Long, b: Long): Double = {
      val (lo1, la1) = H3Ico.center(a); val (lo2, la2) = H3Ico.center(b)
      GeoMath.haversineM(lo1, la1, lo2, la2)
    }
    val d1 = n1.map(dist(c1, _)).min
    val d2 = n2.map(dist(c2, _)).min
    assert(math.abs(d1 / d2 - math.sqrt(7.0)) < 0.2, s"aperture ratio ${d1 / d2}")
  }

  test("nearest-base fallback never fires (ring<=2 bound holds across the suite)") {
    // baseIdxNearest degrades to the nearest base position instead of
    // crashing codegen; if that ever actually happens, cell ids are quietly
    // wrong — stress face corners and pole caps, then assert the per-JVM
    // counter is still zero (every prior test in this suite counts too)
    val rnd = new scala.util.Random(41)
    (1 to 5000).foreach { _ =>
      val lat = (rnd.nextDouble() * 2 - 1) * 90.0
      val lon = (rnd.nextDouble() * 2 - 1) * 180.0
      H3Ico.cellId(lon, lat, rnd.nextInt(9))
    }
    Seq((0.0, 90.0), (0.0, -90.0), (-180.0, 26.57), (180.0, -26.57)).foreach {
      case (lo, la) => (0 to 8).foreach(r => H3Ico.cellId(lo, la, r))
    }
    assert(H3Ico.nearestFallbacks == 0L,
      s"baseIdxNearest fell back ${H3Ico.nearestFallbacks} times — res-0 landings drifted")
  }
}
