package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropHelper

class S2QuadSpec extends AnyFunSuite with PropHelper {
  val genLon: Gen[Double] = Gen.choose(-180.0, 179.999999)
  val genLat: Gen[Double] = Gen.choose(-89.9, 89.9)
  val genLevel: Gen[Int] = Gen.choose(1, 20)

  test("hilbert d↔(i,j) round-trips and is a bijection on small grids") {
    for (level <- 1 to 6) {
      val n = 1 << level
      val ds = for (i <- 0L until n; j <- 0L until n) yield S2Quad.hilbertD(level, i, j)
      assert(ds.toSet.size == n * n, s"not a bijection at level $level")
      assert(ds.min == 0 && ds.max == n.toLong * n - 1)
      ds.zipWithIndex.foreach { case (d, k) =>
        val (i, j) = (k / n, k % n)
        assert(S2Quad.hilbertIJ(level, d) == (i.toLong, j.toLong))
      }
    }
  }

  test("hilbert locality: consecutive d are grid-adjacent") {
    val level = 6; val n = 1 << level
    (0L until (n.toLong * n - 1)).foreach { d =>
      val (x1, y1) = S2Quad.hilbertIJ(level, d)
      val (x2, y2) = S2Quad.hilbertIJ(level, d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  test("st/uv transforms invert") {
    forAll(Gen.choose(-1.0, 1.0)) { u =>
      assert(math.abs(S2Quad.uvFromSt(S2Quad.stFromUv(u)) - u) < 1e-12)
    }
  }

  test("xyz/face/uv round-trips to the same direction") {
    forAll(genLon, genLat) { (lon, lat) =>
      val (x, y, z) = S2Quad.xyzFromLonLat(lon, lat)
      val f = S2Quad.faceOf(x, y, z)
      val (u, v) = S2Quad.uvOnFace(f, x, y, z)
      assert(u >= -1.0000001 && u <= 1.0000001 && v >= -1.0000001 && v <= 1.0000001,
        s"uv out of face range: $u $v at ($lon,$lat) face $f")
      val (lon2, lat2) = S2Quad.lonLatFromXyz(S2Quad.xyzFromFaceUv(f, u, v)._1,
        S2Quad.xyzFromFaceUv(f, u, v)._2, S2Quad.xyzFromFaceUv(f, u, v)._3)
      assert(math.abs(lat2 - lat) < 1e-9)
      assert(math.abs(Geohash.normLon(lon2 - lon + 180.0) - 0.0 + 180.0) % 360.0 < 1e-9 ||
             math.abs(lon2 - lon) < 1e-9)
    }
  }

  test("cellId round-trip: center encodes to the same cell; parent nests") {
    forAll(genLon, genLat, genLevel) { (lon, lat, level) =>
      val id = S2Quad.cellId(lon, lat, level)
      val (clon, clat) = S2Quad.center(id, level)
      assert(S2Quad.cellId(clon, clat, level) == id, s"center round-trip at $lon,$lat L$level")
      // parent/child consistency
      if (level > 1) {
        val p = S2Quad.parent(id, level, level - 1)
        assert(S2Quad.cellId(lon, lat, level - 1) == p)
        assert(S2Quad.children(p, level - 1).contains(id))
      }
    }
  }

  test("neighbors: 8 in face interiors, symmetric, distinct, exclude self") {
    forAll(genLon, genLat, Gen.choose(4, 16)) { (lon, lat, level) =>
      val id = S2Quad.cellId(lon, lat, level)
      val ns = S2Quad.neighbors(id, level)
      assert(ns.length >= 3 && ns.length <= 8, s"${ns.length} neighbors")
      assert(!ns.contains(id))
      assert(ns.distinct.length == ns.length)
      ns.foreach { nb =>
        assert(S2Quad.neighbors(nb, level).contains(id),
          s"asymmetric: ${S2Quad.token(id, level)} vs ${S2Quad.token(nb, level)}")
      }
    }
  }

  test("cross-face neighbors: a cell at the face edge has neighbors on another face") {
    // lon=44.99..45.01 straddles the face-0/face-1 edge at the equator
    val l = 10
    val idWest = S2Quad.cellId(44.99, 0.0, l)
    val idEast = S2Quad.cellId(45.01, 0.0, l)
    assert(S2Quad.faceOfCell(idWest, l) != S2Quad.faceOfCell(idEast, l))
    assert(S2Quad.neighbors(idWest, l).contains(idEast))
    assert(S2Quad.neighbors(idEast, l).contains(idWest))
    // poles live on faces 2/5
    assert(S2Quad.faceOfCell(S2Quad.cellId(0, 89.9, l), l) == 2)
    assert(S2Quad.faceOfCell(S2Quad.cellId(0, -89.9, l), l) == 5)
  }

  test("six faces partition the sphere: every point gets exactly one cell") {
    // counts per face over a lat/lon grid are all nonzero and sum to total
    val level = 3
    var total = 0
    val perFace = new Array[Int](6)
    for (lon <- -175 to 175 by 7; lat <- -85 to 85 by 7) {
      val id = S2Quad.cellId(lon.toDouble, lat.toDouble, level)
      perFace(S2Quad.faceOfCell(id, level)) += 1
      total += 1
    }
    assert(perFace.forall(_ > 0), perFace.mkString(","))
    assert(perFace.sum == total)
  }
}
