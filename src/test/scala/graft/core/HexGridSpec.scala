package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropHelper

class HexGridSpec extends AnyFunSuite with PropHelper {
  val genLon: Gen[Double] = Gen.choose(-180.0, 180.0)
  val genLat: Gen[Double] = Gen.choose(-89.0, 89.0)
  val genSize: Gen[Double] = Gen.oneOf(0.25, 0.5, 1.0, 2.0)

  test("center round-trip: cell(center(id)) == id") {
    forAll(genLon, genLat, genSize) { (lon, lat, size) =>
      val id = HexGrid.cell(lon, lat, size)
      val (clon, clat) = HexGrid.center(id, size)
      assert(HexGrid.cell(clon, clat, size) == id, s"($lon,$lat) size=$size")
    }
  }

  test("neighbors: 6 distinct cells at hex distance 1, symmetric") {
    forAll(genLon, genLat, genSize) { (lon, lat, size) =>
      val id = HexGrid.cell(lon, lat, size)
      val ns = HexGrid.neighbors(id)
      assert(ns.length == 6 && ns.distinct.length == 6 && !ns.contains(id))
      ns.foreach { n =>
        assert(HexGrid.distance(id, n) == 1)
        assert(HexGrid.neighbors(n).contains(id))
      }
    }
  }

  test("neighbor centers are equidistant (the hex property)") {
    val size = 1.0
    val id = HexGrid.cell(10.0, 20.0, size)
    val (cx, cy) = HexGrid.center(id, size)
    val ds = HexGrid.neighbors(id).map { n =>
      val (nx, ny) = HexGrid.center(n, size)
      math.sqrt((nx - cx) * (nx - cx) + (ny - cy) * (ny - cy))
    }
    ds.foreach(d => assert(math.abs(d - ds.head) < 1e-9, ds.mkString(",")))
    assert(math.abs(ds.head - math.sqrt(3.0) * size) < 1e-9) // center spacing
  }

  test("ring(k): 6k cells, all at distance exactly k; rings partition kRing") {
    val id = HexGrid.cell(-42.0, 13.0, 0.5)
    for (k <- 1 to 5) {
      val r = HexGrid.ring(id, k)
      assert(r.length == 6 * k && r.distinct.length == 6 * k)
      r.foreach(c => assert(HexGrid.distance(id, c) == k))
    }
    val all = (0 to 3).flatMap(HexGrid.ring(id, _))
    assert(all.distinct.length == 1 + 6 + 12 + 18)
  }

  test("nearest-center: every point's assigned hex center is the closest center") {
    forAll(genLon, genLat) { (lon, lat) =>
      val size = 1.0
      val id = HexGrid.cell(lon, lat, size)
      val (cx, cy) = HexGrid.center(id, size)
      val dSelf = (cx - lon) * (cx - lon) + (cy - lat) * (cy - lat)
      HexGrid.neighbors(id).foreach { n =>
        val (nx, ny) = HexGrid.center(n, size)
        val dN = (nx - lon) * (nx - lon) + (ny - lat) * (ny - lat)
        assert(dN >= dSelf - 1e-9, s"($lon,$lat): neighbor center closer than own")
      }
    }
  }
}
