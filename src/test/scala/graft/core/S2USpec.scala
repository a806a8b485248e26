package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Validation of [[S2U]] against the PUBLISHED S2 cell-id scheme. No S2
  * library exists in this sandbox, so official golden vectors cannot be
  * imported; what is pinned instead: the documented layout facts, full
  * structural invariants (exact round trips, Hilbert continuity, range
  * algebra), and derived landmark goldens whose regional prefixes match
  * publicly cited S2 tokens (NYC 89c2…, London 4876…, Paris 47e6…) and
  * the s2sphere-documented id of (0°, 0°). */
class S2USpec extends AnyFunSuite {

  test("documented layout: six level-0 face cells are tokens 1,3,5,7,9,b") {
    val tokens = (0 until 6).map(f => S2U.token(S2U.parent(S2U.fromFaceIj(f, 0, 0), 0)))
    assert(tokens == Seq("1", "3", "5", "7", "9", "b"))
  }

  test("golden: (0,0) leaf id and landmark level-12 tokens") {
    // the equator/prime-meridian leaf: face 0 center (documented example id)
    assert(S2U.lonLatToCell(0.0, 0.0) == 1152921504606846977L)
    assert(S2U.token(S2U.lonLatToCell(0.0, 0.0)) == "1000000000000001")
    // derived landmark goldens; prefixes match publicly cited S2 tokens
    assert(S2U.token(S2U.lonLatToCellAt(-74.0060, 40.7128, 12)) == "89c25a3") // NYC
    assert(S2U.token(S2U.lonLatToCellAt(-0.1276, 51.5074, 12)) == "487604d") // London
    assert(S2U.token(S2U.lonLatToCellAt(2.3522, 48.8566, 12)) == "47e66e1")  // Paris
    assert(S2U.token(S2U.lonLatToCellAt(139.6917, 35.6895, 12)) == "60188cd") // Tokyo
  }

  test("(face,i,j) <-> leaf id round trips exactly") {
    val rnd = new scala.util.Random(3)
    (1 to 50000).foreach { _ =>
      val f = rnd.nextInt(6); val i = rnd.nextInt(1 << 30); val j = rnd.nextInt(1 << 30)
      val id = S2U.fromFaceIj(f, i, j)
      assert(S2U.isLeaf(id) && S2U.isValid(id) && S2U.level(id) == 30)
      assert(S2U.toFaceIj(id) == ((f, i, j)))
    }
  }

  test("Hilbert continuity: consecutive leaf positions are lattice neighbors") {
    val starts = Seq(S2U.fromFaceIj(0, 0, 0), S2U.fromFaceIj(2, 123456, 654321),
      S2U.fromFaceIj(5, (1 << 29) - 7, 1 << 28))
    starts.foreach { base =>
      (0 until 20000).foreach { t =>
        val (f1, i1, j1) = S2U.toFaceIj(base + 2L * t)
        val (f2, i2, j2) = S2U.toFaceIj(base + 2L * t + 2L)
        assert(f1 == f2 && math.abs(i1 - i2) + math.abs(j1 - j2) == 1,
          s"discontinuity at offset $t from ${S2U.token(base)}")
      }
    }
  }

  test("center re-encode: every cell's center encodes back to the cell, level 0..30") {
    val rnd = new scala.util.Random(17)
    (1 to 5000).foreach { _ =>
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val level = rnd.nextInt(31)
      val id = S2U.lonLatToCellAt(lon, lat, level)
      assert(S2U.level(id) == level)
      val (clon, clat) = S2U.centerLonLat(id)
      assert(S2U.lonLatToCellAt(clon, clat, level) == id,
        s"center of ${S2U.token(id)} re-encodes elsewhere")
    }
  }

  test("parent/children/range algebra") {
    val rnd = new scala.util.Random(29)
    (1 to 2000).foreach { _ =>
      val leaf = S2U.lonLatToCell(rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85)
      val lvl = 1 + rnd.nextInt(29)
      val p = S2U.parent(leaf, lvl)
      assert(S2U.level(p) == lvl && S2U.contains(p, leaf))
      val kids = S2U.children(p)
      assert(kids.length == 4 && kids.forall(k => S2U.parent(k, lvl) == p))
      // children tile the parent's leaf range in Hilbert order
      assert(S2U.rangeMin(kids.head) == S2U.rangeMin(p))
      assert(S2U.rangeMax(kids.last) == S2U.rangeMax(p))
      kids.sliding(2).foreach { case Array(a, b) =>
        assert(S2U.rangeMax(a) + 2 == S2U.rangeMin(b))
      }
    }
  }

  test("quadratic st<->uv transform: exact inverse, fixed points") {
    assert(S2U.stToUv(0.5) == 0.0 && S2U.stToUv(0.0) == -1.0 && S2U.stToUv(1.0) == 1.0)
    val rnd = new scala.util.Random(41)
    (1 to 10000).foreach { _ =>
      val s = rnd.nextDouble()
      assert(math.abs(S2U.uvToSt(S2U.stToUv(s)) - s) < 1e-14)
    }
  }

  test("token round trip") {
    val rnd = new scala.util.Random(53)
    (1 to 5000).foreach { _ =>
      val id = S2U.lonLatToCellAt(rnd.nextDouble() * 360 - 180,
        rnd.nextDouble() * 180 - 90, rnd.nextInt(31))
      assert(S2U.fromToken(S2U.token(id)) == id)
    }
  }

  test("coverBox: sound covering across random boxes incl. face crossings") {
    val rnd = new scala.util.Random(61)
    (1 to 20).foreach { _ =>
      val lon0 = rnd.nextDouble() * 330 - 170
      val lat0 = rnd.nextDouble() * 150 - 80
      val w = rnd.nextDouble() * 8 + 0.5; val h = rnd.nextDouble() * 8 + 0.5
      val lon1 = math.min(180.0, lon0 + w); val lat1 = math.min(90.0, lat0 + h)
      val level = 8
      val cells = S2U.coverBox(lon0, lat0, lon1, lat1, level).toSet
      (1 to 400).foreach { _ =>
        val lon = lon0 + rnd.nextDouble() * (lon1 - lon0)
        val lat = lat0 + rnd.nextDouble() * (lat1 - lat0)
        assert(cells(S2U.lonLatToCellAt(lon, lat, level)),
          s"($lon, $lat) not covered by box ($lon0,$lat0,$lon1,$lat1)")
      }
    }
    // a box straddling the +x/+y face boundary (lon 45)
    val cells = S2U.coverBox(43.0, 10.0, 47.0, 12.0, 9).toSet
    val rnd2 = new scala.util.Random(67)
    (1 to 300).foreach { _ =>
      val lon = 43.0 + rnd2.nextDouble() * 4.0; val lat = 10.0 + rnd2.nextDouble() * 2.0
      assert(cells(S2U.lonLatToCellAt(lon, lat, 9)), s"($lon, $lat) not covered at face edge")
    }
    // a HUGE box (most of the sphere, contains whole faces incl. a polar
    // face): boundary-sample spacing is several cells here, so this pins
    // the monotone-extremes-are-sampled argument, not just the ±1 pad
    val big = S2U.coverBox(-170.0, -60.0, 170.0, 75.0, 7).toSet
    val rnd3 = new scala.util.Random(71)
    (1 to 500).foreach { _ =>
      val lon = -170.0 + rnd3.nextDouble() * 340.0
      val lat = -60.0 + rnd3.nextDouble() * 135.0
      assert(big(S2U.lonLatToCellAt(lon, lat, 7)), s"($lon, $lat) not covered in big box")
    }
  }
}
