package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropHelper

class GeohashCoreSpec extends AnyFunSuite with PropHelper {

  // ---- golden vectors (FIXTURES.md §2, spec-derived) ----

  test("golden: encode(lat 57.64911, lon 10.40744, p=11) == u4pruydqqvj") {
    assert(Geohash.encodeString(10.40744, 57.64911, 11) == "u4pruydqqvj")
  }

  test("golden: encode(lat 42.605, lon -5.603, p=5) == ezs42") {
    assert(Geohash.encodeString(-5.603, 42.605, 5) == "ezs42")
  }

  test("golden: decode(ezs42) bbox and center") {
    val b = Geohash.boundingBoxString("ezs42")
    assert(b.minLat > 42.583 - 1e-9 && b.maxLat < 42.627 + 1e-9)
    assert(b.minLon > -5.625 - 1e-9 && b.maxLon < -5.581 + 1e-9)
    val (clon, clat) = Geohash.decodeCenterString("ezs42")
    assert(math.abs(clat - 42.60498) < 0.001)
    assert(math.abs(clon - -5.60302) < 0.001)
  }

  test("golden: base32 alphabet") {
    assert(Base32.Alphabet == "0123456789bcdefghjkmnpqrstuvwxyz")
    assert(!Base32.isValid("a1"))
    assert(!Base32.isValid("ilo"))
    assert(Base32.isValid("u4pruydqqvj"))
  }

  test("golden: cell size p=1 is 45x45 deg; p=5 is ~0.0439 deg") {
    val (e1lon, e1lat) = Geohash.errorWithPrecision(1)
    assert(e1lon * 2 == 45.0 && e1lat * 2 == 45.0)
    val (e5lon, e5lat) = Geohash.errorWithPrecision(5)
    assert(math.abs(e5lon * 2 - 0.0439453125) < 1e-12)
    assert(math.abs(e5lat * 2 - 0.0439453125) < 1e-12)
  }

  test("base32 round trip") {
    forAll(Gen.choose(0L, (1L << 60) - 1), Gen.choose(1, 12)) { (v: Long, p: Int) =>
      val masked = v & ((1L << (5 * p)) - 1)
      assert(Base32.decode(Base32.encode(masked, p)) == masked)
    }
  }

  test("morton interleave round trips and is monotone-nesting") {
    forAll(Gen.choose(0L, (1L << 30) - 1), Gen.choose(0L, (1L << 30) - 1)) { (x: Long, y: Long) =>
      val m = Morton.interleave(x, y)
      assert(Morton.deinterleaveX(m) == x)
      assert(Morton.deinterleaveY(m) == y)
      assert(m >= 0L)
    }
  }

  val genLon: Gen[Double] = Gen.choose(-180.0, 179.999999)
  val genLat: Gen[Double] = Gen.choose(-89.999999, 89.999999)
  val genChars: Gen[Int] = Gen.choose(1, 12)

  test("property: encode∘decode code round-trip (string)") {
    forAll(genLon, genLat, genChars) { (lon, lat, p) =>
      val s = Geohash.encodeString(lon, lat, p)
      val (clon, clat) = Geohash.decodeCenterString(s)
      assert(Geohash.encodeString(clon, clat, p) == s)
    }
  }

  test("property: decode center within half cell of input") {
    forAll(genLon, genLat, genChars) { (lon, lat, p) =>
      val s = Geohash.encodeString(lon, lat, p)
      val (clon, clat) = Geohash.decodeCenterString(s)
      val (elon, elat) = Geohash.errorWithPrecision(p)
      assert(math.abs(clat - lat) <= elat + 1e-12)
      assert(math.abs(clon - lon) <= elon + 1e-12)
    }
  }

  test("property: int64 and string encode agree") {
    forAll(genLon, genLat, genChars) { (lon, lat, p) =>
      val i64 = Geohash.encode(lon, lat, 5 * p)
      assert(Base32.encode(i64, p) == Geohash.encodeString(lon, lat, p))
    }
  }

  test("property: prefix nesting — parent bbox contains child bbox") {
    forAll(genLon, genLat, Gen.choose(2, 12)) { (lon, lat, p) =>
      val s = Geohash.encodeString(lon, lat, p)
      for (k <- 1 until p) {
        val pb = Geohash.boundingBoxString(s.substring(0, k))
        val cb = Geohash.boundingBoxString(s)
        assert(pb.minLon <= cb.minLon && pb.maxLon >= cb.maxLon)
        assert(pb.minLat <= cb.minLat && pb.maxLat >= cb.maxLat)
      }
      // int64 parent = shift
      val (code, bits) = Geohash.decodeString(s)
      val (pcode, _) = Geohash.decodeString(s.substring(0, p - 1))
      assert(Geohash.parent(code, bits, bits - 5) == pcode)
    }
  }

  test("property: children invert parent") {
    forAll(genLon, genLat, Gen.choose(1, 11)) { (lon, lat, p) =>
      val code = Geohash.encode(lon, lat, 5 * p)
      val kids = Geohash.children(code, 5 * p, 5 * (p + 1))
      assert(kids.length == 32)
      assert(kids.forall(k => Geohash.parent(k, 5 * (p + 1), 5 * p) == code))
      val child = Geohash.encode(lon, lat, 5 * (p + 1))
      assert(kids.contains(child))
    }
  }

  test("property: neighbor symmetry + adjacency") {
    forAll(genLon, Gen.choose(-80.0, 80.0), Gen.choose(2, 10)) { (lon, lat, p) =>
      val s = Geohash.encodeString(lon, lat, p)
      val ns = Geohash.neighborsString(s)
      assert(ns.length == 8)
      assert(ns.distinct.length == 8)
      assert(!ns.contains(s))
      val b = Geohash.boundingBoxString(s)
      ns.foreach { n =>
        assert(Geohash.neighborsString(n).contains(s), s"symmetry broken: $s vs $n")
        val nb = Geohash.boundingBoxString(n)
        // shares an edge or corner: bboxes touch within epsilon (mod 360 for wrap)
        val lonGap = math.min(
          math.max(b.minLon - nb.maxLon, nb.minLon - b.maxLon),
          math.min(math.abs(b.minLon + 360 - nb.maxLon), math.abs(nb.minLon + 360 - b.maxLon)))
        val latGap = math.max(b.minLat - nb.maxLat, nb.minLat - b.maxLat)
        assert(lonGap <= 1e-9 && latGap <= 1e-9, s"not adjacent: $s $n")
      }
    }
  }

  test("anti-meridian: east of lon≈180 wraps to lon=-180 cell") {
    val east = Geohash.encodeString(179.99999, 10.0, 4)
    val west = Geohash.encodeString(-180.0, 10.0, 4)
    assert(Geohash.neighborsString(east).contains(west))
    assert(Geohash.neighborsString(west).contains(east))
  }

  test("poles: cells at max lat have 5 neighbors (no wrap over pole)") {
    val top = Geohash.encodeString(10.0, 89.999999, 3)
    assert(Geohash.neighborsString(top).length == 5)
    val bot = Geohash.encodeString(10.0, -89.999999, 3)
    assert(Geohash.neighborsString(bot).length == 5)
  }

  test("lat 90 / lon 180 edge encode") {
    assert(Geohash.encodeString(0.0, 90.0, 5) == Geohash.encodeString(0.0, 89.999999999, 5))
    assert(Geohash.encodeString(180.0, 0.0, 5) == Geohash.encodeString(-180.0, 0.0, 5))
  }

  test("property: covering soundness — every point in box is in a covered cell") {
    val genBox = for {
      lon <- Gen.choose(-179.0, 178.0); lat <- Gen.choose(-89.0, 88.0)
      w <- Gen.choose(0.01, 5.0); h <- Gen.choose(0.01, 5.0)
    } yield (lon, lat, math.min(lon + w, 179.999), math.min(lat + h, 89.999))
    forAll(genBox, Gen.choose(2, 5)) { (box, p) =>
      val (x0, y0, x1, y1) = box
      val cells = Geohash.coveringString(x0, y0, x1, y1, p).toSet
      // sample points inside the box
      for (fx <- Seq(0.0, 0.3, 0.9999); fy <- Seq(0.0, 0.5, 0.9999)) {
        val lon = x0 + (x1 - x0) * fx; val lat = y0 + (y1 - y0) * fy
        assert(cells.contains(Geohash.encodeString(lon, lat, p)),
          s"point ($lon,$lat) not covered at p=$p box=($x0,$y0,$x1,$y1)")
      }
      // minimality: every covered cell intersects the box
      cells.foreach { c =>
        val b = Geohash.boundingBoxString(c)
        assert(b.maxLon >= x0 - 1e-9 && b.minLon <= x1 + 1e-9 &&
               b.maxLat >= y0 - 1e-9 && b.minLat <= y1 + 1e-9, s"cell $c outside box")
      }
    }
  }

  test("covering handles anti-meridian split") {
    val cells = Geohash.coveringString(179.0, -1.0, -179.0, 1.0, 3).toSet
    assert(cells.contains(Geohash.encodeString(179.5, 0.5, 3)))
    assert(cells.contains(Geohash.encodeString(-179.5, 0.5, 3)))
    assert(cells.contains(Geohash.encodeString(179.9, -0.5, 3)))
    // nothing far from the seam
    assert(!cells.contains(Geohash.encodeString(0.0, 0.0, 3)))
  }

  test("grid properties sw corner + counts") {
    val (sw, cx, cy) = Geohash.gridProperties(-5.7, 42.5, -5.5, 42.7, 25)
    assert(Base32.encode(sw, 5) == Geohash.encodeString(-5.7, 42.5, 5))
    val cells = Geohash.coveringString(-5.7, 42.5, -5.5, 42.7, 5)
    assert(cx * cy == cells.length)
  }

  test("area: sum of all p=1 cells ≈ sphere area") {
    val r = 6371008.8
    val sphere = 4 * math.Pi * r * r
    val all = (0L until 32L).map(Geohash.area(_, 5)).sum
    assert(math.abs(all - sphere) / sphere < 1e-9)
  }

  test("haversine goldens") {
    // Paris (2.3522, 48.8566) to London (-0.1276, 51.5072) ≈ 343.5 km
    val d = GeoMath.haversineM(2.3522, 48.8566, -0.1276, 51.5072)
    assert(math.abs(d - 343.5e3) < 2e3)
    assert(GeoMath.haversineM(10, 20, 10, 20) == 0.0)
    // antipodal ≈ pi*R
    val anti = GeoMath.haversineM(0, 0, 180, 0)
    assert(math.abs(anti - math.Pi * GeoMath.EarthRadiusM) < 1.0)
  }

  test("polygon covering: matches JTS intersects cell-for-cell") {
    import org.locationtech.jts.io.WKTReader
    import org.locationtech.jts.geom.GeometryFactory
    val wkts = Seq(
      "POLYGON ((-2.5 41.0, 3.0 41.5, 2.0 48.0, -4.5 47.5, -2.5 41.0))",
      "POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))",
      "POLYGON ((0 0, 12 0, 12 12, 0 12, 0 0), (3 3, 9 3, 9 9, 3 9, 3 3))")
    val reader = new WKTReader(new GeometryFactory())
    wkts.foreach { wkt =>
      val rings = GeoMath.parseWktPolygon(wkt)
      val jts = reader.read(wkt)
      for (bits <- Seq(10, 14, 18)) {
        val got = Geohash.polygonCovering(rings, bits).toSet
        // oracle: bbox covering filtered by JTS intersects
        val outer = rings.head
        val lons = outer.indices.collect { case i if i % 2 == 0 => outer(i) }
        val lats = outer.indices.collect { case i if i % 2 == 1 => outer(i) }
        val expect = Geohash.covering(lons.min, lats.min, lons.max, lats.max, bits).filter { c =>
          val b = Geohash.boundingBox(c, bits)
          val env = new org.locationtech.jts.geom.Envelope(b.minLon, b.maxLon, b.minLat, b.maxLat)
          jts.intersects(new GeometryFactory().toGeometry(env))
        }.toSet
        assert(got == expect, s"$wkt bits=$bits: missing=${(expect -- got).size} extra=${(got -- expect).size}")
        assert(got.nonEmpty)
      }
    }
  }

  test("covering at the 180 east boundary: full-world and (170..180) boxes") {
    // full world at 5 bits: all 8x4 cells (lon 3 bits, lat 2 bits)
    val world = Geohash.covering(-180.0, -90.0, 180.0, 90.0, 5)
    assert(world.length == 32 && world.toSet.size == 32)
    // a box reaching exactly 180 must cover the easternmost column
    val east = Geohash.covering(170.0, -10.0, 180.0, 10.0, 10)
    assert(east.nonEmpty)
    val eastCell = Geohash.encode(179.999999, 0.0, 10)
    assert(east.contains(eastCell), s"missing easternmost cell $eastCell")
    // gridProperties agrees (no negative counts); covering carries ONE extra
    // column beyond the gridProperties count — the west column, because a
    // point at exactly lon=180 encodes wrapped to -180
    val (_, cx, cy) = Geohash.gridProperties(170.0, -10.0, 180.0, 10.0, 10)
    assert(cx > 0 && cy > 0 && (cx + 1) * cy == east.length)
    // soundness near the edge: points just west of 180 land in covered cells,
    // and so does a point at EXACTLY 180 (which encodes as -180)
    Seq(179.9999, 175.0, 170.0, 180.0).foreach { lon =>
      assert(east.contains(Geohash.encode(lon, 0.0, 10)), s"lon=$lon not covered")
    }
    // no duplicates (a duplicate covering cell would double join rows)
    assert(east.toSet.size == east.length)
  }

  test("point in polygon: convex, concave, hole — vs JTS oracle") {
    import org.locationtech.jts.geom.{GeometryFactory, Coordinate}
    import org.locationtech.jts.io.WKTReader
    val wkts = Seq(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))", // concave
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))", // hole
      "POLYGON ((-2.5 41.0, 3.0 41.5, 2.0 48.0, -4.5 47.5, -2.5 41.0))")
    val reader = new WKTReader(new GeometryFactory())
    val rnd = new scala.util.Random(42)
    wkts.foreach { wkt =>
      val rings = GeoMath.parseWktPolygon(wkt)
      val jts = reader.read(wkt)
      val env = jts.getEnvelopeInternal
      (0 until 500).foreach { _ =>
        val lon = env.getMinX - 1 + rnd.nextDouble() * (env.getWidth + 2)
        val lat = env.getMinY - 1 + rnd.nextDouble() * (env.getHeight + 2)
        val ours = GeoMath.pointInPolygon(lon, lat, rings)
        val oracle = jts.contains(new GeometryFactory().createPoint(new Coordinate(lon, lat)))
        assert(ours == oracle, s"PIP mismatch at ($lon,$lat) on $wkt")
      }
    }
  }
}
