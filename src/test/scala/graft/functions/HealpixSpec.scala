package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class HealpixSpec extends AnyFunSuite {
  import Healpix._

  test("npix law") {
    assert(nPix(0) == 12)
    assert(nPix(1) == 48)
    assert(nPix(11) == 12L * 2048 * 2048)
  }

  test("interleave/deinterleave roundtrip") {
    val r = new Random(7)
    (0 until 1000).foreach { _ =>
      val x = r.nextLong() & 0xffffffffL
      val y = r.nextLong() & 0xffffffffL
      assert(deinterleave(interleave(x, y)) == ((x, y)))
    }
  }

  test("pixel center roundtrips through ang2pix at several orders") {
    for (order <- Seq(0, 1, 2, 3)) {
      var p = 0L
      while (p < nPix(order)) {
        val (theta, phi) = pix2angNest(order, p)
        assert(ang2pixNest(order, theta, phi) == p, s"order=$order pix=$p")
        p += 1
      }
    }
    val r = new Random(13)
    for (order <- Seq(8, 11, 16); _ <- 0 until 2000) {
      val p = (r.nextDouble() * nPix(order)).toLong
      val (theta, phi) = pix2angNest(order, p)
      assert(ang2pixNest(order, theta, phi) == p, s"order=$order pix=$p")
    }
  }

  test("nested hierarchy: pixel at order o-1 is the parent of order o") {
    val r = new Random(17)
    (0 until 5000).foreach { _ =>
      val ra = r.nextDouble() * 360
      val dec = r.nextDouble() * 180 - 90
      val fine = ang2pixLonLat(16, ra, dec)
      val coarse = ang2pixLonLat(11, ra, dec)
      assert(parent(fine, 16, 11) == coarse, s"($ra,$dec)")
    }
  }

  test("every direction maps to a valid pixel; all 12 base faces reachable") {
    val r = new Random(19)
    val faces = scala.collection.mutable.Set.empty[Long]
    (0 until 20000).foreach { _ =>
      val z = r.nextDouble() * 2 - 1
      val theta = math.acos(z)
      val phi = r.nextDouble() * 2 * math.Pi
      val p = ang2pixNest(0, theta, phi)
      assert(p >= 0 && p < 12)
      faces += p
    }
    assert(faces.size == 12)
  }

  test("known anchor pixels (healpy conventions)") {
    // equator, ra=0 is the center of equatorial face 4 at order 0
    assert(ang2pixLonLat(0, 0.0, 0.0) == 4)
    // north pole lands on a polar-cap face (0..3)
    assert(ang2pixLonLat(0, 0.0, 89.999) < 4)
    // south pole lands on faces 8..11
    assert(ang2pixLonLat(0, 0.0, -89.999) >= 8)
  }

  test("queryDisc covers every pixel containing a point of the disc") {
    val r = new Random(23)
    for (_ <- 0 until 10) {
      val ra = r.nextDouble() * 360
      val dec = r.nextDouble() * 160 - 80
      val radius = (4.0 / 60) * math.Pi / 180 // 4 arcmin like the link phase
      val order = 11
      val cover = queryDiscLonLat(order, ra, dec, radius).toSet
      // sample random points inside the disc; each must fall in a covered pixel
      val c = lonlat2vec(ra, dec)
      (0 until 500).foreach { _ =>
        // random small offset within radius
        val ang = r.nextDouble() * 2 * math.Pi
        val rad = math.sqrt(r.nextDouble()) * radius
        val dec2 = math.toRadians(dec) + rad * math.cos(ang)
        val ra2 = math.toRadians(ra) + rad * math.sin(ang) / math.max(0.17, math.cos(math.toRadians(dec)))
        val v = ang2vec(math.Pi / 2 - dec2, ra2)
        val dot = c(0) * v(0) + c(1) * v(1) + c(2) * v(2)
        if (math.acos(math.max(-1, math.min(1, dot))) <= radius) {
          val p = vec2pixNest(order, v)
          assert(cover.contains(p), s"missing pixel for point near ($ra,$dec)")
        }
      }
      // and the cover is not absurdly large (conservative but bounded)
      assert(cover.size < 2000, s"cover too large: ${cover.size}")
    }
  }

  test("queryDisc at link-phase parameters stays small") {
    // order 11 ≈ 1.7 arcmin pixels; a 4 arcmin disc should cover O(10-40)
    val cover = queryDiscLonLat(11, 180.0, 0.0, 4.0 / 60 * math.Pi / 180)
    assert(cover.nonEmpty && cover.length < 120, s"got ${cover.length}")
  }
}
