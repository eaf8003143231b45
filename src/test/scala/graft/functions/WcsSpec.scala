package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class WcsSpec extends AnyFunSuite {

  // realistic SDSS frame WCS (values of the same magnitude as
  // frame-g-004797-1-0019: ~0.396"/pixel scale, slight rotation)
  val w = TanWcs(
    crpix1 = 1025.0, crpix2 = 745.0,
    cd11 = -6.0e-6, cd12 = 1.1e-4, cd21 = 1.1e-4, cd22 = 6.0e-6,
    crval1 = 180.321, crval2 = 0.456)

  test("pix2world/world2pix roundtrip within 1e-8 pixel") {
    for (x <- Seq(0.0, 100.5, 1024.0, 2047.0); y <- Seq(0.0, 744.0, 1488.0)) {
      val (ra, dec) = w.pix2world(x, y)
      val (x2, y2) = w.world2pix(ra, dec)
      assert(math.abs(x2 - x) < 1e-8 && math.abs(y2 - y) < 1e-8, s"($x,$y)->($ra,$dec)->($x2,$y2)")
    }
  }

  test("reference pixel maps to crval") {
    val (ra, dec) = w.pix2world(w.crpix1 - 1, w.crpix2 - 1)
    assert(math.abs(ra - w.crval1) < 1e-12)
    assert(math.abs(dec - w.crval2) < 1e-12)
  }

  test("boundary coords in valid sky range (test_photometry_utils.py:5-14)") {
    val corners = Wcs.boundaryCoords(w, 2048, 1489)
    assert(corners.length == 4)
    corners.foreach { case (ra, dec) =>
      assert(ra >= 0 && ra <= 360, s"ra $ra")
      assert(dec >= -90 && dec <= 90, s"dec $dec")
    }
    // corner order matches the reference: TL, BL, TR, BR
    assert(corners.head == w.pix2world(0, 0))
    assert(corners(3) == w.pix2world(2048, 1489))
  }

  test("zoomed WCS keeps sky position of a rescaled pixel") {
    val z = 2
    val wz = w.atZoom(z)
    // pixel (x,y) at zoom z corresponds to (x*2^z, y*2^z) at zoom 0 (up to
    // the half-pixel phase the reference accepts); centers line up closely
    val (ra0, dec0) = w.pix2world(400.0 * (1 << z), 300.0 * (1 << z))
    val (raZ, decZ) = wz.pix2world(400.0, 300.0)
    assert(math.abs(ra0 - raZ) < 1e-3 && math.abs(dec0 - decZ) < 1e-3)
  }

  test("is_cutout_whole truth table (test_serial_builders.py:189-211)") {
    // image shape (1849, 2048): height 1849, width 2048
    val tests = Seq(
      CutoutBounds(735, 799, 1849, 1913),
      CutoutBounds(735, 799, 1849, 1913),
      CutoutBounds(-1, 63, 1849, 1913), // x_min -1  (test3 approximated: first corner -1)
      CutoutBounds(735, 799, 64, 128))
    val expected = Seq(false, false, false, true)
    val results = tests.map(b => Wcs.isCutoutWhole(b, imgWidth = 2048, imgHeight = 1849))
    assert(results == expected)
  }

  test("cutoutBounds geometry: 64-square at zoom 0, 16 at zoom 2") {
    // place the spectrum exactly at the reference pixel
    val b0 = Wcs.cutoutBounds(w, 2048, 1489, w.crval1, w.crval2, 64, 0).get
    assert(b0.xMax - b0.xMin == 64 && b0.yMax - b0.yMin == 64)
    val wz = w.atZoom(2)
    val b2 = Wcs.cutoutBounds(wz, 512, 372, w.crval1, w.crval2, 64, 2).get
    assert(b2.xMax - b2.xMin == 16 && b2.yMax - b2.yMin == 16)
    // outside the image → None
    assert(Wcs.cutoutBounds(w, 2048, 1489, w.crval1 + 90, w.crval2, 64, 0).isEmpty)
  }
}
