package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SimHashKernel
import org.apache.spark.unsafe.types.UTF8String

/** Property-style sweeps over the pure science kernels: seeded random
  * inputs (deterministic — no flaky CI), laws instead of point values.
  * These complement the reference-literal truth tables in
  * HealpixSpec/WcsSpec/KernelSpec: a literal pins one point, a law pins
  * the whole input region the pipeline traverses.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0xC0FFEE)
  private def randRa(): Double = rnd.nextDouble() * 360.0
  private def randDec(): Double = rnd.nextDouble() * 176.0 - 88.0 // avoid poles

  test("healpix: pix2ang is a right inverse of ang2pix at every order") {
    for (_ <- 1 to 300) {
      val (ra, dec) = (randRa(), randDec())
      val order = 1 + rnd.nextInt(15)
      val pix = Healpix.ang2pixLonLat(order, ra, dec)
      assert(pix >= 0 && pix < 12L * (1L << order) * (1L << order))
      // the cell center must map back to the same cell
      val (cra, cdec) = Healpix.pix2LonLat(order, pix)
      assert(Healpix.ang2pixLonLat(order, cra, cdec) == pix,
        s"order=$order ra=$ra dec=$dec pix=$pix center=($cra,$cdec)")
    }
  }

  test("healpix: NESTED parent relation pix(o) >> 2 == pix(o-1), all orders") {
    for (_ <- 1 to 300) {
      val (ra, dec) = (randRa(), randDec())
      val order = 2 + rnd.nextInt(14)
      val child = Healpix.ang2pixLonLat(order, ra, dec)
      val parent = Healpix.ang2pixLonLat(order - 1, ra, dec)
      assert(child >> 2 == parent, s"order=$order ra=$ra dec=$dec")
    }
  }

  test("healpix: a disc cover always contains the center's own cell") {
    for (_ <- 1 to 100) {
      val (ra, dec) = (randRa(), randDec())
      val order = 4 + rnd.nextInt(9)
      val radius = (0.1 + rnd.nextDouble() * 30.0) / 3600.0 * math.Pi / 180.0
      val cover = Healpix.queryDiscLonLat(order, ra, dec, radius)
      val center = Healpix.ang2pixLonLat(order, ra, dec)
      assert(cover.contains(center),
        s"order=$order ra=$ra dec=$dec r=$radius cover=${cover.length}")
    }
  }

  test("wcs: world2pix inverts pix2world across the frame, both zooms") {
    for (_ <- 1 to 200) {
      val w0 = TanWcs(
        crpix1 = 1024.5, crpix2 = 745.0,
        cd11 = -1.1e-4 + rnd.nextDouble() * 1e-6, cd12 = 2e-6 * rnd.nextDouble(),
        cd21 = 2e-6 * rnd.nextDouble(), cd22 = 1.1e-4 - rnd.nextDouble() * 1e-6,
        crval1 = randRa(), crval2 = randDec() * 0.7)
      val w = if (rnd.nextBoolean()) w0 else w0.atZoom(1 + rnd.nextInt(3))
      val (x, y) = (rnd.nextDouble() * 2048, rnd.nextDouble() * 1489)
      val (ra, dec) = w.pix2world(x, y)
      val (x2, y2) = w.world2pix(ra, dec)
      assert(math.abs(x2 - x) < 1e-6 && math.abs(y2 - y) < 1e-6,
        s"($x,$y) -> ($ra,$dec) -> ($x2,$y2) wcs=$w")
    }
  }

  test("spectres rebin conserves flux mass on interior-covering grids") {
    for (_ <- 1 to 100) {
      val nOld = 50 + rnd.nextInt(200)
      val oldWavs = Array.tabulate(nOld)(i => 4000.0 + i * 2.0 + rnd.nextDouble() * 0.5)
      val flux = Array.fill(nOld)(rnd.nextDouble() * 10)
      // a new grid strictly inside the old one, coarser by ~3x
      val nNew = nOld / 3
      val lo = oldWavs(2)
      val hi = oldWavs(nOld - 3)
      val newWavs = Array.tabulate(nNew)(i => lo + (hi - lo) * (i + 0.5) / nNew)
      val (outF, _) = SpectresRebin.rebin(newWavs, oldWavs, flux, null)
      assert(outF.forall(v => !v.isNaN))
      // flux DENSITY is interpolated: every rebinned value stays within
      // the old density envelope (convex combination of bin densities)
      assert(outF.forall(v => v >= flux.min - 1e-9 && v <= flux.max + 1e-9))
    }
  }

  test("float_compress: idempotent, bounded relative error, 13 zeroed bits") {
    for (_ <- 1 to 1000) {
      val x = ((rnd.nextDouble() * 2 - 1) * math.pow(10, rnd.nextInt(8) - 4)).toFloat
      val c = FloatCompress.compress(x)
      assert(FloatCompress.compress(c) == c, s"not idempotent at $x")
      assert((java.lang.Float.floatToIntBits(c) & 0x1fff) == 0, s"mantissa tail at $x")
      if (x != 0f)
        assert(math.abs(c / x - 1) < 1.0 / (1 << 9), s"error too large: $x -> $c")
    }
  }

  test("simhash64: invariant under token order (multiset semantics)") {
    for (_ <- 1 to 200) {
      val toks = Seq.fill(3 + rnd.nextInt(40))(s"w${rnd.nextInt(25)}")
      val a = SimHashKernel.simhash64(UTF8String.fromString(toks.mkString(" ")))
      val b = SimHashKernel.simhash64(
        UTF8String.fromString(rnd.shuffle(toks).mkString(" ")))
      assert(a == b, s"toks=$toks")
    }
  }
}
