package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class InterpSpec extends AnyFunSuite {
  test("linspace matches numpy semantics") {
    val a = Interp.linspace(0, 10, 5)
    assert(a.toSeq == Seq(0.0, 2.5, 5.0, 7.5, 10.0))
    assert(Interp.linspace(3839.72, 8914.60, 4620).length == 4620)
    assert(Interp.linspace(1, 1, 1).toSeq == Seq(1.0))
  }

  test("interp matches numpy: interior linear, edges clamped") {
    val xp = Array(0.0, 1.0, 3.0)
    val fp = Array(0.0, 10.0, 20.0)
    assert(Interp.interp(0.5, xp, fp) == 5.0)
    assert(Interp.interp(2.0, xp, fp) == 15.0)
    assert(Interp.interp(-1.0, xp, fp) == 0.0) // clamp left
    assert(Interp.interp(5.0, xp, fp) == 20.0) // clamp right
    assert(Interp.interp(1.0, xp, fp) == 10.0) // exact knot
  }
}

class SpectresRebinSpec extends AnyFunSuite {
  import SpectresRebin._

  val rebinMin = 3839.7244
  val rebinMax = 8914.597
  val rebinSamples = 4620

  test("rebin produces REBIN_SAMPLES=4620 bins (test_serial_builders.py:213-229)") {
    // typical SDSS loglam grid: 10^(3.58 + 1e-4 * i), ~4600 samples
    val wl = (0 until 4600).map(i => math.pow(10, 3.59 + 1e-4 * i)).toArray
    val flux = wl.map(w => 1e-17 * (1 + math.sin(w / 500)))
    val errs = wl.map(_ => 1e-18)
    val newWavs = Interp.linspace(rebinMin, rebinMax, rebinSamples)
    val (f, e) = rebin(newWavs, wl, flux, errs)
    assert(f.length == 4620 && e.length == 4620)
    // bins outside the source range are NaN-filled
    assert(f.head.isNaN) // rebinMin 3839.7 below wl(0)=3890.5 -> fill
    assert(!f(2000).isNaN)
  }

  test("constant flux is conserved exactly on interior bins") {
    val wl = Interp.linspace(4000, 8000, 1000)
    val flux = wl.map(_ => 3.5)
    val newWavs = Interp.linspace(4100, 7900, 500)
    val (f, _) = rebin(newWavs, wl, flux, null)
    assert(f.forall(v => math.abs(v - 3.5) < 1e-12))
  }

  test("flux integral is conserved for a varying spectrum") {
    val wl = Interp.linspace(4000, 8000, 2001)
    val flux = wl.map(w => 2.0 + math.sin(w / 300))
    val newWavs = Interp.linspace(4000, 8000, 500)
    val (f, _) = rebin(newWavs, wl, flux, null)
    val (oldEdges, oldW) = makeBins(wl)
    val (newEdges, newW) = makeBins(newWavs)
    // integrate over the common support (trim half-bin edges)
    val oldInt = (wl.indices.drop(1).dropRight(1)).map(i => flux(i) * oldW(i)).sum
    val newInt = (newWavs.indices.drop(1).dropRight(1)).map(i => f(i) * newW(i)).sum
    assert(math.abs(oldInt - newInt) / oldInt < 5e-3)
  }

  test("single-overlap bin copies flux") {
    val wl = Interp.linspace(0, 100, 11) // width-10 bins
    val flux = Array.tabulate(11)(i => i.toDouble)
    val newWavs = Array(50.0, 50.5) // tiny bins inside old bin 5
    val (f, _) = rebin(newWavs, wl, flux, null)
    assert(f(1) == 5.0)
  }
}

class ResampleSpec extends AnyFunSuite {
  import Resample._

  test("spectrum pyramid lengths [4620,2310,1155,577,288] (test_cube_utils.py:14-21)") {
    val wl = Interp.linspace(3839.7244, 8914.597, 4620)
    val flux = wl.map(w => 1e-17 * (1 + math.sin(w / 700)))
    val sigma = wl.map(_ => 1e-18)
    val pyr = spectrumPyramid(wl, flux, sigma, 4)
    assert(pyr.map(_._1.length) == Seq(4620, 2310, 1155, 577, 288))
    assert(pyr.map(_._2.length) == Seq(4620, 2310, 1155, 577, 288))
    // variance halves each zoom: sigma scaled by 1/2 per level
    assert(math.abs(pyr(1)._3(100) - 1e-18 / 2) < 1e-24)
    assert(math.abs(pyr(4)._3(100) - 1e-18 / 16) < 1e-24)
  }

  test("image pyramid shapes [(2048,1489)..(128,93)] (test_cube_utils.py:23-41)") {
    val flux = Array.fill(1489)(Array.fill(2048)(2.0))
    val sigma = Array.fill(1489)(Array.fill(2048)(0.4))
    val pyr = imagePyramid(flux, sigma, 4)
    val shapes = pyr.map { case (f, _) => (f(0).length, f.length) }
    assert(shapes == Seq((2048, 1489), (1024, 744), (512, 372), (256, 186), (128, 93)))
    // constant image stays constant under bicubic (weights sum to 1)
    assert(math.abs(pyr(1)._1(300)(500) - 2.0) < 1e-9)
    // sigma: interpolated then /4 per level
    assert(math.abs(pyr(1)._2(300)(500) - 0.1) < 1e-9)
  }

  test("gaussian kernel is normalized and symmetric") {
    val k = gaussianKernel1d(2.0)
    assert(k.length == 17) // ceil(16) -> 17 odd
    assert(math.abs(k.sum - 1.0) < 1e-12)
    assert((0 until k.length / 2).forall(i => math.abs(k(i) - k(k.length - 1 - i)) < 1e-15))
  }

  test("convolve1d keeps constants away from boundary and handles NaN") {
    val data = Array.fill(100)(5.0)
    val out = convolve1d(data, gaussianKernel1d(2.0))
    assert(math.abs(out(50) - 5.0) < 1e-12)
    data(40) = Double.NaN // astropy interpolates over NaN
    val out2 = convolve1d(data, gaussianKernel1d(2.0))
    assert(math.abs(out2(40) - 5.0) < 1e-9)
  }

  test("bicubic downscale of a linear ramp preserves the ramp interior") {
    val src = Array.tabulate(64, 64)((y, x) => x.toDouble)
    val dst = resizeCubic(src, 32, 32)
    // interior: dst(x) should be ~ 2x + 0.5 (the source coord of dst center)
    (4 until 28).foreach { x =>
      assert(math.abs(dst(16)(x) - ((x + 0.5) * 2 - 0.5)) < 1e-9, s"x=$x got ${dst(16)(x)}")
    }
  }
}

class PhotometryKernelsSpec extends AnyFunSuite {
  import PhotometryKernels._

  test("magToFlux formula (photometry.py:168-169)") {
    val v = magToFlux(1.0, "g")
    assert(math.abs(v - 3.631e-6 * 2.99792458e-5 / (4686.0 * 4686.0)) < 1e-30)
  }

  test("fluxToFluxDensity area ratio (0.4\" pixel, 2\" fiber)") {
    assert(math.abs(fluxDensityAreaRatio - math.Pi * 4 / 0.16) < 1e-9)
  }

  test("spectrum derivation: wl=10^loglam, sigma=sqrt(1/ivar)*1e-17, ivar=0 -> inf") {
    assert(math.abs(spectrumWl(3.6) - math.pow(10, 3.6)) < 1e-9)
    assert(spectrumSigma(0.0).isPosInfinity)
    assert(math.abs(spectrumSigma(4.0) - 0.5e-17) < 1e-30)
  }

  test("transmission merge over the real SDSS curves = 331 points (test_cube_utils.py:43-46)") {
    val dir = new java.io.File("/root/reference/config/SDSS_Bands")
    assume(dir.isDirectory, "reference transmission curves not available")
    val curves = Seq("u", "g", "r", "i", "z").map { b =>
      val src = scala.io.Source.fromFile(new java.io.File(dir, s"SLOAN_SDSS.$b.dat"))
      val pts = try src.getLines().map(_.trim).filter(_.nonEmpty).map { l =>
        val parts = l.split("\\s+")
        (parts(0).toDouble, parts(1).toDouble)
      }.toSeq finally src.close()
      b -> pts
    }.toMap
    val merged = mergeTransmissionCurvesMax(curves)
    assert(merged.length == 331)
    // max-wins on overlap + sorted by wavelength
    assert(merged.sliding(2).forall(p => p(0)._1 < p(1)._1))
  }

  test("ccd run predicate parse (photometry.py:352-357, no eval)") {
    val row = CcdConfigRow(3, ">0", Map("g" -> 3.8))
    assert(row.matches(3, 100) && !row.matches(3, 0) && !row.matches(2, 100))
    val row2 = CcdConfigRow(3, "<1500", Map("g" -> 4.1))
    assert(row2.matches(3, 100) && !row2.matches(3, 1500))
  }

  test("ccd gain lookup against the real reference tsv") {
    val f = new java.io.File("/root/reference/config/ccd_gain.tsv")
    assume(f.isFile, "reference ccd_gain.tsv not available")
    val src = scala.io.Source.fromFile(f)
    val lines = try src.getLines().toSeq finally src.close()
    val header = lines.head.split("\t").map(_.trim)
    val rows = lines.tail.filter(_.trim.nonEmpty).map { l =>
      val parts = l.split("\t").map(_.trim)
      val m = header.zip(parts).toMap
      CcdConfigRow(m("camcol").toInt, m("run"),
        Seq("u", "g", "r", "i", "z").map(b => b -> m(b).toDouble).toMap)
    }
    val g = lookupCcd(rows, camcol = 1, run = 4797, band = "g")
    assert(g > 0 && g < 10) // typical SDSS gain ~3-5 e-/DN
  }

  test("bilinear interpolation with clamped edges") {
    val img = Array(Array(0.0, 1.0), Array(2.0, 3.0))
    assert(bilinear(img, 0, 0) == 0.0)
    assert(bilinear(img, 1, 1) == 3.0)
    assert(bilinear(img, 0.5, 0.5) == 1.5)
    assert(bilinear(img, -5, -5) == 0.0) // clamp
    assert(bilinear(img, 5, 5) == 3.0)
  }

  test("imageErrors pipeline on a tiny synthetic frame") {
    val img = Array.fill(4)(Array.fill(6)(10.0))
    val calib = Array.fill(6)(2.0)
    val allsky = Array.fill(3)(Array.fill(3)(1.0))
    val xinterp = Array.tabulate(6)(i => i / 2.5)
    val yinterp = Array.tabulate(4)(i => i / 1.5)
    val err = imageErrors(img, calib, allsky, xinterp, yinterp, gain = 4.0, darkVariance = 1.0)
    // dn = 10/2 + 1 = 6; dnErr = sqrt(6/4 + 1) = sqrt(2.5); imgErr = 2*sqrt(2.5)
    assert(err.forall(_.forall(v => math.abs(v - 2 * math.sqrt(2.5)) < 1e-12)))
  }
}

class FloatCompressSpec extends AnyFunSuite {
  test("keeps 10 digits: low 13 mantissa bits zero, <1% error (test_serial_builders.py:231-256)") {
    val r = new scala.util.Random(5)
    (0 until 10000).foreach { _ =>
      val v = (r.nextFloat() - 0.5f) * math.pow(10, r.nextInt(12) - 6).toFloat
      if (v != 0f) {
        val c = FloatCompress.compress(v, 10)
        val bits = java.lang.Float.floatToIntBits(c)
        assert((bits & 0x1fff) == 0, s"$v -> $c bits ${bits.toBinaryString}")
        assert(math.abs(c / v - 1) < 0.01, s"$v -> $c")
      }
    }
  }

  test("zeros and infinities pass through") {
    assert(FloatCompress.compress(0f, 10) == 0f)
    assert(FloatCompress.compress(Float.PositiveInfinity, 10).isPosInfinity)
    // reference masks only 0 and +Inf (data.py:32); -Inf → NaN via the log path
    assert(FloatCompress.compress(Float.NegativeInfinity, 10).isNaN)
    assert(FloatCompress.compress(Float.NaN, 10).isNaN)
    assert(FloatCompress.compress(Array(1.5f, 0f, -2.25f), 10).length == 3)
  }
}
