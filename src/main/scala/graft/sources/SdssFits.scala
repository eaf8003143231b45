package graft.sources

import graft.functions.{Interp, PhotometryKernels, Resample, SpectresRebin}
import graft.functions.PhotometryKernels.CcdConfigRow

/** SDSS-specific FITS decoding (pure Scala; S4/S5 in SURVEY §2.1) +
  * the per-file science pipeline the reference runs at ingest
  * (`photometry.py:84-306`): uncertainty derivation, unit conversion,
  * rebinning, multi-resolution pyramids.
  */
object SdssFits {

  /** CCD calibration tables (ccd_gain.tsv / ccd_dark_variance.tsv —
    * `photometry.py:314-321`). */
  def readCcdTsv(path: String): Seq[CcdConfigRow] = {
    val src = scala.io.Source.fromFile(path)
    try {
      val lines = src.getLines().toSeq
      val header = lines.head.split("\t").map(_.trim)
      lines.tail.filter(_.trim.nonEmpty).map { l =>
        val m = header.zip(l.split("\t").map(_.trim)).toMap
        CcdConfigRow(m("camcol").toInt, m("run"),
          Seq("u", "g", "r", "i", "z").map(b => b -> m(b).toDouble).toMap)
      }
    } finally src.close()
  }

  /** Decoded SDSS frame: calibrated flux densities + sigma, full pyramid. */
  final case class Frame(
      header: Fits.Header,
      band: String,
      run: Int,
      camcol: Int,
      field: Int,
      timeMjd: Double,
      wcs: graft.functions.TanWcs,
      /** zoom → (flux, sigma), row-major */
      pyramid: Seq[(Array[Array[Float]], Array[Array[Float]])])

  /** ISO DATE-OBS (or %d/%m/%y) → MJD (`utils/io.py:426-432`). */
  def imageTimeMjd(header: Fits.Header): Double = {
    val t = header.str("DATE-OBS")
    val iso = raw"(\d{4})-(\d{2})-(\d{2})([T ](\d{2}):(\d{2}):(\d{2}(\.\d+)?))?".r
    val dmy = raw"(\d{2})/(\d{2})/(\d{2})".r
    t.trim match {
      case iso(y, m, d, _, hh, mm, ss, _) =>
        val frac =
          if (hh == null) 0.0
          else (hh.toInt * 3600 + mm.toInt * 60 + ss.toDouble) / 86400.0
        toMjd(y.toInt, m.toInt, d.toInt) + frac
      case dmy(d, m, y) => toMjd(1900 + y.toInt + (if (y.toInt < 50) 100 else 0), m.toInt, d.toInt)
      case other => throw new IllegalArgumentException(s"DATE-OBS '$other'")
    }
  }

  /** Civil date → MJD (valid for the Gregorian range SDSS uses). */
  def toMjd(y: Int, m: Int, d: Int): Double = {
    val a = (14 - m) / 12
    val yy = y + 4800 - a
    val mm = m + 12 * a - 3
    val jdn = d + (153 * mm + 2) / 5 + 365L * yy + yy / 4 - yy / 100 + yy / 400 - 32045
    jdn - 2400000.5 - 0.5 // JDN is noon-based
  }

  /** Decode a frame FITS (possibly .bz2): HDU0 image, HDU1 calib vector,
    * HDU2 sky bintable; derive errors (P1), convert units (P3, P4), build
    * the bicubic pyramid (X2). Mirrors `photometry.py:193-228,286-306`.
    */
  def loadFrame(
      raw: Array[Byte], path: String,
      gains: Seq[CcdConfigRow], darkVars: Seq[CcdConfigRow],
      zoomCnt: Int): Frame = {
    val bytes = Fits.maybeDecompress(raw, path)
    val hdus = Fits.readHdus(bytes)
    val h0 = hdus(0).header
    val band = h0.str("FILTER").trim
    val run = h0.int("RUN")
    val camcol = h0.int("CAMCOL")
    // FIELD is absent from some frame headers; fall back to FRAME or the
    // canonical filename frame-<band>-<run6>-<camcol>-<field4>.fits
    val field = h0.intOpt("FIELD")
      .orElse(h0.intOpt("FRAME"))
      .orElse(raw"frame-\w+-\d+-\d+-(\d+)".r.findFirstMatchIn(path).map(_.group(1).toInt))
      .getOrElse(0)

    val img = Fits.readImage(bytes, hdus(0)) // h×w f32 nanomaggies
    val calibRow = Fits.readImage(bytes, hdus(1)) // 1×w calibration vector
    val calib = calibRow(0).map(_.toDouble)
    val sky = Fits.readBinTable(bytes, hdus(2))
    val allskyFlat = Fits.readDoubles(bytes, sky, sky.column("allsky"), 0)
    val xinterp = Fits.readDoubles(bytes, sky, sky.column("xinterp"), 0)
    val yinterp = Fits.readDoubles(bytes, sky, sky.column("yinterp"), 0)
    // TDIM gives the allsky 2-D shape, e.g. '(256,192)' = (w,h)
    val skyCol = sky.columns.indexWhere(_.name.equalsIgnoreCase("allsky")) + 1
    val tdim = sky.hdu.header.str(s"TDIM$skyCol")
    val dims = tdim.stripPrefix("(").stripSuffix(")").split(",").map(_.trim.toInt)
    val (aw, ah) = (dims(0), dims(1))
    val allsky = Array.tabulate(ah, aw)((y, x) => allskyFlat(y * aw + x))

    val gain = PhotometryKernels.lookupCcd(gains, camcol, run, band)
    val darkVar = PhotometryKernels.lookupCcd(darkVars, camcol, run, band)

    val imgD = img.map(_.map(_.toDouble))
    val errD = PhotometryKernels.imageErrors(imgD, calib, allsky, xinterp, yinterp, gain, darkVar)

    // unit conversion: nanomaggies → flux → flux density (both mean and σ)
    @inline def convert(v: Double): Double =
      PhotometryKernels.fluxToFluxDensity(PhotometryKernels.magToFlux(v, band))
    val flux0 = imgD.map(_.map(convert))
    val sigma0 = errD.map(_.map(convert))

    val pyr = Resample.imagePyramid(flux0, sigma0, zoomCnt)
      .map { case (f, s) => (toF32Scrubbed(f), toF32Scrubbed(s)) }

    val wcs = graft.functions.TanWcs(
      h0.double("CRPIX1"), h0.double("CRPIX2"),
      h0.double("CD1_1"), h0.double("CD1_2"), h0.double("CD2_1"), h0.double("CD2_2"),
      h0.double("CRVAL1"), h0.double("CRVAL2"))

    Frame(h0, band, run, camcol, field, imageTimeMjd(h0), wcs, pyr)
  }

  /** inf → NaN scrub at store time (P11,
    * `metadata_strategy_dataset.py:173-174`) + f64→f32 cast. */
  def toF32Scrubbed(a: Array[Array[Double]]): Array[Array[Float]] =
    a.map(_.map(v => if (v.isInfinite) Float.NaN else v.toFloat))

  def toF32Scrubbed1d(a: Array[Double]): Array[Float] =
    a.map(v => if (v.isInfinite) Float.NaN else v.toFloat)

  /** Decoded SDSS spectrum with the full zoom pyramid. */
  final case class Spectrum(
      header: Fits.Header,
      ra: Double,
      dec: Double,
      time: Double,
      plateid: Long,
      mjd: Long,
      fiberid: Int,
      /** zoom → (wl, flux, sigma) */
      pyramid: Seq[(Array[Double], Array[Double], Array[Double])])

  val RebinMin = 3839.7244
  val RebinMax = 8914.597
  val RebinSamples = 4620

  /** Decode a spec FITS: HDU1 bintable loglam/flux/ivar → wl/flux/σ (P5),
    * rebin onto the fixed grid (P9), build the Gaussian pyramid (X1).
    * Mirrors `photometry.py:84-135` with APPLY_REBIN=True,
    * APPLY_TRANSMISSION_CURVE=False (config.ini).
    */
  def loadSpectrum(raw: Array[Byte], path: String, zoomCnt: Int,
      applyRebin: Boolean = true): Spectrum = {
    val bytes = Fits.maybeDecompress(raw, path)
    val hdus = Fits.readHdus(bytes)
    val h0 = hdus(0).header
    val t = Fits.readBinTable(bytes, hdus(1))
    val n = t.nRows
    val loglam = new Array[Double](n)
    val flux = new Array[Double](n)
    val sigma = new Array[Double](n)
    val cLog = t.column("loglam")
    val cFlux = t.column("flux")
    val cIvar = t.column("ivar")
    var i = 0
    while (i < n) {
      loglam(i) = Fits.readDoubles(bytes, t, cLog, i)(0)
      // reference computes in f32 then scales (photometry.py:105-108)
      flux(i) = Fits.readDoubles(bytes, t, cFlux, i)(0) * 1e-17
      val ivar = Fits.readDoubles(bytes, t, cIvar, i)(0)
      sigma(i) = math.sqrt(1.0 / ivar) * 1e-17 // ivar=0 → +inf
      i += 1
    }
    val wl = loglam.map(l => math.pow(10, l))

    val (wl0, f0, s0) =
      if (applyRebin) {
        val newWavs = Interp.linspace(RebinMin, RebinMax, RebinSamples)
        val (rf, rs) = SpectresRebin.rebin(newWavs, wl, flux, sigma)
        (newWavs, rf, rs)
      } else (wl, flux, sigma)

    val pyr = Resample.spectrumPyramid(wl0, f0, s0, zoomCnt)

    val ra = h0.double("PLUG_RA")
    val dec = h0.double("PLUG_DEC")
    val time = h0.doubleOpt("TAI").getOrElse(h0.double("MJD"))
    Spectrum(h0, ra, dec, time,
      h0.long("PLATEID"), h0.long("MJD"), h0.int("FIBERID"), pyr)
  }
}
