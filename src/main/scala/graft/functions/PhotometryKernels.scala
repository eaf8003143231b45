package graft.functions

/** SDSS photometry kernels — pure Scala ports of
  * `hisscube/utils/photometry.py` (P1-P10 in SURVEY §2.2).
  */
object PhotometryKernels {

  /** Filter band midpoints in Å (`photometry.py:35-41`). */
  val filterMidpoints: Map[String, Int] =
    Map("u" -> 3551, "g" -> 4686, "r" -> 6166, "i" -> 7480, "z" -> 8932)

  /** Per-band zero-point / softening (`photometry.py:43-68`). */
  val transmissionParams: Map[String, (Double, Double)] = Map(
    "u" -> (8.423e-9, 0.00000000014),
    "g" -> (5.055e-9, 0.00000000009),
    "r" -> (2.904e-9, 0.00000000012),
    "i" -> (1.967e-9, 0.00000000018),
    "z" -> (1.375e-9, 0.00000000074))

  /** P3 `mag_to_flux` (`photometry.py:168-169`): nanomaggies → flux. */
  def magToFlux(v: Double, band: String): Double =
    v * 3.631e-6 * 2.99792458e-5 / {
      val m = filterMidpoints(band).toDouble; m * m
    }

  /** P4 `flux_to_flux_density` (`photometry.py:171-175`): fiber/pixel
    * area ratio; IMAGE_PIXEL_SIZE=0.4", SPECTRUM_FIBER_DIAMETER=2"
    * (config.ini). */
  val fluxDensityAreaRatio: Double = {
    val pixelArea = 0.4 * 0.4
    val fiberArea = math.Pi * 2.0 * 2.0
    fiberArea / pixelArea
  }
  def fluxToFluxDensity(v: Double): Double = v * fluxDensityAreaRatio

  /** P5 spectrum derivation (`photometry.py:105-108`):
    * wl = 10^loglam, flux *= 1e-17, σ = sqrt(1/ivar)*1e-17 (÷0 → +inf). */
  def spectrumWl(loglam: Double): Double = math.pow(10, loglam)
  def spectrumFlux(rawFlux: Double): Double = rawFlux * 1e-17
  def spectrumSigma(ivar: Double): Double = math.sqrt(1.0 / ivar) * 1e-17

  /** P6 transmission-curve merge (`photometry.py:323-341`): union of the
    * per-band (wl → ratio) maps; on overlap the larger ratio (and its
    * band) wins. Returns (wl, band, ratio) sorted by wl. */
  def mergeTransmissionCurvesMax(
      curves: Map[String, Seq[(Double, Double)]]): Array[(Double, String, Double)] = {
    val merged = scala.collection.mutable.Map.empty[Double, (String, Double)]
    for ((band, curve) <- curves.toSeq.sortBy(_._1); (wl, ratio) <- curve) {
      merged.get(wl) match {
        case Some((_, r)) if r >= ratio => ()
        case _ => merged(wl) = (band, ratio)
      }
    }
    merged.toArray.sortBy(_._1).map { case (wl, (b, r)) => (wl, b, r) }
  }

  /** P7+P8: interpolate the merged curve at each spectrum wl and apply
    * (`photometry.py:248-254,308-312`). */
  def transmissionRatio(
      wl: Array[Double], curveWl: Array[Double], curveRatio: Array[Double]): Array[Double] =
    Interp.interpArray(wl, curveWl, curveRatio)

  /** P2 gain/dark-variance predicate rows: `camcol` equality + a run
    * predicate string like `>0` / `<1500` (reference eval()s it —
    * `photometry.py:352-357`; we parse it safely). */
  final case class CcdConfigRow(camcol: Int, runPredicate: String, values: Map[String, Double]) {
    private val (op, bound) = CcdConfigRow.parse(runPredicate)
    def matches(camcolQ: Int, run: Int): Boolean =
      camcolQ == camcol && (op match {
        case ">" => run > bound
        case "<" => run < bound
        case ">=" => run >= bound
        case "<=" => run <= bound
        case "==" => run == bound
      })
  }
  object CcdConfigRow {
    private[functions] def parse(p: String): (String, Int) = {
      val t = p.trim
      val op = t.takeWhile(c => c == '<' || c == '>' || c == '=')
      val n = t.drop(op.length).trim.toInt
      (if (op.isEmpty) "==" else op, n)
    }
  }

  def lookupCcd(rows: Seq[CcdConfigRow], camcol: Int, run: Int, band: String): Double =
    rows.find(_.matches(camcol, run)).map(_.values(band))
      .getOrElse(throw new NoSuchElementException(s"no ccd row for camcol=$camcol run=$run"))

  /** Bilinear sample of img at fractional (x, y), edges clamped —
    * scipy `map_coordinates(order=1, mode="nearest")` on a meshgrid
    * (`photometry.py:214-216`). */
  def bilinear(img: Array[Array[Double]], x: Double, y: Double): Double = {
    val h = img.length
    val w = img(0).length
    @inline def clampD(v: Double, hi: Int): Double =
      if (v < 0) 0.0 else if (v > hi) hi.toDouble else v
    val xc = clampD(x, w - 1)
    val yc = clampD(y, h - 1)
    val x0 = math.floor(xc).toInt
    val y0 = math.floor(yc).toInt
    val x1 = math.min(x0 + 1, w - 1)
    val y1 = math.min(y0 + 1, h - 1)
    val fx = xc - x0
    val fy = yc - y0
    (img(y0)(x0) * (1 - fx) + img(y0)(x1) * fx) * (1 - fy) +
      (img(y1)(x0) * (1 - fx) + img(y1)(x1) * fx) * fy
  }

  /** P1 image uncertainty derivation (`photometry.py:193-228`):
    * sky = bilinear(allsky at (yinterp[r], xinterp[c])),
    * dn = img/calib + sky, dnErr = sqrt(dn/gain + darkVariance),
    * imgErr = dnErr * calib.
    *
    * @param img     calibrated image rows (nanomaggies), row-major h×w
    * @param calib   calibration vector, length w (tiled over rows)
    * @param allsky  small sky image
    * @param xinterp x sample coords into allsky, length w
    * @param yinterp y sample coords into allsky, length h
    */
  def imageErrors(
      img: Array[Array[Double]], calib: Array[Double],
      allsky: Array[Array[Double]], xinterp: Array[Double], yinterp: Array[Double],
      gain: Double, darkVariance: Double): Array[Array[Double]] = {
    val h = img.length
    val w = img(0).length
    val out = Array.ofDim[Double](h, w)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val sky = bilinear(allsky, xinterp(c), yinterp(r))
        val dn = img(r)(c) / calib(c) + sky
        val dnErr = math.sqrt(dn / gain + darkVariance)
        out(r)(c) = dnErr * calib(c)
        c += 1
      }
      r += 1
    }
    out
  }
}
