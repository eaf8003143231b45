package graft.functions

/** TAN (gnomonic) WCS transforms — pure Scala port of the subset of
  * FITS-WCS the reference uses (`hisscube/utils/astrometry.py:39-64`
  * builds astropy WCS from CRPIX/CD/CRVAL/CTYPE; all SDSS frames are
  * `RA---TAN`/`DEC--TAN`).
  *
  * Pixel coordinates are 0-based (astropy `origin=0` convention, which is
  * what the reference passes everywhere: `wcs_pix2world(x, y, 0)`).
  */
final case class TanWcs(
    crpix1: Double, crpix2: Double,
    cd11: Double, cd12: Double, cd21: Double, cd22: Double,
    crval1: Double, crval2: Double) {

  private val det = cd11 * cd22 - cd12 * cd21
  // inverse CD
  private val i11 = cd22 / det
  private val i12 = -cd12 / det
  private val i21 = -cd21 / det
  private val i22 = cd11 / det

  private val ra0 = math.toRadians(crval1)
  private val dec0 = math.toRadians(crval2)
  private val sinDec0 = math.sin(dec0)
  private val cosDec0 = math.cos(dec0)

  /** pixel (0-based) → (raDeg, decDeg); gnomonic de-projection. */
  def pix2world(x: Double, y: Double): (Double, Double) = {
    // intermediate world coords (deg): CD · (p - (crpix - 1))
    val dx = x - (crpix1 - 1)
    val dy = y - (crpix2 - 1)
    val xi = math.toRadians(cd11 * dx + cd12 * dy)
    val eta = math.toRadians(cd21 * dx + cd22 * dy)
    // inverse gnomonic about (ra0, dec0)
    val rho = math.sqrt(xi * xi + eta * eta)
    if (rho == 0.0) (crval1, crval2)
    else {
      val c = math.atan(rho)
      val sinC = math.sin(c)
      val cosC = math.cos(c)
      val dec = math.asin(cosC * sinDec0 + eta * sinC * cosDec0 / rho)
      val ra = ra0 + math.atan2(xi * sinC, rho * cosDec0 * cosC - eta * sinDec0 * sinC)
      var raDeg = math.toDegrees(ra)
      if (raDeg < 0) raDeg += 360.0
      if (raDeg >= 360.0) raDeg -= 360.0
      (raDeg, math.toDegrees(dec))
    }
  }

  /** (raDeg, decDeg) → pixel (0-based); gnomonic projection
    * (astropy `skycoord_to_pixel(..., origin=0)` equivalent —
    * reference `astrometry.py:115-116`). */
  def world2pix(raDeg: Double, decDeg: Double): (Double, Double) = {
    val ra = math.toRadians(raDeg)
    val dec = math.toRadians(decDeg)
    val sinDec = math.sin(dec)
    val cosDec = math.cos(dec)
    val dRa = ra - ra0
    val cosDRa = math.cos(dRa)
    val d = sinDec * sinDec0 + cosDec * cosDec0 * cosDRa
    val xi = math.toDegrees(cosDec * math.sin(dRa) / d)
    val eta = math.toDegrees((sinDec * cosDec0 - cosDec * sinDec0 * cosDRa) / d)
    // invert CD
    val dx = i11 * xi + i12 * eta
    val dy = i21 * xi + i22 * eta
    (dx + crpix1 - 1, dy + crpix2 - 1)
  }

  /** WCS for zoom level z: crpix/2^z, cd*2^z
    * (reference `astrometry.py:185-208`). */
  def atZoom(z: Int): TanWcs = {
    val f = (1L << z).toDouble
    copy(
      crpix1 = crpix1 / f, crpix2 = crpix2 / f,
      cd11 = cd11 * f, cd12 = cd12 * f, cd21 = cd21 * f, cd22 = cd22 * f)
  }
}

object Wcs {

  /** Cutout bounds: [[x_min,x_max],[y_min,y_max]] of the
    * `cutoutSize/2^zoom`-square centered on the spectrum position, or
    * None when the position misses the image entirely (the reference
    * raises NoCoverageFoundError — `astrometry.py:96-139`).
    *
    * Matches the reference arithmetic exactly: int() truncation of the
    * pixel coords, region/2 offsets.
    */
  def cutoutBounds(
      w: TanWcs, imageSizeX: Long, imageSizeY: Long,
      raDeg: Double, decDeg: Double,
      cutoutSize: Int, zoom: Int): Option[CutoutBounds] = {
    val (px, py) = w.world2pix(raDeg, decDeg)
    if (0 <= px && px <= imageSizeX && 0 <= py && py <= imageSizeY) {
      val regionSize = cutoutSize / (1 << zoom)
      val half = regionSize / 2.0
      val x0 = (px.toLong - half).toLong // int(px) - region/2, region even
      val y0 = (py.toLong - half).toLong
      Some(CutoutBounds(x0, x0 + regionSize, y0, y0 + regionSize))
    } else None
  }

  /** `is_cutout_whole` (`astrometry.py:128-137`): all corners within
    * [0, shape] on both axes (note: reference compares x against
    * img_shape[1] = width and y against img_shape[0] = height). */
  def isCutoutWhole(b: CutoutBounds, imgWidth: Long, imgHeight: Long): Boolean =
    0 <= b.xMin && b.xMin <= b.xMax && b.xMax <= imgWidth &&
      0 <= b.yMin && b.yMin <= b.yMax && b.yMax <= imgHeight

  /** Image corner sky coordinates — `get_boundary_coords`
    * (`astrometry.py:11-28`): top-left, bottom-left, top-right,
    * bottom-right of the (width × height) frame. */
  def boundaryCoords(w: TanWcs, width: Int, height: Int): Seq[(Double, Double)] =
    Seq(w.pix2world(0, 0), w.pix2world(0, height),
      w.pix2world(width, 0), w.pix2world(width, height))
}

/** Inclusive-exclusive pixel bounds of a cutout. */
final case class CutoutBounds(xMin: Long, xMax: Long, yMin: Long, yMax: Long)
