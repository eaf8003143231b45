package graft.pipeline

/** Core engine tables (FIXTURES.md §2), typed as case classes so
  * Dataset[T] encoders carry the schema.
  */

/** One spectrum observation at one zoom level
  * (mirrors `metadata_strategy_spectrum.py:407,514-538`). */
final case class SpectrumObs(
    zoom: Int,
    spec_id: Long,
    fits_name: String,
    ra: Double,
    dec: Double,
    time: Double, // TAI else MJD (metadata_strategy_spectrum.py:742-747)
    plateid: Long,
    mjd: Long,
    fiberid: Int,
    healpix: Long, // NESTED order 15 (SPEC_SPAT_INDEX_ORDER-1)
    wl: Array[Float],
    flux: Array[Float],
    sigma: Array[Float],
    header: Map[String, String])

/** WCS parameters of an image at a given zoom. */
final case class WcsParams(
    crpix1: Double, crpix2: Double,
    cd11: Double, cd12: Double, cd21: Double, cd22: Double,
    crval1: Double, crval2: Double) {
  def toTan: graft.functions.TanWcs =
    graft.functions.TanWcs(crpix1, crpix2, cd11, cd12, cd21, cd22, crval1, crval2)
}

/** One image observation at one zoom level
  * (mirrors `metadata_strategy_image.py:250,310-335`). */
final case class ImageObs(
    zoom: Int,
    image_id: Long,
    fits_name: String,
    band: String,
    wl: Int, // band midpoint Å
    run: Int,
    camcol: Int,
    field: Int,
    time: Double, // DATE-OBS → MJD (io.py:426-432)
    healpix: Long, // NESTED order 10 of image center (IMG_SPAT_INDEX_ORDER-1)
    width: Int,
    height: Int,
    flux: Array[Array[Float]],
    sigma: Array[Array[Float]],
    wcs: WcsParams,
    header: Map[String, String])

/** Spectrum→image cutout link (region ref analogue,
  * `metadata_strategy.py:27-30`). */
final case class CutoutLink(
    zoom: Int,
    spec_id: Long,
    image_id: Long,
    band: String,
    x_min: Long, x_max: Long, y_min: Long, y_max: Long)

/** One stacked band cutout inside an ML-cube row. */
final case class BandCutout(
    band: String,
    flux: Array[Array[Float]],
    sigma: Array[Array[Float]])

/** Dense ML-cube row: one target (unique spectrum healpix), one zoom
  * (`metadata_strategy_cube_ml.py:113-139`). */
final case class MlCubeRow(
    zoom: Int,
    target_healpix: Long,
    n_spectra: Int,
    spec_flux: Array[Float],
    spec_sigma: Array[Float],
    cutouts: Array[BandCutout],
    spec_ids: Array[Long],
    image_ids: Array[Long])

/** Flat visualization-cube row — one pixel/sample
  * (`metadata_strategy_cube_visualization.py:30-36`). */
final case class VizRow(
    zoom: Int,
    heal_id: Long, // order 19 (OUTPUT_HEAL_ORDER)
    ra: Double,
    dec: Double,
    time: Double,
    wl: Double,
    mean: Double,
    sigma: Double,
    fits_name: String)
