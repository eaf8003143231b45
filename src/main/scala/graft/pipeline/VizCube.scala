package graft.pipeline

import org.apache.spark.sql.Dataset

import graft.functions.Healpix

/** V1/V2 — visualization-cube flatten
  * (`metadata_strategy_cube_visualization.py:110-188`): every spectrum
  * sample and every cutout pixel becomes one flat row keyed by a
  * deep-order healpix id (OUTPUT_HEAL_ORDER=19, config.ini:70).
  *
  * Pure generator fan-out (flatMap) — no shuffle; writing partitioned by
  * zoom and range-sorted by heal_id gives the read path (V3) file-level
  * pruning.
  */
object VizCube {

  val OutputHealOrder = 19

  /** V1: spectrum → one row per wavelength sample. */
  def spectrumRows(spectra: Dataset[SpectrumObs]): Dataset[VizRow] = {
    import spectra.sparkSession.implicits._
    spectra.flatMap { s =>
      val hp = Healpix.ang2pixLonLat(OutputHealOrder, s.ra, s.dec)
      s.wl.indices.iterator.map { i =>
        VizRow(s.zoom, hp, s.ra, s.dec, s.time,
          s.wl(i).toDouble, s.flux(i).toDouble, s.sigma(i).toDouble, s.fits_name)
      }
    }
  }

  /** V2: cutout → one row per pixel, with per-pixel sky coords from the
    * image WCS (meshgrid + wcs_pix2world,
    * `metadata_strategy_cube_visualization.py:147-188`). Input is the
    * dereferenced cutout table joined back to image WCS/time/wl. */
  def cutoutRows(
      links: Dataset[CutoutLink], images: Dataset[ImageObs],
      broadcastLinks: Boolean = true): Dataset[VizRow] = {
    val spark = links.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    // columnar projection: prunes the header map (and at parquet source,
    // every unused column) instead of deserializing whole ImageObs rows
    val img = images.toDF()
      .select(col("zoom"), col("image_id"), col("fits_name").as("i_name"),
        col("time").as("i_time"), col("wl").as("i_wl"),
        col("flux").as("img_flux"), col("sigma").as("img_sigma"), col("wcs"))
    // same contract (and same ~8 GB / ~6M-spectra broadcast bound) as
    // MlCube.cutoutPixelTable: broadcast the link projection so frames
    // stream through the join and fan out to pixel rows inside one
    // stage; above the bound pass broadcastLinks = false for the
    // one-pass (zoom, image_id) shuffle join
    val lnk = if (broadcastLinks) broadcast(links.toDF()) else links.toDF()
    img
      .join(lnk, Seq("zoom", "image_id"))
      .select(col("zoom"), col("x_min"), col("x_max"), col("y_min"), col("y_max"),
        col("i_name"), col("i_time"), col("i_wl"), col("img_flux"), col("img_sigma"), col("wcs"))
      .as[(Int, Long, Long, Long, Long, String, Double, Int,
        Array[Array[Float]], Array[Array[Float]], WcsParams)]
      .flatMap { case (zoom, xMin, xMax, yMin, yMax, name, time, wl, f, s, wp) =>
        val w = wp.toTan
        for {
          y <- (yMin.toInt until yMax.toInt).iterator
          x <- xMin.toInt until xMax.toInt
        } yield {
          val (ra, dec) = w.pix2world(x.toDouble, y.toDouble)
          VizRow(zoom, Healpix.ang2pixLonLat(OutputHealOrder, ra, dec),
            ra, dec, time, wl.toDouble, f(y)(x).toDouble, s(y)(x).toDouble, name)
        }
      }
  }

  def build(
      spectra: Dataset[SpectrumObs],
      links: Dataset[CutoutLink],
      images: Dataset[ImageObs],
      broadcastLinks: Boolean = true): Dataset[VizRow] =
    spectrumRows(spectra).unionAll(cutoutRows(links, images, broadcastLinks))
}
