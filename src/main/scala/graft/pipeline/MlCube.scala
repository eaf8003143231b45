package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._


/** A2 — dense ML-cube assembly (`metadata_strategy_cube_ml.py:520-637`):
  * group spectra by target (unique spectrum healpix), IVW-stack the
  * repeated spectra; take the FIRST spectrum's cutouts (reference rule,
  * line 652), group them by band and IVW-stack per band; keep only
  * targets with all 5 bands (lines 261-262).
  *
  * Scale shape: one shuffle on the target key for the spectral stack, one
  * on (target, band) for the cutout stacks — both with small group
  * cardinality and partial, associative math inside `reduceGroups`-style
  * folds. Accumulation f64, output f32 (reference lines 27,37).
  */
object MlCube {

  /** Element-wise IVW accumulate: (sumW, sumWF) += obs. */
  private def accumulate(
      sumW: Array[Double], sumWF: Array[Double],
      flux: Array[Float], sigma: Array[Float]): Unit = {
    val n = math.min(sumW.length, math.min(flux.length, sigma.length))
    var i = 0
    while (i < n) {
      val f = flux(i).toDouble
      val s = sigma(i).toDouble
      // numpy rule (metadata_strategy_cube_ml.py:28-33): valid sigma always
      // counts in the denominators; NaN flux is skipped in the numerator only
      if (s != 0.0 && !s.isNaN && !s.isInfinite) {
        val w = 1.0 / (s * s)
        sumW(i) += w
        if (!f.isNaN) sumWF(i) += f * w
      }
      i += 1
    }
  }

  private def finishMu(sumW: Array[Double], sumWF: Array[Double]): Array[Float] = {
    val out = new Array[Float](sumW.length)
    var i = 0
    while (i < sumW.length) { out(i) = (sumWF(i) / sumW(i)).toFloat; i += 1 }
    out
  }

  private def finishSigma(sumW: Array[Double]): Array[Float] = {
    val out = new Array[Float](sumW.length)
    var i = 0
    while (i < sumW.length) {
      // guarded divide (metadata_strategy_cube_ml.py:35-36): zero weight → 0
      out(i) = (if (sumW(i) == 0.0) 0.0 else math.sqrt(1.0 / sumW(i))).toFloat
      i += 1
    }
    out
  }

  /** 2-D IVW stack over a group of same-shape cutouts. */
  def stack2d(obs: Iterator[(Array[Array[Float]], Array[Array[Float]])])
      : (Array[Array[Float]], Array[Array[Float]]) = {
    var sumW: Array[Array[Double]] = null
    var sumWF: Array[Array[Double]] = null
    obs.foreach { case (f, s) =>
      if (sumW == null) {
        sumW = Array.ofDim[Double](f.length, if (f.isEmpty) 0 else f(0).length)
        sumWF = Array.ofDim[Double](f.length, if (f.isEmpty) 0 else f(0).length)
      }
      var r = 0
      while (r < math.min(sumW.length, f.length)) {
        accumulate(sumW(r), sumWF(r), f(r), s(r))
        r += 1
      }
    }
    (sumW.indices.map(r => finishMu(sumW(r), sumWF(r))).toArray,
      sumW.indices.map(r => finishSigma(sumW(r))).toArray)
  }

  final case class SpecStack(
      zoom: Int, target_healpix: Long, n_spectra: Int,
      spec_flux: Array[Float], spec_sigma: Array[Float],
      spec_ids: Array[Long], first_spec_id: Long)

  /** Per (target, zoom): IVW spectral stack + provenance + the id of the
    * first spectrum (reference order: the sorted (spatial, time) index). */
  def specStacks(spectra: Dataset[SpectrumObs]): Dataset[SpecStack] = {
    import spectra.sparkSession.implicits._
    spectra
      .groupByKey(s => (s.healpix, s.zoom))
      .mapGroups { (key: (Long, Int), it: Iterator[SpectrumObs]) =>
        val (hp, zoom) = key
        val rows = it.toArray.sortBy(s => (s.time, s.spec_id))
        val n = rows.head.flux.length
        val sumW = Array.fill(n)(0.0)
        val sumWF = Array.fill(n)(0.0)
        rows.foreach(s => accumulate(sumW, sumWF, s.flux, s.sigma))
        SpecStack(zoom, hp, rows.length,
          finishMu(sumW, sumWF), finishSigma(sumW),
          rows.map(_.spec_id), rows.head.spec_id)
      }
  }

  /** Full ML cube. `cutoutPixels` = links joined to image pixel arrays
    * (see [[cutoutPixelTable]]). */
  def build(
      spectra: Dataset[SpectrumObs],
      links: Dataset[CutoutLink],
      images: Dataset[ImageObs],
      requiredBands: Int = 5): Dataset[MlCubeRow] = {
    val spark = spectra.sparkSession
    import spark.implicits._

    val stacks = specStacks(spectra)

    // restrict links to each target's first spectrum (reference rule)
    val firstIds = stacks.filter(_.zoom == 0)
      .map(s => (s.target_healpix, s.first_spec_id))
      .toDF("target_healpix", "first_spec_id")

    val cut = cutoutPixelTable(links, images)
      .join(broadcast(firstIds), $"spec_id" === $"first_spec_id")

    // IVW stack per (target, zoom, band)
    val bandStacks = cut
      .select($"target_healpix", $"zoom", $"band", $"image_id", $"flux", $"sigma")
      .as[(Long, Int, String, Long, Array[Array[Float]], Array[Array[Float]])]
      .groupByKey(r => (r._1, r._2, r._3))
      .mapGroups { (key: (Long, Int, String), it: Iterator[(Long, Int, String, Long, Array[Array[Float]], Array[Array[Float]])]) =>
        val (target, zoom, band) = key
        val rows = it.toArray.sortBy(_._4)
        val (mu, sg) = stack2d(rows.iterator.map(r => (r._5, r._6)))
        (target, zoom, band, mu, sg, rows.map(_._4))
      }
      .toDF("target_healpix", "zoom", "band", "flux", "sigma", "image_ids")

    // assemble: 5-band completeness filter (HAVING over collected bands)
    val grouped = bandStacks
      .as[(Long, Int, String, Array[Array[Float]], Array[Array[Float]], Array[Long])]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Long, Int), it: Iterator[(Long, Int, String, Array[Array[Float]], Array[Array[Float]], Array[Long])]) =>
        val (target, zoom) = key
        val rows = it.toArray.sortBy(_._3)
        (target, zoom,
          rows.map(r => BandCutout(r._3, r._4, r._5)),
          rows.flatMap(_._6).distinct)
      }
      .toDF("target_healpix", "zoom", "cutouts", "image_ids")

    stacks.toDF()
      .join(grouped, Seq("target_healpix", "zoom"))
      .filter(size($"cutouts") === requiredBands)
      .select($"zoom", $"target_healpix", $"n_spectra",
        $"spec_flux", $"spec_sigma", $"cutouts", $"spec_ids", $"image_ids")
      .as[MlCubeRow]
  }

  /** §3.3 read path: top-k most similar targets to a probe target by
    * `target_distance` (A4 — nansum of |Δ| over the stacked spectra;
    * the reference computes this in notebook numpy; here it is a real
    * distributed top-k: broadcast probe + TakeOrderedAndProject). */
  def similarTargets(
      ml: Dataset[MlCubeRow], probeTarget: Long, zoom: Int, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val spark = ml.sparkSession
    import spark.implicits._
    import graft.operators.VectorOps
    val probe = ml.filter(r => r.zoom == zoom && r.target_healpix == probeTarget)
      .map(_.spec_flux.map(_.toDouble))
      .toDF("probe_flux")
    val candidates = ml.filter(_.zoom == zoom)
      .map(r => (r.target_healpix, r.spec_flux.map(_.toDouble)))
      .toDF("target_healpix", "flux")
    candidates
      .crossJoin(broadcast(probe))
      .filter($"target_healpix" =!= probeTarget)
      .select($"target_healpix",
        nanDistance($"flux", $"probe_flux").as("target_distance"))
      .orderBy($"target_distance", $"target_healpix")
      .limit(k)
  }

  /** nansum of |a-b|: NaN elements contribute 0
    * (`metadata_strategy_cube_ml.py:40-48`). */
  private def nanDistance(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val d = zip_with(a, b, (x, y) => abs(x - y))
    aggregate(d, lit(0.0), (acc, x) => acc + when(isnan(x), 0.0).otherwise(x))
  }

  /** J6 — region-ref dereference as a join: link rows → sliced image
    * pixel arrays (`utils/io_strategy.py:80-100`). */
  def cutoutPixelTable(
      links: Dataset[CutoutLink], images: Dataset[ImageObs]): org.apache.spark.sql.DataFrame = {
    val spark = links.sparkSession
    import spark.implicits._
    val img = images
      .map(i => (i.zoom, i.image_id, i.flux, i.sigma))
      .toDF("zoom", "image_id", "img_flux", "img_sigma")
    links.toDF()
      .join(img, Seq("zoom", "image_id"))
      .select($"zoom", $"spec_id", $"image_id", $"band",
        $"x_min", $"x_max", $"y_min", $"y_max", $"img_flux", $"img_sigma")
      .as[(Int, Long, Long, String, Long, Long, Long, Long,
        Array[Array[Float]], Array[Array[Float]])]
      .map { case (zoom, specId, imageId, band, xMin, xMax, yMin, yMax, f, s) =>
        // slice [yMin,yMax) × [xMin,xMax)
        val cf = sliceRows(f, yMin.toInt, yMax.toInt, xMin.toInt, xMax.toInt)
        val cs = sliceRows(s, yMin.toInt, yMax.toInt, xMin.toInt, xMax.toInt)
        (zoom, specId, imageId, band, cf, cs)
      }
      .toDF("zoom", "spec_id", "image_id", "band", "flux", "sigma")
  }

  def sliceRows(a: Array[Array[Float]], y0: Int, y1: Int, x0: Int, x1: Int): Array[Array[Float]] =
    java.util.Arrays.copyOfRange(a, y0, y1).map(r => java.util.Arrays.copyOfRange(r, x0, x1))
}
