package graft.functions

/** Flux-conserving spectral resampling — Scala port of the published
  * SpectRes algorithm (A. Carnall, arXiv:1705.05165), which the reference
  * calls for P9 (`hisscube/utils/photometry.py:343-350`,
  * `spectres.spectres(new_wavs, old_wavs, flux, errs, fill=nan)`).
  *
  * Semantics-bearing (SURVEY §2.2 P9): per new bin, the flux is the
  * bin-width-weighted mean of overlapping old bins with fractional edge
  * bins; errors combine as sqrt(Σ(w·e)²)/Σw; new bins extending beyond
  * the old grid are filled (NaN).
  */
object SpectresRebin {

  /** Bin edges and widths from bin centers (spectres `make_bins`). */
  def makeBins(wavs: Array[Double]): (Array[Double], Array[Double]) = {
    val n = wavs.length
    val edges = new Array[Double](n + 1)
    val widths = new Array[Double](n)
    edges(0) = wavs(0) - (wavs(1) - wavs(0)) / 2
    edges(n) = wavs(n - 1) + (wavs(n - 1) - wavs(n - 2)) / 2
    var i = 1
    while (i < n) { edges(i) = (wavs(i) + wavs(i - 1)) / 2; i += 1 }
    i = 0
    while (i < n) { widths(i) = edges(i + 1) - edges(i); i += 1 }
    (edges, widths)
  }

  /** Resample (flux, errs) from oldWavs onto newWavs.
    * @return (newFlux, newErrs) — newErrs null iff errs null. */
  def rebin(
      newWavs: Array[Double],
      oldWavs: Array[Double],
      flux: Array[Double],
      errs: Array[Double],
      fill: Double = Double.NaN): (Array[Double], Array[Double]) = {

    val (oldEdges, oldWidths) = makeBins(oldWavs)
    val (newEdges, _) = makeBins(newWavs)
    val nNew = newWavs.length
    val nOld = oldWavs.length
    val outF = new Array[Double](nNew)
    val outE = if (errs != null) new Array[Double](nNew) else null

    var start = 0
    var stop = 0
    var j = 0
    while (j < nNew) {
      if (newEdges(j) < oldEdges(0) || newEdges(j + 1) > oldEdges(nOld)) {
        outF(j) = fill
        if (outE != null) outE(j) = fill
      } else {
        while (start < nOld - 1 && oldEdges(start + 1) <= newEdges(j)) start += 1
        while (stop < nOld - 1 && oldEdges(stop + 1) < newEdges(j + 1)) stop += 1
        if (stop == start) {
          outF(j) = flux(start)
          if (outE != null) outE(j) = errs(start)
        } else {
          val startFactor =
            (oldEdges(start + 1) - newEdges(j)) / (oldEdges(start + 1) - oldEdges(start))
          val endFactor =
            (newEdges(j + 1) - oldEdges(stop)) / (oldEdges(stop + 1) - oldEdges(stop))
          var sumFW = 0.0
          var sumW = 0.0
          var sumE2 = 0.0
          var i = start
          while (i <= stop) {
            var w = oldWidths(i)
            if (i == start) w *= startFactor
            if (i == stop) w *= endFactor
            sumFW += w * flux(i)
            sumW += w
            if (outE != null) { val ew = w * errs(i); sumE2 += ew * ew }
            i += 1
          }
          outF(j) = sumFW / sumW
          if (outE != null) outE(j) = math.sqrt(sumE2) / sumW
        }
      }
      j += 1
    }
    (outF, outE)
  }
}
