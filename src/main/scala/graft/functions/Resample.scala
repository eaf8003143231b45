package graft.functions

/** Pyramid resampling kernels (pure Scala, no Spark deps).
  *
  * X1: spectra — Gaussian(σ=2) smoothing + linear re-grid onto a
  * half-length linspace, σ/2 (reference `photometry.py:256-284`).
  * X2: images — bicubic (OpenCV INTER_CUBIC, A=-0.75) half-resolution
  * resize, σ/4 (reference `photometry.py:286-306`).
  */
object Resample {

  /** astropy Gaussian1DKernel(stddev): size = round-up-to-odd(8σ+1)-ish;
    * astropy uses x_size = 8*stddev rounded up to next odd integer. The
    * kernel is a discretized, normalized Gaussian. */
  def gaussianKernel1d(stddev: Double): Array[Double] = {
    var size = math.ceil(8 * stddev).toInt
    if (size % 2 == 0) size += 1
    val half = size / 2
    val k = new Array[Double](size)
    var s = 0.0
    var i = 0
    while (i < size) {
      val x = (i - half).toDouble
      k(i) = math.exp(-x * x / (2 * stddev * stddev))
      s += k(i)
      i += 1
    }
    i = 0
    while (i < size) { k(i) /= s; i += 1 }
    k
  }

  /** astropy-convolve semantics: zero-padded boundary ("fill"), with
    * NaN-interpolation — NaN inputs are excluded and the kernel is
    * renormalized over the contributing weights (astropy default
    * `nan_treatment='interpolate'`, `normalize_kernel=True`). */
  def convolve1d(data: Array[Double], kernel: Array[Double]): Array[Double] = {
    val n = data.length
    val m = kernel.length
    val half = m / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0.0
      var wsum = 0.0
      var j = 0
      while (j < m) {
        val src = i + j - half
        if (src >= 0 && src < n) {
          val v = data(src)
          if (!v.isNaN) { acc += v * kernel(j); wsum += kernel(j) }
        } else {
          wsum += kernel(j) // zero-fill boundary contributes weight, value 0
        }
        j += 1
      }
      // astropy: boundary fill contributes zeros but IS part of the
      // normalized kernel; only NaNs are renormalized away.
      out(i) = if (wsum == 0.0) Double.NaN else acc / wsum
      i += 1
    }
    out
  }

  /** One spectrum zoom step (X1): returns (wlHalf, fluxHalf, sigmaHalf). */
  def spectrumZoomStep(
      wl: Array[Double], flux: Array[Double], sigma: Array[Double])
      : (Array[Double], Array[Double], Array[Double]) = {
    val smoothed = convolve1d(flux, gaussianKernel1d(2.0))
    val wlHalf = Interp.linspace(wl(0), wl(wl.length - 1), wl.length / 2)
    val fluxHalf = Interp.interpArray(wlHalf, wl, smoothed)
    val sigmaHalf = Interp.interpArray(wlHalf, wl, sigma).map(_ / 2.0)
    (wlHalf, fluxHalf, sigmaHalf)
  }

  /** Full spectrum pyramid: zoom 0 (original) .. zoomCnt. */
  def spectrumPyramid(
      wl: Array[Double], flux: Array[Double], sigma: Array[Double], zoomCnt: Int)
      : Seq[(Array[Double], Array[Double], Array[Double])] = {
    val out = Seq.newBuilder[(Array[Double], Array[Double], Array[Double])]
    var cur = (wl, flux, sigma)
    out += cur
    var z = 0
    while (z < zoomCnt) {
      cur = spectrumZoomStep(cur._1, cur._2, cur._3)
      out += cur
      z += 1
    }
    out.result()
  }

  /** OpenCV INTER_CUBIC weight (A = -0.75). */
  @inline private def cubicWeight(t: Double): Double = {
    val a = -0.75
    val x = math.abs(t)
    if (x <= 1) ((a + 2) * x - (a + 3)) * x * x + 1
    else if (x < 2) (((x - 5) * x + 8) * x - 4) * a
    else 0.0
  }

  /** Bicubic resize to (dstW, dstH), matching cv2.resize INTER_CUBIC
    * geometry: src = (dst + 0.5) * scale - 0.5, border clamp. Row-major
    * data(y)(x). */
  def resizeCubic(src: Array[Array[Double]], dstW: Int, dstH: Int): Array[Array[Double]] = {
    val srcH = src.length
    val srcW = src(0).length
    val scaleX = srcW.toDouble / dstW
    val scaleY = srcH.toDouble / dstH
    val out = Array.ofDim[Double](dstH, dstW)

    // per-axis tap positions and weights
    val xIdx = new Array[Int](dstW)
    val xw = Array.ofDim[Double](dstW, 4)
    var dx = 0
    while (dx < dstW) {
      val sx = (dx + 0.5) * scaleX - 0.5
      val ix = math.floor(sx).toInt
      val fx = sx - ix
      xIdx(dx) = ix
      var k = 0
      while (k < 4) { xw(dx)(k) = cubicWeight(fx - (k - 1)); k += 1 }
      dx += 1
    }
    val yIdx = new Array[Int](dstH)
    val yw = Array.ofDim[Double](dstH, 4)
    var dy = 0
    while (dy < dstH) {
      val sy = (dy + 0.5) * scaleY - 0.5
      val iy = math.floor(sy).toInt
      val fy = sy - iy
      yIdx(dy) = iy
      var k = 0
      while (k < 4) { yw(dy)(k) = cubicWeight(fy - (k - 1)); k += 1 }
      dy += 1
    }

    @inline def clamp(v: Int, hi: Int): Int = if (v < 0) 0 else if (v > hi) hi else v

    dy = 0
    while (dy < dstH) {
      var dxx = 0
      while (dxx < dstW) {
        var acc = 0.0
        var ky = 0
        while (ky < 4) {
          val row = src(clamp(yIdx(dy) + ky - 1, srcH - 1))
          val wy = yw(dy)(ky)
          var kx = 0
          while (kx < 4) {
            acc += wy * xw(dxx)(kx) * row(clamp(xIdx(dxx) + kx - 1, srcW - 1))
            kx += 1
          }
          ky += 1
        }
        out(dy)(dxx) = acc
        dxx += 1
      }
      dy += 1
    }
    out
  }

  /** One image zoom step (X2): flux bicubic-halved; sigma halved then /4
    * (2×2 variance). Shapes follow cv2 int-truncation: (w/2, h/2). */
  def imageZoomStep(flux: Array[Array[Double]], sigma: Array[Array[Double]])
      : (Array[Array[Double]], Array[Array[Double]]) = {
    val dstW = flux(0).length / 2
    val dstH = flux.length / 2
    val f = resizeCubic(flux, dstW, dstH)
    val s = resizeCubic(sigma, dstW, dstH).map(_.map(_ / 4.0))
    (f, s)
  }

  def imagePyramid(
      flux: Array[Array[Double]], sigma: Array[Array[Double]], zoomCnt: Int)
      : Seq[(Array[Array[Double]], Array[Array[Double]])] = {
    val out = Seq.newBuilder[(Array[Array[Double]], Array[Array[Double]])]
    var cur = (flux, sigma)
    out += cur
    var z = 0
    while (z < zoomCnt) {
      cur = imageZoomStep(cur._1, cur._2)
      out += cur
      z += 1
    }
    out.result()
  }
}
