package graft.functions

/** numpy-compatible 1-D helpers (pure Scala, no Spark deps). */
object Interp {

  /** `np.linspace(start, stop, num)` — num points, endpoints inclusive. */
  def linspace(start: Double, stop: Double, num: Int): Array[Double] = {
    require(num > 0)
    if (num == 1) Array(start)
    else {
      val step = (stop - start) / (num - 1)
      val out = new Array[Double](num)
      var i = 0
      while (i < num) { out(i) = start + step * i; i += 1 }
      out(num - 1) = stop // exact endpoint like numpy
      out
    }
  }

  /** `np.interp(x, xp, fp)` — piecewise-linear, clamped at the ends;
    * xp must be increasing (reference usage `photometry.py:248-254`,
    * `photometry.py:267-276`). */
  def interp(x: Double, xp: Array[Double], fp: Array[Double]): Double = {
    val n = xp.length
    if (x <= xp(0)) fp(0)
    else if (x >= xp(n - 1)) fp(n - 1)
    else {
      var idx = java.util.Arrays.binarySearch(xp, x)
      if (idx >= 0) fp(idx)
      else {
        idx = -idx - 1 // first index with xp(idx) > x
        val x0 = xp(idx - 1); val x1 = xp(idx)
        val f0 = fp(idx - 1); val f1 = fp(idx)
        f0 + (f1 - f0) * (x - x0) / (x1 - x0)
      }
    }
  }

  def interpArray(xs: Array[Double], xp: Array[Double], fp: Array[Double]): Array[Double] = {
    val out = new Array[Double](xs.length)
    var i = 0
    while (i < xs.length) { out(i) = interp(xs(i), xp, fp); i += 1 }
    out
  }
}
