package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Element-wise inverse-variance-weighted stack over (flux, sigma)
  * vectors — the reference's ML-cube aggregation
  * (`metadata_strategy_cube_ml.py:26-37`):
  *
  *   mu_i     = Σ_k (f_ki / s_ki²) / Σ_k (1 / s_ki²)
  *   sigma'_i = sqrt(1 / Σ_k (1 / s_ki²))
  *
  * Reference NaN rules preserved exactly (numpy semantics of
  * `metadata_strategy_cube_ml.py:28-37`): the `where=flux_sigma!=0` guard
  * zeroes both weight terms when sigma==0 (and NaN/Inf sigma contributes
  * nothing via `nansum` / 1/inf²=0); but a NaN flux with a valid sigma is
  * skipped only in the NUMERATOR (`nansum` of f/s²) while its weight 1/s²
  * still counts in both denominators. Elements with zero total weight
  * yield NaN mean (0/0, unguarded divide at line 33) and sigma' = 0 (the
  * guarded `np.divide(1, sigma_sum, zeros, where=sigma_sum!=0)` at 35-36).
  *
  * Accumulation is f64 (reference computes f64, stores f32 —
  * `metadata_strategy_cube_ml.py:27,37`); the caller decides whether to
  * cast the result down to f32.
  *
  * This is a typed `Aggregator` registered via `functions.udaf`, so it
  * participates in partial aggregation: map-side combine reduces each
  * partition to one (sumW, sumWF) buffer pair per group before the
  * shuffle — the 100 TB path moves only #groups × 2×n doubles.
  *
  * The buffer grows to the first observation's length, so one udaf
  * instance serves every zoom level (4620/2^zoom spectra, flattened
  * cutouts) — no per-zoom plan specialization needed.
  *
  * @param sizeHint initial buffer length (0 = grow on first input)
  */
class IvwStackAggregator(sizeHint: Int = 0)
    extends Aggregator[(Seq[Double], Seq[Double]), (Array[Double], Array[Double]), (Array[Double], Array[Double])] {

  /** buffer = (Σ 1/s², Σ f/s²) per element */
  override def zero: (Array[Double], Array[Double]) =
    (Array.fill(sizeHint)(0.0), Array.fill(sizeHint)(0.0))

  private def grown(a: Array[Double], n: Int): Array[Double] =
    if (a.length >= n) a else java.util.Arrays.copyOf(a, n)

  override def reduce(
      buf: (Array[Double], Array[Double]),
      in: (Seq[Double], Seq[Double])): (Array[Double], Array[Double]) = {
    val (flux, sigma) = in
    if (flux == null || sigma == null) return buf
    val m = math.min(flux.length, sigma.length)
    val sumW = grown(buf._1, m)
    val sumWF = grown(buf._2, m)
    var i = 0
    while (i < m) {
      val f = flux(i)
      val s = sigma(i)
      if (s != 0.0 && !s.isNaN && !s.isInfinite) {
        val w = 1.0 / (s * s)
        sumW(i) += w
        if (!f.isNaN) sumWF(i) += f * w
      }
      i += 1
    }
    (sumW, sumWF)
  }

  override def merge(
      a: (Array[Double], Array[Double]),
      b: (Array[Double], Array[Double])): (Array[Double], Array[Double]) = {
    val n = math.max(a._1.length, b._1.length)
    val sumW = grown(a._1, n)
    val sumWF = grown(a._2, n)
    var i = 0
    while (i < b._1.length) {
      sumW(i) += b._1(i)
      sumWF(i) += b._2(i)
      i += 1
    }
    (sumW, sumWF)
  }

  /** (mu, sigma') — where nothing contributed: mu = NaN (numpy's
    * unguarded 0/0) but sigma' = 0 (the reference's guarded divide). */
  override def finish(buf: (Array[Double], Array[Double])): (Array[Double], Array[Double]) = {
    val (sumW, sumWF) = buf
    val n = sumW.length
    val mu = new Array[Double](n)
    val sg = new Array[Double](n)
    var i = 0
    while (i < n) {
      mu(i) = sumWF(i) / sumW(i)
      sg(i) = if (sumW(i) == 0.0) 0.0 else math.sqrt(1.0 / sumW(i))
      i += 1
    }
    (mu, sg)
  }

  override def bufferEncoder: Encoder[(Array[Double], Array[Double])] =
    ExpressionEncoder[(Array[Double], Array[Double])]()
  override def outputEncoder: Encoder[(Array[Double], Array[Double])] =
    ExpressionEncoder[(Array[Double], Array[Double])]()
}
