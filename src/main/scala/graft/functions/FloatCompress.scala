package graft.functions

/** P12 `float_compress` (`hisscube/processors/data.py:7-49`, after the
  * SDSS IDL FLOATCOMPRESS): zero the low mantissa bits, keeping `ndig`
  * binary digits, to make float arrays more compressible. Zeros and +Inf
  * pass through unchanged (the reference's `wzer` mask covers only
  * `data==0 | data==np.Inf`, data.py:32); -Inf falls through the
  * log/round path and becomes NaN in numpy — reproduced here.
  */
object FloatCompress {

  def compress(v: Float, ndig: Int = 10): Float = {
    if (v == Float.NegativeInfinity) Float.NaN
    else if (v == 0f || v.isInfinite || v.isNaN) v
    else {
      val log2 = math.ceil(math.log(math.abs(v.toDouble)) / math.log(2.0))
      val mant = math.rint(v / math.pow(2.0, log2 - ndig)) / math.pow(2.0, ndig)
      (mant * math.pow(2.0, log2)).toFloat
    }
  }

  def compress(a: Array[Float], ndig: Int): Array[Float] = {
    val out = new Array[Float](a.length)
    var i = 0
    while (i < a.length) { out(i) = compress(a(i), ndig); i += 1 }
    out
  }
}
