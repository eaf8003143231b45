package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** 64-register HyperLogLog sketch as a typed `Aggregator` — the
  * STREAMING form of [[graft.operators.SketchOps.hllRegisters]]: the
  * same engine-portable two-LCG hash, bucket = h mod 64, rank =
  * 35 − bitlen(h div 64) (v = 0 ⇒ 35), register merge = element-wise
  * max. Registered via `functions.udaf` it participates in partial
  * aggregation AND in streaming state: each micro-batch map-side
  * combines its rows into 64-long buffers, and the state store keeps
  * exactly one 64-long buffer per group forever — bounded state for an
  * unbounded distinct-count, which is the entire reason HLL exists in
  * a stream (a streaming `countDistinct` is disallowed precisely
  * because its state would be member-set-sized).
  *
  * Integer-exact by the same argument as the batch version (every
  * intermediate < 2^63, no floats), so registers produced through the
  * streaming path are BYTE-IDENTICAL to batch registers over the same
  * rows — SketchOpsSpec pins it, and q165's oracle gates the full
  * estimate cross-engine.
  */
class HllSketchAggregator extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], id: Long): Array[Long] = {
    val h = ((id % 1000003L) * 2654435761L % 1000003L) * 999983L +
      (id % 999983L) * 1103515245L % 999983L
    val bucket = (h % 64L).toInt
    val v = h / 64L
    // bitlen(v) = 64 - nlz(v); rank = 35 - (bitlen - 1); v = 0 => 35
    val rk =
      if (v == 0L) 35L
      else 35L - (63 - java.lang.Long.numberOfLeadingZeros(v))
    if (rk > buf(bucket)) buf(bucket) = rk
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
