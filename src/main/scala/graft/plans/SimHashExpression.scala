package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash kernel: whitespace tokens → per-token xxhash64
  * (seed 42, Spark's default) → 64 signed counters → packed sign bits.
  *
  * BIT-IDENTICAL to the higher-order-function form it replaces
  * (`TextOps.simhashHof`, pinned by a full-corpus equality spec): the
  * token split calls the SAME `UTF8String.split(pattern, -1)` the
  * built-in `split()` uses, the hash is the same `XxHash64Function`,
  * bit j tests `(h >> j) & 1`, and ties (counter == 0) set the bit.
  *
  * Why native: the HOF form allocates a 64-slot array per TOKEN
  * (`transform(acc, ...)` builds a new accumulator array every lambda
  * step, interpreted); this kernel is two primitive loops over a
  * stack-local long[64] and stays inside whole-stage codegen as a
  * static call. The fingerprint feeds q27's corpus profile and q63's
  * Hamming-ball LSH — at corpus scale the fingerprint scan IS the
  * near-dup cost.
  */
object SimHashKernel {
  private val Space = UTF8String.fromString(" ")

  def simhash64(s: UTF8String): Long = {
    val toks = s.split(Space, -1)
    val cnt = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XxHash64Function.hash(toks(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
        j += 1
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 64) {
      if (cnt(j) >= 0) res |= 1L << j
      j += 1
    }
    res
  }
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}
