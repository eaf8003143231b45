package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** P12 `float_compress` as a native unary expression over FLOAT — zero
  * the low mantissa bits (keep 10 binary digits) so pixel parquet
  * compresses 2-4× better (`processors/data.py:7-49`). Codegen emits the
  * static kernel call; apply element-wise to arrays via `transform`.
  */
case class FloatCompressExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = FloatType
  override def prettyName: String = "float_compress"

  override protected def nullSafeEval(v: Any): Any =
    graft.functions.FloatCompress.compress(v.asInstanceOf[Float], 10)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.FloatCompress.compress($v, 10)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object FloatCompressExpression {

  import org.apache.spark.sql.functions.{call_function, transform}

  /** Scalar float column. Requires [[register]] on the session. */
  def float_compress(c: Column): Column =
    call_function("float_compress", c.cast("float"))

  /** Element-wise over array<float>. */
  def float_compress_array(c: Column): Column =
    transform(c, x => float_compress(x))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_compress", exprs => FloatCompressExpr(exprs.head), "scala_udf")
}
