package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder_key(x, y)` as a native Catalyst expression: the morton
  * interleave of two long dimensions (low 16 bits each). Codegen emits
  * a direct static call to [[graft.functions.ZOrder.encode]] so the
  * layout key stays inside whole-stage codegen on the write path — the
  * key is computed once per row at layout time, exactly where a UDF's
  * serialization boundary would hurt most (the full-corpus sort).
  */
case class ZOrderKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.functions.ZOrder.encode(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder.encode($x, $y)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

object ZOrderExpression {
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("zorder_key"))) {
      reg.createOrReplaceTempFunction("zorder_key",
        exprs => ZOrderKeyExpr(exprs(0), exprs(1)), "scala_udf")
    }
  }
}
