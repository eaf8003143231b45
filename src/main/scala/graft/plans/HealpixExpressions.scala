package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.functions.Healpix

/** I1 as a native Catalyst expression: `healpix_cell(ra, dec, order)` —
  * NESTED ang2pix. Codegen emits a direct static call (Scala objects get
  * static forwarders), so the expression stays inside whole-stage codegen
  * instead of falling back to a UDF's serialization boundary.
  */
case class HealpixAng2Pix(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // inputs must already be (double, double, int) — the Column helpers cast
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "healpix_cell"

  override protected def nullSafeEval(ra: Any, dec: Any, order: Any): Any =
    Healpix.ang2pixLonLat(order.asInstanceOf[Int],
      ra.asInstanceOf[Double], dec.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ra, dec, order) =>
      s"graft.functions.Healpix.ang2pixLonLat($order, $ra, $dec)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** I6 as an expression: `healpix_disc(ra, dec, order, radius_rad)` →
  * array<long> of candidate cells (conservative disc cover). Used under
  * `explode(...)` to drive the link-phase equi-join. Interpreted eval
  * (array-building; the cost is the cover computation itself).
  */
case class HealpixQueryDisc(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "healpix_disc"

  override protected def nullSafeEval(ra: Any, dec: Any, order: Any, radius: Any): Any =
    new GenericArrayData(Healpix.queryDiscLonLat(
      order.asInstanceOf[Int], ra.asInstanceOf[Double], dec.asInstanceOf[Double],
      radius.asInstanceOf[Double]))

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
}

object HealpixExpressions {

  import org.apache.spark.sql.functions.call_function

  /** Column builders — resolve through the function registry (the public
    * Column↔Expression bridge in Spark 4); call [[register]] on the
    * session first. */
  def healpix_cell(ra: Column, dec: Column, order: Column): Column =
    call_function("healpix_cell",
      ra.cast("double"), dec.cast("double"), order.cast("int"))

  def healpix_disc(ra: Column, dec: Column, order: Column, radiusRad: Column): Column =
    call_function("healpix_disc",
      ra.cast("double"), dec.cast("double"), order.cast("int"), radiusRad.cast("double"))

  /** SQL registration: SELECT healpix_cell(ra, dec, 11) ... */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "healpix_cell", exprs => HealpixAng2Pix(exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "healpix_disc", exprs => HealpixQueryDisc(exprs(0), exprs(1), exprs(2), exprs(3)), "scala_udf")
  }
}
