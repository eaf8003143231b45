package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}

/** Config-driven registration of the engine's native Catalyst
  * expressions — the idiomatic packaging for pure-SQL surfaces:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * makes `healpix_cell`, `healpix_disc` and `float_compress` available
  * to every session (spark-sql shell, Thrift server, notebooks) with no
  * Scala call; `HealpixExpressions.register`/`FloatCompressExpression
  * .register` remain the per-session programmatic path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(
      name: String, clazz: Class[_], builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL literals arrive as DECIMAL/INT — cast here, where the Column
    // helpers (which cast for the programmatic path) are bypassed
    def d(e: Expression) = Cast(e, DoubleType)
    def intLit(e: Expression): Int = {
      require(e.foldable, s"precision argument must be a literal: $e")
      e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"precision argument must be integral, got $other")
      }
    }
    ext.injectFunction(fn("healpix_cell", classOf[HealpixAng2Pix],
      exprs => HealpixAng2Pix(d(exprs(0)), d(exprs(1)), Cast(exprs(2), IntegerType))))
    ext.injectFunction(fn("healpix_disc", classOf[HealpixQueryDisc],
      exprs => HealpixQueryDisc(
        d(exprs(0)), d(exprs(1)), Cast(exprs(2), IntegerType), d(exprs(3)))))
    ext.injectFunction(fn("float_compress", classOf[FloatCompressExpr],
      exprs => FloatCompressExpr(Cast(exprs.head, FloatType))))
    ext.injectFunction(fn("vec_dot", classOf[ArrayDotExpr],
      exprs => ArrayDotExpr(exprs(0), exprs(1))))
    ext.injectFunction(fn("vec_l1", classOf[ArrayL1Expr],
      exprs => ArrayL1Expr(exprs(0), exprs(1))))
    ext.injectFunction(fn("vec_cos", classOf[ArrayCosineExpr],
      exprs => ArrayCosineExpr(exprs(0), exprs(1))))
    ext.injectFunction(fn("vec_nanl1", classOf[ArrayNanL1Expr],
      exprs => ArrayNanL1Expr(exprs(0), exprs(1))))
    ext.injectFunction(fn("simhash64", classOf[SimHash64Expr],
      exprs => SimHash64Expr(exprs.head)))
    ext.injectFunction(fn("sorted_intersect_count", classOf[SortedIntersectCountExpr],
      exprs => SortedIntersectCountExpr(exprs(0), exprs(1))))
    // HLL register-word partials for summary artifacts (HllSummary):
    // a pure-SQL producer can build and fold sketch columns with
    // graft_hll_partial(col, p) / graft_hll_merge(words, p)
    ext.injectFunction(fn("graft_hll_partial", classOf[HllPartialWords],
      exprs => HllPartialWords(exprs(0), intLit(exprs(1)))))
    ext.injectFunction(fn("graft_hll_merge", classOf[HllMergeWords],
      exprs => HllMergeWords(exprs(0), intLit(exprs(1)))))
    // whole-operator extension: filtered-row_number top-k → bounded-heap
    // physical operator (see TopKPerKey.scala)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // whole-operator extension: trailing-window theta join →
    // bucket-expansion equi-join (see RangeJoin.scala)
    ext.injectOptimizerRule(_ => RangeJoinRewriteRule)
    // summary-table serving (see SummaryRewrite.scala): config-driven
    // sessions get the rewrite with zero programmatic install — pair
    // with SummaryRewrite.loadCatalog/registerStore for registrations
    // (the rule no-ops while the registry is empty)
    ext.injectOptimizerRule(session =>
      SummaryRewrite.SummaryRewriteRule(session))
  }
}
