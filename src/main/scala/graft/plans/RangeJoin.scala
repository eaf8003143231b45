package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension #2: trailing-window range joins
  * without a nested-loop.
  *
  * The natural phrasing of "rows of R within the last W time units of
  * each row of A" is a theta join:
  *
  * {{{ a.join(r, r("t") <= a("t") && r("t") > a("t") - W) }}}
  *
  * Spark has no range-join operator, so without an equi conjunct this
  * plans as a BroadcastNestedLoopJoin — one side broadcast whole, the
  * other scanned per row, O(|A|·|R|) compare operations: the classic
  * 100 TB cliff (with an equi key it degrades more quietly, into a
  * per-key cross product).
  *
  * [[RangeJoinRewriteRule]] recognizes the two range conjuncts in the
  * OPTIMIZED plan and rewrites the join to the bucket-expansion form
  * (the manual shape of `CurationOps.intervalCount`, here applied
  * automatically): bucket the anchor side by `t div W`, explode the
  * ranging side to its own and the NEXT bucket, and join on bucket
  * equality with the ORIGINAL range predicates kept as residuals.
  *
  * Soundness is free — every original conjunct stays in the join.
  * Completeness: trunc-division is monotone with steps ≥ W apart, so
  * for any pair with `a-W <= r <= a` (closed or open ends) the bucket
  * difference `a div W − r div W` is 0 or 1 — exactly the two buckets
  * the ranging side is expanded to (holds for negative times too; the
  * around-zero flat of trunc-div only widens a bucket, never skips
  * one). Each surviving pair meets its anchor's single bucket once, so
  * no dedup pass is needed.
  *
  * The rewritten join carries an equi key, so the planner picks a
  * shuffled hash/merge join: one exchange per side on the bucket (plus
  * any pre-existing equi keys), residual filters evaluated inside the
  * join — never a broadcast of a whole table, never a per-row rescan.
  *
  * Scope guards: inner joins, Long-typed bound attributes (the µs
  * convention of the event queries), a positive literal width, and
  * both bounds referencing the same (anchor, ranger) pair from
  * opposite sides. Everything else is left untouched.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketL = "__gr_bucket_l"
  private val BucketR = "__gr_bucket_r"

  private case class Bounds(anchor: Attribute, ranger: Attribute, width: Long)

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  /** r <= a / r < a (and mirrored) → (a, r). */
  private def asUpper(e: Expression): Option[(Attribute, Attribute)] = e match {
    case LessThanOrEqual(r: Attribute, a: Attribute) => Some((a, r))
    case LessThan(r: Attribute, a: Attribute) => Some((a, r))
    case GreaterThanOrEqual(a: Attribute, r: Attribute) => Some((a, r))
    case GreaterThan(a: Attribute, r: Attribute) => Some((a, r))
    case _ => None
  }

  /** r > a - w / r >= a - w (and mirrored) → (a, r, w). */
  private def asLower(e: Expression): Option[(Attribute, Attribute, Long)] = e match {
    case GreaterThan(r: Attribute, Subtract(a: Attribute, w, _)) =>
      longLit(w).map((a, r, _))
    case GreaterThanOrEqual(r: Attribute, Subtract(a: Attribute, w, _)) =>
      longLit(w).map((a, r, _))
    case LessThan(Subtract(a: Attribute, w, _), r: Attribute) =>
      longLit(w).map((a, r, _))
    case LessThanOrEqual(Subtract(a: Attribute, w, _), r: Attribute) =>
      longLit(w).map((a, r, _))
    case _ => None
  }

  private def findBounds(
      conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[Bounds] = {
    def oppositeSides(a: Attribute, r: Attribute): Boolean =
      (left.outputSet.contains(a) && right.outputSet.contains(r)) ||
        (right.outputSet.contains(a) && left.outputSet.contains(r))
    val uppers = conjuncts.flatMap(asUpper)
    val lowers = conjuncts.flatMap(asLower)
    (for {
      (ua, ur) <- uppers
      (la, lr, w) <- lowers
      if w > 0 && ua.semanticEquals(la) && ur.semanticEquals(lr) &&
        ua.dataType == LongType && ur.dataType == LongType &&
        oppositeSides(ua, ur)
    } yield Bounds(ua, ur, w)).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(a => a.name == BucketL || a.name == BucketR) &&
          !left.output.exists(a => a.name == BucketL || a.name == BucketR) &&
          !right.output.exists(a => a.name == BucketL || a.name == BucketR) =>
      val conjuncts = splitConjunctivePredicates(cond)
      findBounds(conjuncts, left, right) match {
        case Some(Bounds(anchor, ranger, w)) =>
          val anchorOnLeft = left.outputSet.contains(anchor)
          val anchorPlan = if (anchorOnLeft) left else right
          val rangerPlan = if (anchorOnLeft) right else left

          // anchor side: one bucket column, t div W
          val lbAlias = Alias(IntegralDivide(anchor, Literal(w)), BucketL)()
          val anchorProj = Project(anchorPlan.output :+ lbAlias, anchorPlan)
          val lb = anchorProj.output.last

          // ranging side: explode to its own and the next bucket
          val rbAlias = Alias(IntegralDivide(ranger, Literal(w)), "__gr_rb")()
          val rangerProj = Project(rangerPlan.output :+ rbAlias, rangerPlan)
          val rb = rangerProj.output.last
          val genOut = AttributeReference(BucketR, LongType)()
          val gen = Generate(
            Explode(CreateArray(Seq(rb, Add(rb, Literal(1L))))),
            unrequiredChildIndex = Seq(rangerProj.output.length - 1),
            outer = false, qualifier = None,
            generatorOutput = genOut :: Nil,
            child = rangerProj)

          val newCond = (conjuncts :+ EqualTo(lb, genOut).asInstanceOf[Expression])
            .reduce(And)
          val newJoin =
            if (anchorOnLeft) Join(anchorProj, gen, Inner, Some(newCond), hint)
            else Join(gen, anchorProj, Inner, Some(newCond), hint)
          // restore the original schema (bucket columns are internal)
          Project(left.output ++ right.output, newJoin)
        case None => j
      }
  }
}

object RangeJoin {
  /** Idempotent per-session registration (wired into `Tables.load`;
    * SQL-only surfaces get it via GraftExtensions). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewriteRule
}
