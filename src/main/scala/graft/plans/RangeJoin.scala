package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
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
  * Scope guards: inner joins (either orientation) and LEFT OUTER joins
  * whose preserved side is the anchor (the attribution idiom "each
  * purchase with its preceding clicks, purchases without any kept");
  * Long-typed bound attributes (the µs convention of the event
  * queries), a positive literal width, and both bounds referencing the
  * same (anchor, ranger) pair from opposite sides. Everything else is
  * left untouched.
  *
  * A second recognized shape is the SYMMETRIC band `abs(a − r) <= W`
  * (proximity joins — "events within W of each other"): same bucket
  * argument with the ranging side expanded to THREE buckets
  * (−1, 0, +1), since every trunc-div bucket is at least W wide and a
  * length-W interval crosses at most one boundary in each direction;
  * the three copies are distinct, so each pair still joins exactly
  * once.
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

  /** |x − y| <= w / < w (either literal side) → (x, y, w). */
  private def asAbs(e: Expression): Option[(Attribute, Attribute, Long)] = e match {
    case LessThanOrEqual(Abs(Subtract(x: Attribute, y: Attribute, _), _), w) =>
      longLit(w).map((x, y, _))
    case LessThan(Abs(Subtract(x: Attribute, y: Attribute, _), _), w) =>
      longLit(w).map((x, y, _))
    case GreaterThanOrEqual(w, Abs(Subtract(x: Attribute, y: Attribute, _), _)) =>
      longLit(w).map((x, y, _))
    case GreaterThan(w, Abs(Subtract(x: Attribute, y: Attribute, _), _)) =>
      longLit(w).map((x, y, _))
    case _ => None
  }

  private def oppositeSides(
      left: LogicalPlan, right: LogicalPlan)(a: Attribute, r: Attribute): Boolean =
    (left.outputSet.contains(a) && right.outputSet.contains(r)) ||
      (right.outputSet.contains(a) && left.outputSet.contains(r))

  private def findBounds(
      conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[Bounds] = {
    val uppers = conjuncts.flatMap(asUpper)
    val lowers = conjuncts.flatMap(asLower)
    (for {
      (ua, ur) <- uppers
      (la, lr, w) <- lowers
      if w > 0 && ua.semanticEquals(la) && ur.semanticEquals(lr) &&
        ua.dataType == LongType && ur.dataType == LongType &&
        oppositeSides(left, right)(ua, ur)
    } yield Bounds(ua, ur, w)).headOption
  }

  /** Symmetric band |a − r| ≤ W: same bucket argument with a ±1 window —
    * every trunc-div bucket is ≥ W wide (the zero bucket is wider), so
    * a length-W interval crosses at most one boundary and the ranging
    * side expands to THREE buckets instead of two. */
  private def findSymmetric(
      conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[Bounds] =
    conjuncts.flatMap(asAbs).collectFirst {
      case (x, y, w)
          if w > 0 && x.dataType == LongType && y.dataType == LongType &&
            oppositeSides(left, right)(x, y) =>
        Bounds(x, y, w)
    }

  /** The shared bucket-expansion rewrite; `offsets` are the ranging-side
    * bucket copies (trailing window: {0, +1}; symmetric band:
    * {−1, 0, +1}). */
  private def bucketRewrite(
      left: LogicalPlan, right: LogicalPlan, conjuncts: Seq[Expression],
      b: Bounds, offsets: Seq[Long],
      joinType: org.apache.spark.sql.catalyst.plans.JoinType,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint): LogicalPlan = {
    val anchorOnLeft = left.outputSet.contains(b.anchor)
    val anchorPlan = if (anchorOnLeft) left else right
    val rangerPlan = if (anchorOnLeft) right else left

    // anchor side: one bucket column, t div W
    val lbAlias = Alias(IntegralDivide(b.anchor, Literal(b.width)), BucketL)()
    val anchorProj = Project(anchorPlan.output :+ lbAlias, anchorPlan)
    val lb = anchorProj.output.last

    // ranging side: explode to the offset buckets
    val rbAlias = Alias(IntegralDivide(b.ranger, Literal(b.width)), "__gr_rb")()
    val rangerProj = Project(rangerPlan.output :+ rbAlias, rangerPlan)
    val rb = rangerProj.output.last
    val genOut = AttributeReference(BucketR, LongType)()
    val copies = offsets.map {
      case 0L => rb: Expression
      case o => Add(rb, Literal(o)): Expression
    }
    val gen = Generate(
      Explode(CreateArray(copies)),
      unrequiredChildIndex = Seq(rangerProj.output.length - 1),
      outer = false, qualifier = None,
      generatorOutput = genOut :: Nil,
      child = rangerProj)

    val newCond = (conjuncts :+ EqualTo(lb, genOut).asInstanceOf[Expression])
      .reduce(And)
    val newJoin =
      if (anchorOnLeft) Join(anchorProj, gen, joinType, Some(newCond), hint)
      else Join(gen, anchorProj, joinType, Some(newCond), hint)
    // restore the original schema (bucket columns are internal)
    Project(left.output ++ right.output, newJoin)
  }

  /** LEFT OUTER is rewriteable iff the PRESERVED (left) side is the
    * anchor: the anchor side is only projected (multiplicity intact —
    * an unmatched left row null-extends exactly once), while the
    * exploded ranging side sits on the non-preserved side where copies
    * can only match or vanish. An exploded PRESERVED side would emit
    * one null row per unmatched bucket copy — so that orientation is
    * left untouched. */
  private def orientationOk(
      joinType: org.apache.spark.sql.catalyst.plans.JoinType,
      left: LogicalPlan, b: Bounds): Boolean =
    joinType match {
      case Inner => true
      case LeftOuter => left.outputSet.contains(b.anchor)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == LeftOuter) &&
          !j.output.exists(a => a.name == BucketL || a.name == BucketR) &&
          !left.output.exists(a => a.name == BucketL || a.name == BucketR) &&
          !right.output.exists(a => a.name == BucketL || a.name == BucketR) =>
      val conjuncts = splitConjunctivePredicates(cond)
      findBounds(conjuncts, left, right) match {
        case Some(b) if orientationOk(jt, left, b) =>
          bucketRewrite(left, right, conjuncts, b, Seq(0L, 1L), jt, hint)
        case _ => findSymmetric(conjuncts, left, right) match {
          // |x−y| ≤ W is symmetric, so anchor/ranger roles are
          // interchangeable: when the preserved side holds y, swap the
          // orientation instead of abandoning the rewrite to the
          // nested-loop path
          case Some(b) =>
            Seq(b, Bounds(b.ranger, b.anchor, b.width))
              .find(orientationOk(jt, left, _)) match {
              case Some(bb) => bucketRewrite(
                left, right, conjuncts, bb, Seq(-1L, 0L, 1L), jt, hint)
              case None => j
            }
          case None => j
        }
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
