package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Summary-table (materialized-view) REWRITE — the optimizer extension
  * that turns `fact.groupBy(keys).agg(count/sum)` into a re-aggregation
  * of a registered, much smaller summary artifact whenever the query's
  * grouping is a COARSENING of the summary's keys and every measure is
  * derivable from the summary's partial aggregates (count → Σcnt,
  * sum(x) → Σsum_x — both are associative partials, so re-aggregating
  * the finer-grained summary is EXACTLY the fact aggregate; this is the
  * classic rollup property every cube engine exploits, HiSS-Cube's own
  * pre-binned zoom pyramid included — `metadata_strategy.py`'s coarser
  * zooms are precisely pre-aggregations served in place of raw pixels).
  *
  * At 100 TB this rewrite is the difference between scanning the fact
  * table and scanning kilobytes: a (source, lang) summary of a document
  * corpus is ~sources×langs rows, and every dashboard aggregate
  * grouped on any SUBSET of those keys is served from it, exactly,
  * with zero query changes — the rule rewrites the logical plan, so
  * Catalyst's own pruning/pushdown then applies to the summary scan.
  *
  * Soundness guardrails (each refuses the rewrite, never corrupts it):
  * the child must be the registered fact relation (path match) under
  * at most a column-pruning Project with NO filter in between (a
  * filtered aggregate is NOT derivable from key-grouped partials
  * unless the predicate is key-only — deliberately out of scope);
  * every grouping expression must be a bare summary-key attribute;
  * every aggregate must be COUNT(*)/COUNT(1) or SUM(attr) with the
  * matching `cnt`/`sum_<attr>` column present in the summary schema.
  * Output attribute ids are preserved via aliases, so the rewritten
  * subtree is a drop-in replacement for parent operators.
  */
object SummaryRewrite {

  /** A registered summary: the fact table's path suffix it summarizes,
    * the summary parquet path, and the key columns it is grouped by.
    * Measure columns follow the naming contract: `cnt` for row counts,
    * `sum_<col>` for each summed measure. */
  final case class Summary(factPathSuffix: String, mvPath: String,
      keys: Set[String])

  private val registry = new ConcurrentHashMap[String, Summary]()

  def register(name: String, summary: Summary): Unit =
    registry.put(name, summary)

  def deregister(name: String): Unit = registry.remove(name)

  def clear(): Unit = registry.clear()

  /** Build + persist a summary artifact honoring the naming contract:
    * one row per key combination, `cnt`, and `sum_<col>` per measure.
    * One map-side-combinable shuffle over the fact table — paid once,
    * amortized over every rewritten query. */
  def buildSummary(spark: SparkSession, factPath: String,
      keys: Seq[String], sumCols: Seq[String], mvPath: String): Unit = {
    import org.apache.spark.sql.functions._
    val fact = spark.read.parquet(factPath)
    val aggs = count(lit(1)).as("cnt") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    fact.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(mvPath)
  }

  case class SummaryRewriteRule(spark: SparkSession)
      extends Rule[LogicalPlan] {

    private def relationPaths(rel: LogicalRelation): Seq[String] =
      rel.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }

    /** The fact relation under at most an attribute-only Project
      * (column pruning) — anything else (Filter, computed columns)
      * refuses the rewrite. */
    private def bareRelation(plan: LogicalPlan): Option[LogicalRelation] =
      plan match {
        case rel: LogicalRelation => Some(rel)
        case Project(projectList, rel: LogicalRelation)
            if projectList.forall(_.isInstanceOf[AttributeReference]) =>
          Some(rel)
        case _ => None
      }

    private def matching(rel: LogicalRelation): Option[Summary] = {
      val paths = relationPaths(rel)
      val it = registry.values().iterator()
      while (it.hasNext) {
        val s = it.next()
        if (paths.exists(_.endsWith(s.factPathSuffix))) return Some(s)
      }
      None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, hint) =>
        val rewritten = for {
          rel <- bareRelation(child)
          summary <- matching(rel)
          groupAttrs <- sequence(groupExprs.map {
            case a: AttributeReference if summary.keys.contains(a.name) =>
              Some(a)
            case _ => None
          })
          mvPlan = spark.read.parquet(summary.mvPath)
            .queryExecution.analyzed
          mvAttrs = mvPlan.output.map(a => a.name -> a).toMap
          if groupAttrs.forall(a => mvAttrs.contains(a.name))
          if mvAttrs.contains("cnt")
          newAggs <- sequence(aggExprs.map(rewriteAgg(_, mvAttrs)))
        } yield Aggregate(
          groupAttrs.map(a => mvAttrs(a.name)), newAggs, mvPlan, hint)
        rewritten.getOrElse(agg)
    }

    private def sequence[T](xs: Seq[Option[T]]): Option[Seq[T]] =
      if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

    /** Rewrite one output expression of the aggregate, preserving its
      * name and exprId so the subtree drops into the parent plan.
      * Matching goes through the AggregateExpression's function field
      * (not positional patterns — Sum carries an evalMode in Spark 4). */
    private def rewriteAgg(e: NamedExpression,
        mv: Map[String, Attribute]): Option[NamedExpression] = e match {
      // grouping key passed through
      case a: AttributeReference if mv.contains(a.name) =>
        Some(Alias(mv(a.name), a.name)(exprId = a.exprId))
      case Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count
              // COUNT(*) / COUNT(<non-null constant>) — a null-able or
              // column argument changes semantics and refuses rewrite
              if c.children.forall(ch => ch.foldable && ch.eval() != null) =>
            // COUNT(*) -> SUM(cnt); groups only exist where summary
            // rows exist, so the sum is never null — coalesce keeps
            // the original non-nullable contract explicit
            Some(Alias(
              Coalesce(Seq(
                AggregateExpression(Sum(mv("cnt")), Complete,
                  isDistinct = false),
                Literal(0L))),
              name)(exprId = e.exprId))
          case s: Sum => s.child match {
            case a: AttributeReference if mv.contains(s"sum_${a.name}") =>
              Some(Alias(
                AggregateExpression(
                  Sum(mv(s"sum_${a.name}")), Complete, isDistinct = false),
                name)(exprId = e.exprId))
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }
  }

  def install(spark: SparkSession): Unit = {
    val rule = SummaryRewriteRule(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[SummaryRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
