package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Summary-table (materialized-view) REWRITE — the optimizer extension
  * that turns `fact.groupBy(keys).agg(count/sum/min/max)` into a
  * re-aggregation of a registered, much smaller summary artifact
  * whenever the query's grouping is a COARSENING of the summary's keys
  * and every measure is derivable from the summary's partial aggregates
  * (count → Σcnt, sum(x) → Σsum_x, min(x) → min(min_x), max(x) →
  * max(max_x) — all associative partials, so re-aggregating the
  * finer-grained summary is EXACTLY the fact aggregate; this is the
  * classic rollup property every cube engine exploits, HiSS-Cube's own
  * pre-binned zoom pyramid included — `metadata_strategy.py`'s coarser
  * zooms are precisely pre-aggregations served in place of raw pixels).
  *
  * KEY-ONLY FILTERS are served too: `Aggregate(keys, aggs,
  * Filter(pred, scan))` rewrites when `pred` references only summary
  * key columns — the predicate partitions whole summary rows, so it is
  * pushed verbatim onto the summary scan. This is the most common
  * dashboard shape (`WHERE source = 'web' GROUP BY lang`), and the
  * Spark analogue of HiSS-Cube serving a zoom-level WINDOWED read from
  * the pre-aggregated slice rather than raw data
  * (`metadata_strategy_cube_visualization.py:57-72` reads one zoom
  * table slice, not the whole cube).
  *
  * STAR JOINS are served too: `Aggregate(g, a, fact ⋈ dim)` rewrites
  * to `Aggregate(g, a', summary ⋈ dim)` when the inner equi-join runs
  * entirely on summary keys — all fact rows sharing a key have the
  * same dim matches, so the fact collapse multiplies every joined
  * group identically and count/sum/min/max/avg re-derive exactly
  * (dim-side measures only MIN/MAX, the multiplicity-insensitive
  * ones). The classic partial-aggregation pushdown through a star
  * join, from a persisted partial (q260).
  *
  * COVERING-SUMMARY SELECTION: all registered summaries of the fact
  * are candidates; the rule picks the smallest (fewest keys, then
  * registration name for determinism) whose key set covers the
  * grouping keys AND the filter's references AND whose schema carries
  * every needed measure. A registered summary that does not cover a
  * query can never capture it away from one that does.
  *
  * At 100 TB this rewrite is the difference between scanning the fact
  * table and scanning kilobytes: a (source, lang) summary of a document
  * corpus is ~sources×langs rows, and every dashboard aggregate
  * grouped on any SUBSET of those keys — optionally under a key-only
  * predicate — is served from it, exactly, with zero query changes.
  * The rule rewrites the logical plan, so Catalyst's own
  * pruning/pushdown then applies to the summary scan.
  *
  * Soundness guardrails (each refuses the rewrite, never corrupts it):
  * the child must be the registered fact relation (path-BOUNDARY
  * match, so `documents.parquet` cannot claim `raw_documents.parquet`)
  * under at most column-pruning Projects and deterministic,
  * subquery-free Filters whose references are all summary keys; every
  * grouping expression must be a bare attribute covered by the chosen
  * summary's keys; every aggregate must be COUNT(*)/COUNT(1),
  * SUM(attr), MIN(attr), MAX(attr), or AVG(attr) — the last derived
  * as Σsum_attr / Σcnt over a Long partial — with the matching
  * `cnt`/`sum_<attr>`/`min_<attr>`/`max_<attr>` column present in the
  * summary schema; and every rewritten output expression must have
  * EXACTLY the original's dataType (`cnt` must be LongType) — a
  * decimal measure whose re-aggregation would widen precision refuses
  * rather than corrupting the resolved schema. Output attribute ids
  * are preserved via aliases, so the rewritten subtree is a drop-in
  * replacement for parent operators.
  */
object SummaryRewrite {

  /** A registered summary: the fact table's path suffix it summarizes,
    * where the summary artifact lives, and the key columns it is
    * grouped by. Measure columns follow the naming contract: `cnt` for
    * row counts, `sum_<col>` / `min_<col>` / `max_<col>` per measure.
    *
    * `store` (when set) points at an [[graft.operators.IndexOps]]
    * snapshot store instead of a fixed path: the rule resolves the
    * NEWEST committed `snap=N` at rewrite time (one driver-side
    * directory listing, zero Spark jobs), so a summary maintained by a
    * streaming job — or rebuilt in a different session — is picked up
    * without re-registration, and readers never see a half-written
    * version (the store's FS-rename commit discipline). */
  final case class Summary(factPathSuffix: String, mvPath: String,
      keys: Set[String], store: Option[String] = None)

  private val registry = new ConcurrentHashMap[String, Summary]()

  def register(name: String, summary: Summary): Unit =
    registry.put(name, summary)

  /** Register a summary served from a snapshot STORE (see
    * [[Summary.store]]); the mvPath is resolved per query to the
    * newest committed version. */
  def registerStore(name: String, factPathSuffix: String, store: String,
      keys: Set[String]): Unit =
    registry.put(name, Summary(factPathSuffix, "", keys, Some(store)))

  def deregister(name: String): Unit = registry.remove(name)

  def clear(): Unit = registry.clear()

  /** The summary frame honoring the naming contract: one row per key
    * combination, `cnt`, `sum_<col>`, and `min_<col>`/`max_<col>` per
    * measure. One map-side-combinable shuffle over the fact table —
    * paid once, amortized over every rewritten query. */
  def summaryFrame(fact: DataFrame, keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = count(lit(1)).as("cnt") +:
      (sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))))
    fact.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build + persist a summary artifact at a fixed path. */
  def buildSummary(spark: SparkSession, factPath: String,
      keys: Seq[String], sumCols: Seq[String], mvPath: String,
      minMaxCols: Seq[String] = Seq.empty): Unit =
    summaryFrame(spark.read.parquet(factPath), keys, sumCols, minMaxCols)
      .coalesce(1)
      .write.mode("overwrite").parquet(mvPath)

  /** Build + commit a summary into a snapshot store via the FS-rename
    * discipline ([[graft.operators.IndexOps.writeSnapshot]]); returns
    * the committed version. Pair with [[registerStore]] so queries in
    * ANY session (the store outlives the SparkSession) read the newest
    * commit. */
  def buildSummarySnapshot(spark: SparkSession, factPath: String,
      keys: Seq[String], sumCols: Seq[String], store: String,
      minMaxCols: Seq[String] = Seq.empty): Long =
    graft.operators.IndexOps.writeSnapshot(
      summaryFrame(spark.read.parquet(factPath), keys, sumCols, minMaxCols)
        .coalesce(1),
      store)

  /** BATCH incremental maintenance: fold the latest committed summary
    * with the delta's partials and commit the result as the next
    * snapshot — the cnt/sum/min/max columns are all monoids, so
    * fold(old, partial(delta)) ≡ rebuild(old_fact ∪ delta), and the
    * fact table is only ever scanned for the DELTA. The fold itself
    * shuffles two summary-sized frames (keys-cardinality rows), not
    * the corpus: at 100 TB this is the difference between a nightly
    * full rebuild and a per-batch kilobyte merge. Readers keep the
    * previous snapshot until the FS-rename commit lands ([[
    * graft.operators.IndexOps.writeSnapshot]]); a store-backed
    * registration serves the new version on its next query. */
  def mergeDelta(spark: SparkSession, store: String, deltaFact: DataFrame,
      keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty): Long = {
    import org.apache.spark.sql.functions._
    val delta = summaryFrame(deltaFact, keys, sumCols, minMaxCols)
    val latest = graft.operators.IndexOps.readSnapshot(spark, store)
    val foldAggs = sum(col("cnt")).as("cnt") +:
      (sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        minMaxCols.flatMap(c => Seq(
          min(col(s"min_$c")).as(s"min_$c"),
          max(col(s"max_$c")).as(s"max_$c"))))
    val folded = latest.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(foldAggs.head, foldAggs.tail: _*)
    graft.operators.IndexOps.writeSnapshot(folded.coalesce(1), store)
  }

  /** Freshness/integrity AUDIT of a registered summary: recompute the
    * partials from the fact and diff against the artifact, returning
    * per-key discrepancy rows (empty = the summary is exact). This is
    * the monitoring complement of the lifecycle — build
    * ([[buildSummary]]/[[buildSummarySnapshot]]), serve (the rule),
    * maintain ([[mergeDelta]], streaming fold), audit (here): a
    * summary that drifted (missed delta, manual fact edit) serves
    * WRONG dashboards silently, and the audit is the one pass that
    * proves it didn't. Cost: one fact scan + a summary-sized join —
    * the same price as one unserved rollup, paid on the monitoring
    * cadence, not per query. Full-outer on the keys so both phantom
    * summary rows and missing fact groups surface. */
  def auditSummary(spark: SparkSession, factPath: String,
      summary: Summary, sumCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val keys = summary.keys.toSeq.sorted
    val expect = summaryFrame(spark.read.parquet(factPath), keys, sumCols)
    val mvPath = summary.store match {
      case Some(st) =>
        val live = graft.operators.IndexOps.snapshotVersions(spark, st)
        require(live.nonEmpty, s"auditSummary: empty store $st")
        s"$st/snap=${live.max}"
      case None => summary.mvPath
    }
    val got = spark.read.parquet(mvPath)
    val measures = "cnt" +: sumCols.map(c => s"sum_$c")
    val e = expect.select(keys.map(col) ++
      measures.map(m => col(m).as(s"expect_$m")): _*)
    val g = got.select(keys.map(col) ++
      measures.map(m => col(m).as(s"got_$m")): _*)
    e.join(g, keys, "full_outer")
      .filter(measures.map(m =>
        !(col(s"expect_$m") <=> col(s"got_$m"))).reduce(_ || _))
  }

  case class SummaryRewriteRule(spark: SparkSession)
      extends Rule[LogicalPlan] with PredicateHelper {

    private def relationPaths(rel: LogicalRelation): Seq[String] =
      rel.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }

    /** The fact relation under at most attribute-only Projects (column
      * pruning) and deterministic, subquery-free Filters — anything
      * else (computed columns, nondeterminism) refuses the rewrite.
      * Stacked filters conjoin; whether each predicate is KEY-ONLY is
      * judged per candidate summary later. */
    private case class Shape(rel: LogicalRelation, pred: Option[Expression])

    private def decompose(plan: LogicalPlan): Option[Shape] = plan match {
      case rel: LogicalRelation => Some(Shape(rel, None))
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        decompose(child)
      case Filter(cond, child)
          if cond.deterministic &&
            !cond.exists(_.isInstanceOf[PlanExpression[_]]) =>
        decompose(child).map(sh =>
          sh.copy(pred = sh.pred.map(And(cond, _)).orElse(Some(cond))))
      case _ => None
    }

    /** All registered summaries of this relation whose keys cover the
      * needed columns, smallest first (fewest keys, then registration
      * name — deterministic under any registration order). Path match
      * is boundary-anchored: `documents.parquet` matches
      * `.../documents.parquet` but never `.../raw_documents.parquet`. */
    private def candidates(rel: LogicalRelation,
        needed: Set[String]): Seq[Summary] = {
      val paths = relationPaths(rel)
      import scala.jdk.CollectionConverters._
      registry.entrySet().asScala.toSeq
        .map(e => (e.getKey, e.getValue))
        .filter { case (_, s) =>
          paths.exists(p =>
            p == s.factPathSuffix || p.endsWith("/" + s.factPathSuffix)) &&
            needed.subsetOf(s.keys)
        }
        .sortBy { case (name, s) => (s.keys.size, name) }
        .map(_._2)
    }

    /** Newest committed artifact for the summary — fixed path, or the
      * latest snapshot version when store-backed (None when the store
      * has no committed snapshot yet: refuse, the fact scan answers). */
    private def resolveMvPath(s: Summary): Option[String] = s.store match {
      case None => Some(s.mvPath)
      case Some(st) =>
        val live = graft.operators.IndexOps.snapshotVersions(spark, st)
        if (live.isEmpty) None else Some(s"$st/snap=${live.max}")
    }

    private val mvRelCache =
      new ConcurrentHashMap[String, LogicalRelation]()

    /** The summary's analyzed relation. Store-backed paths are
      * IMMUTABLE by construction (a new commit is a new `snap=N`
      * directory), so their footer read is cached per path — the
      * serving-layer latency win for a long-lived dashboard session.
      * Every use gets `newInstance()` (fresh exprIds, zero IO) so two
      * rewrites in ONE plan — a union of rollup members, a self-join —
      * can never collide on attribute ids. Fixed mvPath registrations
      * may be rebuilt in place and are re-read per query. */
    private def mvPlanFor(path: String,
        immutable: Boolean): Option[LogicalPlan] =
      if (!immutable)
        Try(spark.read.parquet(path).queryExecution.analyzed).toOption
      else Option(mvRelCache.get(path)).map(_.newInstance()).orElse {
        Try(spark.read.parquet(path).queryExecution.analyzed).toOption.map {
          case lr: LogicalRelation =>
            mvRelCache.put(path, lr)
            lr.newInstance()
          case other => other
        }
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, hint) =>
        val direct = for {
          shape <- decompose(child)
          groupAttrs <- sequence(groupExprs.map {
            case a: AttributeReference => Some(a)
            case _ => None
          })
          needed = groupAttrs.map(_.name).toSet ++
            shape.pred.toSeq.flatMap(_.references.toSeq.map(_.name))
          result <- candidates(shape.rel, needed).view
            .flatMap(s => tryRewrite(s, groupAttrs, aggExprs,
              shape.pred, hint))
            .headOption
        } yield result
        direct
          .orElse(stripProjects(child) match {
            case j: Join => tryJoinRewrite(groupExprs, aggExprs, j, hint)
            case _ => None
          })
          .getOrElse(agg)
    }

    private def stripProjects(plan: LogicalPlan): LogicalPlan = plan match {
      case Project(pl, child)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripProjects(child)
      case other => other
    }

    /** STAR-JOIN rewrite — `Aggregate(g, a, fact ⋈ dim)` becomes
      * `Aggregate(g, a', summary ⋈ dim)` when the inner equi-join runs
      * entirely on summary KEYS: all fact rows sharing a key have the
      * same dim matches, so collapsing them into their summary row
      * multiplies every joined group identically — count(*) = Σcnt·m,
      * sum(x) = Σsum_x·m, min/max multiplicity-insensitive, avg a
      * ratio of the two sums — and the rewritten aggregate is EXACT
      * for any dim side, unique keys or not. This is the classic
      * partial-aggregation pushdown through a star join, served from
      * a PERSISTED partial: the 100 TB fact scan disappears and the
      * join shrinks to summary-size × dim.
      *
      * Soundness: Inner join only; every conjunct a fact-key = dim
      * EqualTo; grouping attrs from the dim side or fact summary keys;
      * dim-side measures only MIN/MAX (multiplicity-insensitive —
      * count/sum/avg over dim change with fact collapse and refuse);
      * fact-side measures the usual cnt/sum/min/max/avg derivations;
      * mixed fact×dim expressions refuse. Both orientations tried. */
    private def tryJoinRewrite(groupExprs: Seq[Expression],
        aggExprs: Seq[NamedExpression], join: Join,
        hint: Option[AggregateHint]): Option[Aggregate] = {
      val Join(l, r, joinType, condOpt, jhint) = join
      if (joinType != Inner) return None
      val cond = condOpt.getOrElse(return None)
      Seq((l, r, true), (r, l, false)).view.flatMap {
        case (factSide, dimSide, factOnLeft) =>
          for {
            shape <- decompose(factSide)
            factOut = factSide.outputSet
            dimOut = dimSide.outputSet
            // every conjunct: fact-attr = dim-attr (either order)
            pairs <- sequence(splitConjunctivePredicates(cond).map {
              case EqualTo(a: AttributeReference, b: AttributeReference)
                  if factOut.contains(a) && dimOut.contains(b) =>
                Some(a)
              case EqualTo(b: AttributeReference, a: AttributeReference)
                  if factOut.contains(a) && dimOut.contains(b) =>
                Some(a)
              case _ => None
            })
            groupAttrs <- sequence(groupExprs.map {
              case a: AttributeReference
                  if dimOut.contains(a) || factOut.contains(a) =>
                Some(a)
              case _ => None
            })
            needed = (groupAttrs.filter(factOut.contains).map(_.name) ++
              pairs.map(_.name) ++
              shape.pred.toSeq.flatMap(_.references.toSeq.map(_.name))).toSet
            result <- candidates(shape.rel, needed).view.flatMap { s =>
              tryJoinCandidate(s, groupAttrs, aggExprs, shape.pred,
                factOut, dimOut, dimSide, cond, factOnLeft, jhint, hint)
            }.headOption
          } yield result
      }.headOption
    }

    private def tryJoinCandidate(summary: Summary,
        groupAttrs: Seq[AttributeReference],
        aggExprs: Seq[NamedExpression], pred: Option[Expression],
        factOut: AttributeSet, dimOut: AttributeSet, dimSide: LogicalPlan,
        cond: Expression, factOnLeft: Boolean, jhint: JoinHint,
        hint: Option[AggregateHint]): Option[Aggregate] = for {
      path <- resolveMvPath(summary)
      mvPlan <- mvPlanFor(path, summary.store.isDefined)
      mvAttrs = mvPlan.output.map(a => a.name -> a).toMap
      if groupAttrs.forall(a =>
        dimOut.contains(a) || mvAttrs.contains(a.name))
      if pred.forall(_.references.toSeq.forall(r => mvAttrs.contains(r.name)))
      // a registration whose declared keys are absent from the summary
      // FILE must refuse, not throw inside the condition remap
      if cond.references.toSeq.filter(factOut.contains)
        .forall(r => mvAttrs.contains(r.name))
      cnt <- mvAttrs.get("cnt")
      if cnt.dataType == LongType
      newAggs <- sequence(aggExprs.map(e =>
        rewriteAgg(e, mvAttrs, dimOut).filter(_.dataType == e.dataType)))
      remap = (ex: Expression) => ex.transform {
        case a: AttributeReference if factOut.contains(a) => mvAttrs(a.name)
      }
      factPlan = pred match {
        case Some(p) => Filter(remap(p), mvPlan)
        case None => mvPlan
      }
      newJoin = if (factOnLeft)
        Join(factPlan, dimSide, Inner, Some(remap(cond)), jhint)
      else Join(dimSide, factPlan, Inner, Some(remap(cond)), jhint)
      newGroup = groupAttrs.map(a =>
        if (dimOut.contains(a)) a else mvAttrs(a.name))
    } yield Aggregate(newGroup, newAggs, newJoin, hint)

    /** Attempt the rewrite against ONE candidate summary; any missing
      * measure column, type mismatch, or unreadable artifact refuses
      * this candidate (the next — or the fact scan — answers). */
    private def tryRewrite(summary: Summary, groupAttrs: Seq[AttributeReference],
        aggExprs: Seq[NamedExpression], pred: Option[Expression],
        hint: Option[AggregateHint]): Option[Aggregate] = for {
      path <- resolveMvPath(summary)
      mvPlan <- mvPlanFor(path, summary.store.isDefined)
      mvAttrs = mvPlan.output.map(a => a.name -> a).toMap
      if groupAttrs.forall(a => mvAttrs.contains(a.name))
      if pred.forall(_.references.toSeq.forall(r => mvAttrs.contains(r.name)))
      cnt <- mvAttrs.get("cnt")
      if cnt.dataType == LongType
      // type-preservation contract: the substituted expression must
      // resolve to EXACTLY the original dataType, or parents would see
      // a corrupted schema (e.g. decimal Sum re-aggregation widens)
      newAggs <- sequence(aggExprs.map(e =>
        rewriteAgg(e, mvAttrs).filter(_.dataType == e.dataType)))
      newChild = pred match {
        case Some(p) => Filter(p.transform {
          case a: AttributeReference => mvAttrs(a.name)
        }, mvPlan)
        case None => mvPlan
      }
    } yield Aggregate(
      groupAttrs.map(a => mvAttrs(a.name)), newAggs, newChild, hint)

    private def sequence[T](xs: Seq[Option[T]]): Option[Seq[T]] =
      if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

    /** Rewrite one output expression of the aggregate, preserving its
      * name and exprId so the subtree drops into the parent plan.
      * Matching goes through the AggregateExpression's function field
      * (not positional patterns — Sum carries an evalMode in Spark 4). */
    private def rewriteAgg(e: NamedExpression, mv: Map[String, Attribute],
        dimOut: AttributeSet = AttributeSet.empty): Option[NamedExpression] =
      e match {
      // dim-side grouping attr passed through unchanged (join path)
      case a: AttributeReference if dimOut.contains(a) => Some(a)
      // fact grouping key passed through via the summary column
      case a: AttributeReference if mv.contains(a.name) =>
        Some(Alias(mv(a.name), a.name)(exprId = a.exprId))
      // constant output columns (CollapseProject folds literal
      // level/label columns into the aggregate list) are trivially
      // preserved — no references, nothing to derive
      case al @ Alias(c, _) if c.foldable && c.deterministic => Some(al)
      case Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        def agg(fn: AggregateFunction): Expression =
          AggregateExpression(fn, Complete, isDistinct = false)
        // MIN/MAX over DIM attrs are multiplicity-insensitive: a dim
        // row reaches a group iff >= 1 fact row (= its summary row,
        // cnt >= 1) matches, so the value SET per group is unchanged
        // by the fact collapse. count/sum/avg over dim attrs change
        // with row multiplicity and fall through to refusal.
        val dimSafe = ae.aggregateFunction match {
          case m: Min => m.child.references.nonEmpty &&
            m.child.references.subsetOf(dimOut)
          case m: Max => m.child.references.nonEmpty &&
            m.child.references.subsetOf(dimOut)
          case _ => false
        }
        if (dimSafe) return Some(e)
        ae.aggregateFunction match {
          case c: Count
              // COUNT(*) / COUNT(<non-null constant>) — a null-able or
              // column argument changes semantics and refuses rewrite
              if c.children.forall(ch => ch.foldable && ch.eval() != null) =>
            // COUNT(*) -> SUM(cnt); groups only exist where summary
            // rows exist, so the sum is never null — coalesce keeps
            // the original non-nullable contract explicit
            Some(Alias(
              Coalesce(Seq(agg(Sum(mv("cnt"))), Literal(0L))),
              name)(exprId = e.exprId))
          case s: Sum => s.child match {
            case a: AttributeReference if mv.contains(s"sum_${a.name}") =>
              Some(Alias(agg(Sum(mv(s"sum_${a.name}"))),
                name)(exprId = e.exprId))
            case _ => None
          }
          case m: Min => m.child match {
            case a: AttributeReference if mv.contains(s"min_${a.name}") =>
              Some(Alias(agg(Min(mv(s"min_${a.name}"))),
                name)(exprId = e.exprId))
            case _ => None
          }
          case m: Max => m.child match {
            case a: AttributeReference if mv.contains(s"max_${a.name}") =>
              Some(Alias(agg(Max(mv(s"max_${a.name}"))),
                name)(exprId = e.exprId))
            case _ => None
          }
          // AVG(x) = Σsum_x / Σcnt — derivable from the same two
          // partials the count/sum rewrites ride. Long measures only
          // (the guard below): the quotient is then DoubleType like
          // the original, and the exact-Long Σsum_x matches DuckDB's
          // exact integer-avg semantics (Spark's unrewritten Average
          // accumulates integral sums in double — bit-identical while
          // the total stays under 2^53, i.e. everywhere it is exact).
          case av: Average => av.child match {
            case a: AttributeReference
                if mv.contains(s"sum_${a.name}") &&
                  mv(s"sum_${a.name}").dataType == LongType =>
              Some(Alias(
                Divide(
                  Cast(agg(Sum(mv(s"sum_${a.name}"))), DoubleType),
                  Cast(agg(Sum(mv("cnt"))), DoubleType)),
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
