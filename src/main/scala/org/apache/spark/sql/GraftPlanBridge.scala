package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Internal bridge: wrap an already-ANALYZED logical plan as a
  * DataFrame. Lives in the Spark namespace only to reach the
  * `private[sql]` `Dataset.ofRows`.
  *
  * Used by [[graft.plans.SummaryRewrite]]'s hybrid-union partializer to
  * build projections over a branch's EXISTING leaf relation (a
  * `newInstance()` of the very scan the optimized branch reads) instead
  * of re-resolving the fact through `spark.read`/`spark.table`: the
  * re-resolution route both drops the original scan's reader options
  * (basePath, mergeSchema, datetime rebase modes) and — for catalog
  * tables — re-enters the analyzer, whose output (SubqueryAlias,
  * unconverted DSv2 relations) is not legal inside an already-optimized
  * tree. Reusing the leaf is value-faithful by construction and
  * optimizer-legal by construction. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
