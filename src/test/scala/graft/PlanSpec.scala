package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RelationalOps, VectorOps}

/** Physical-plan quality gates: the properties that decide whether the
  * operators survive a 100× scale-up — pushdown reaching the parquet
  * scan, broadcast joins for small dims, whole-stage codegen coverage,
  * top-k avoiding a global sort.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02 scan pushes filters and prunes columns at the parquet reader") {
    val p = plan(RelationalOps.q02ScanFilter(spark, dir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("LessThan(l_quantity"), p)
    // pruned read schema: only the referenced columns reach the scan
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_extendedprice"), "column pruning failed:\n" + p)
  }

  test("q03 multi-way join broadcasts the small dims") {
    val p = plan(RelationalOps.q03JoinAgg(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01 aggregation uses partial (map-side) aggregation") {
    val p = plan(RelationalOps.q01Agg(spark, dir))
    assert(p.contains("HashAggregate"), p)
    // partial + final pair
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("ANN top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(VectorOps.q24AnnTopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("scan-heavy queries run inside WholeStageCodegen") {
    val df = RelationalOps.q01Agg(spark, dir)
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators
    assert(p.contains("*("), p)
  }
}
