package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The range-join rewrite: a naive trailing-window theta join must
  * execute as a bucket equi-join (no nested loop), return exactly the
  * brute-force rows — including at bucket boundaries and negative
  * times — and leave non-matching join shapes untouched.
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    RangeJoin.install(s)
    s
  }

  import spark.implicits._

  private def executed(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private val W = 100L

  private def anchors = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L),
    (5L, -1L), (6L, -100L), (7L, -250L)).toDF("aid", "at")
  private def rangers = Seq((10L, 0L), (11L, 1L), (12L, 99L), (13L, 100L),
    (14L, 101L), (15L, 150L), (16L, 199L), (17L, 200L), (18L, -99L),
    (19L, -100L), (20L, -101L), (21L, -150L), (22L, -200L), (23L, -350L))
    .toDF("rid", "rt")

  private def brute(halfOpen: Boolean): Set[(Long, Long)] = {
    val as = anchors.collect().map(r => (r.getLong(0), r.getLong(1)))
    val rs = rangers.collect().map(r => (r.getLong(0), r.getLong(1)))
    (for {
      (aid, at) <- as
      (rid, rt) <- rs
      if rt <= at && (if (halfOpen) rt > at - W else rt >= at - W)
    } yield (aid, rid)).toSet
  }

  test("half-open trailing window: rewritten plan, brute-force-identical rows") {
    val j = anchors.join(rangers, $"rt" <= $"at" && $"rt" > $"at" - W)
    val plan = executed(j)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not plan as a nested loop:\n$plan")
    assert(plan.contains("__gr_bucket"), s"rewrite did not fire:\n$plan")
    val got = j.select($"aid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(halfOpen = true))
  }

  test("closed window (BETWEEN shape) rewrites and matches brute force") {
    val j = anchors.join(rangers, $"rt" <= $"at" && $"rt" >= $"at" - W)
    val plan = executed(j)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = j.select($"aid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(halfOpen = false))
  }

  test("symmetric band |a-r| <= W rewrites to the 3-bucket equi-join, brute-identical") {
    val j = anchors.join(rangers, abs($"at" - $"rt") <= W)
    val plan = executed(j)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"symmetric range join must not plan as a nested loop:\n$plan")
    assert(plan.contains("__gr_bucket"), s"symmetric rewrite did not fire:\n$plan")
    val got = j.select($"aid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val as = anchors.collect().map(r => (r.getLong(0), r.getLong(1)))
    val rs = rangers.collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = (for {
      (aid, at) <- as
      (rid, rt) <- rs
      if math.abs(at - rt) <= W
    } yield (aid, rid)).toSet
    assert(got == expect)
    // no bucket dup: every pair appears exactly once
    assert(j.select($"aid", $"rid").count() == expect.size)
  }

  test("each matching pair is produced exactly once (no bucket dup)") {
    val j = anchors.join(rangers, $"rt" <= $"at" && $"rt" > $"at" - W)
      .select($"aid", $"rid")
    val rows = j.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size, "bucket expansion duplicated a pair")
  }

  test("pre-existing equi keys survive alongside the bucket key") {
    val l = Seq((1L, 1L, 50L), (2L, 2L, 50L)).toDF("aid", "k", "at")
    val r = Seq((1L, 10L), (2L, 20L), (1L, 500L)).toDF("k", "rt")
    val j = l.join(r, l("k") === r("k") && $"rt" <= $"at" && $"rt" > $"at" - W)
    val plan = executed(j)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = j.select($"aid", $"rt").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("LEFT OUTER with the anchor preserved rewrites; null-extension multiplicity exact") {
    val j = anchors.join(rangers, $"rt" <= $"at" && $"rt" > $"at" - W, "left")
    val plan = executed(j)
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"left-outer window as NLJ:\n$plan")
    assert(plan.contains("__gr_bucket"), s"left-outer rewrite did not fire:\n$plan")
    val got = j.select($"aid", $"rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .groupBy(identity).view.mapValues(_.size).toMap
    val matched = brute(halfOpen = true)
    val as = anchors.collect().map(_.getLong(0))
    val expect: Map[(Long, Option[Long]), Int] =
      (matched.toSeq.map { case (a, r) => ((a, Some(r): Option[Long]), 1) } ++
        as.filterNot(a => matched.exists(_._1 == a))
          .map(a => ((a, None: Option[Long]), 1))).toMap
    assert(got == expect, s"left-outer rows diverge: $got")
  }

  test("symmetric LEFT OUTER anchors on whichever side is preserved") {
    // asAbs parses |at − rt| with at as x; the preserved side here holds
    // rt — the symmetric predicate lets the rule swap roles instead of
    // falling back to the nested loop
    val j = rangers.join(anchors, abs($"at" - $"rt") <= W, "left")
    val plan = executed(j)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"swapped symmetric left-outer as NLJ:\n$plan")
    assert(plan.contains("__gr_bucket"),
      s"swapped symmetric rewrite did not fire:\n$plan")
    val as = anchors.collect().map(r => (r.getLong(0), r.getLong(1)))
    val rs = rangers.collect().map(r => (r.getLong(0), r.getLong(1)))
    val matched = (for {
      (rid, rt) <- rs
      (aid, at) <- as
      if math.abs(at - rt) <= W
    } yield (rid, aid)).toSet
    val expect: Map[(Long, Option[Long]), Int] =
      (matched.toSeq.map { case (r, a) => ((r, Some(a): Option[Long]), 1) } ++
        rs.map(_._1).filterNot(r => matched.exists(_._1 == r))
          .map(r => ((r, None: Option[Long]), 1))).toMap
    val got = j.select($"rid", $"aid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expect, s"swapped left-outer rows diverge: $got")
  }

  test("LEFT OUTER with the anchor on the non-preserved side stays untouched") {
    // preserved (left) side would be EXPLODED — unsound, must not fire
    val j = rangers.join(anchors, $"rt" <= $"at" && $"rt" > $"at" - W, "left")
    val plan = executed(j)
    assert(!plan.contains("__gr_bucket"),
      s"unsound orientation rewritten:\n$plan")
  }

  test("joins without a recognizable window are left untouched") {
    // upper bound only — no width to bucket by: must stay a nested loop
    val j = anchors.join(rangers, $"rt" <= $"at")
    val plan = executed(j)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"upper-bound-only join must not be rewritten:\n$plan")
    assert(!plan.contains("__gr_bucket"), plan)
    // non-long bound types: out of scope, untouched
    val dl = Seq((1L, 1.0)).toDF("aid", "at")
    val dr = Seq((2L, 0.5)).toDF("rid", "rt")
    val dj = dl.join(dr, $"rt" <= $"at" && $"rt" > $"at" - lit(1.0))
    assert(executed(dj).contains("BroadcastNestedLoopJoin"))
  }

  test("the event-scale naive theta join matches the manual bucketed operator") {
    val dir = "/root/testdata/sf0.001"
    val Wus = 3600000000L
    val ev = graft.Tables.load(spark, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", unix_micros($"ts").as("pus"))
    val k = ev.filter($"event_type" === "click")
      .select(unix_micros($"ts").as("cus"))
    val naive = p.join(k, $"cus" <= $"pus" && $"cus" > $"pus" - Wus)
      .groupBy($"event_id").agg(count(lit(1)).as("n"))
    val plan = executed(naive)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = naive.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force on the driver
    val ps = p.collect().map(r => (r.getLong(0), r.getLong(1)))
    val ks = k.collect().map(_.getLong(0))
    val expected = ps.map { case (id, pus) =>
      id -> ks.count(c => c <= pus && c > pus - Wus).toLong
    }.filter(_._2 > 0).toMap
    assert(got == expected)
  }
}
