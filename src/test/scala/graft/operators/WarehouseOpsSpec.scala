package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.load

/** Warehouse-lifecycle laws (q213/q214/q217/q219/q220): SCD2
  * conservation + contiguity + run compression, profiler truth on a
  * pinned frame, golden-record tie resolution, dynamic-overwrite
  * isolation (the guard actually throws), and l-diversity mass
  * conservation.
  */
class WarehouseOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q213

  test("q213: intervals conserve events, tile time, and version densely") {
    val ev = load(spark, dir, "events")
    val out = WarehouseOps.scd2Intervals(ev, $"event_type")
    // conservation: every event lands in exactly one interval
    val updates = out.agg(sum($"n_updates")).head.getLong(0)
    assert(updates === ev.count())
    // contiguity + dense versions + exactly one current row per user
    out.collect().groupBy(_.getAs[Long]("user_id")).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq ===
        (1L to sorted.length.toLong), s"user $u: versions not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") ===
            b.getAs[Long]("valid_from_us"), s"user $u: interval gap")
          assert(a.getAs[String]("state") != b.getAs[String]("state"),
            s"user $u: uncompressed run (same state in adjacent versions)")
        case _ => ()
      }
      assert(sorted.count(_.getAs[Boolean]("is_current")) === 1,
        s"user $u: current-row count != 1")
      assert(sorted.last.getAs[Boolean]("is_current"))
    }
  }

  test("q213: consecutive identical states compress into one version") {
    val df = Seq(
      (1L, 10L, "2024-01-01 00:00:00", "a"),
      (1L, 11L, "2024-01-01 00:01:00", "a"),
      (1L, 12L, "2024-01-01 00:02:00", "b"),
      (1L, 13L, "2024-01-01 00:03:00", "a"))
      .toDF("user_id", "event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = WarehouseOps.scd2Intervals(df, $"event_type")
      .orderBy($"version").collect()
    assert(out.map(_.getAs[String]("state")).toSeq === Seq("a", "b", "a"))
    assert(out.map(_.getAs[Long]("n_updates")).toSeq === Seq(2L, 1L, 1L))
  }

  // ---------------------------------------------------------------- q214

  test("q214: profiler is exact on a pinned frame (incl. nulls)") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), None), (None, Some("x")))
      .toDF("k", "s")
    val out = WarehouseOps.profileTable(df).collect()
      .map(r => r.getAs[String]("column") ->
        ((r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct"),
          r.getAs[String]("min_str"), r.getAs[String]("max_str")))).toMap
    assert(out("k") === ((1L, 2L, "1", "2")))
    assert(out("s") === ((1L, 1L, "x", "x")))
  }

  test("q214 approx mode: the Expand disappears, nulls/min/max stay " +
    "exact, and cardinality error is within the HLL++ contract") {
    val orders = load(spark, dir, "orders")
    val exactPlan = WarehouseOps.profileTable(orders)
      .queryExecution.executedPlan.toString
    val approxDf = WarehouseOps.profileTable(orders, approx = true)
    val approxPlan = approxDf.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact profile should pay the Expand (the law's premise)")
    assert(!approxPlan.contains("Expand"),
      s"approx profile must not plan an Expand:\n$approxPlan")
    val exact = WarehouseOps.profileTable(orders).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val approx = approxDf.collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(exact.keySet === approx.keySet)
    exact.keySet.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      // everything except n_distinct is computed identically
      assert(a.getAs[Long]("n_nulls") === e.getAs[Long]("n_nulls"), c)
      assert(a.getAs[String]("min_str") === e.getAs[String]("min_str"), c)
      assert(a.getAs[String]("max_str") === e.getAs[String]("max_str"), c)
      // HLL++ default rsd = 0.05; allow 5 sigma on this corpus
      val (en, an) = (e.getAs[Long]("n_distinct"), a.getAs[Long]("n_distinct"))
      assert(math.abs(an - en) <= math.max(1L, (0.25 * en).toLong),
        s"$c: approx $an vs exact $en out of bound")
    }
  }

  // ---------------------------------------------------------------- q217

  test("q217: planted 1-1 metadata ties resolve by value order, and " +
    "every planted cluster is released") {
    val out = WarehouseOps.q217GoldenRecord(spark, dir).collect()
    val docs = load(spark, dir, "documents")
    val planted = docs.filter($"doc_id" % 3 === 0L).count()
    // every planted pair forms a >= 2 cluster; reps are the ORIGINAL ids
    assert(out.length.toLong >= planted)
    val byRep = out.map(r => r.getAs[Long]("rep_doc_id") -> r).toMap
    // pure original+twin pairs (clusters a natural dup joined are
    // checked only for membership): the 1-1 vote must resolve to the
    // value-order min on BOTH fields
    var checked = 0
    docs.filter($"doc_id" % 3 === 0L)
      .select($"doc_id", $"lang", $"source").collect().foreach { d =>
        byRep.get(d.getLong(0))
          .filter(_.getAs[Long]("n_members") === 2L).foreach { g =>
            checked += 1
            assert(g.getAs[String]("lang_golden") ===
              Seq(d.getString(1), "xx").min)
            assert(g.getAs[String]("source_golden") ===
              Seq(d.getString(2), "mirror").min)
          }
      }
    assert(checked > 0, "no pure planted pair found — planting vacuous")
  }

  // ---------------------------------------------------------------- q219

  test("q219: the untouched-partition guard throws on an out-of-scope write") {
    val tmp = graft.TempDirs.create("wh-ovr").toString
    val table = s"$tmp/t"
    val ev = load(spark, dir, "events")
      .withColumn("event_date", date_format($"ts", "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(table)
    val days = ev.select($"event_date").distinct()
      .orderBy($"event_date").collect().map(_.getString(0))
    assume(days.length >= 2)
    // corrected frame SPILLS INTO a second day the caller did not name:
    // dynamic overwrite rewrites that partition too -> guard must throw
    val spill = ev.filter($"event_date".isin(days(0), days(1)))
    val e = intercept[IllegalStateException] {
      WarehouseOps.overwritePartition(spark, table, spill,
        "event_date", days(0))
    }
    assert(e.getMessage.contains(s"event_date=${days(1)}"))
  }

  test("q219: a scoped overwrite leaves other partitions' files untouched") {
    val tmp = graft.TempDirs.create("wh-ovr2").toString
    val table = s"$tmp/t"
    val ev = load(spark, dir, "events")
      .withColumn("event_date", date_format($"ts", "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(table)
    val day = ev.agg(min($"event_date")).head.getString(0)
    val corrected = ev.filter($"event_date" === day)
      .filter($"event_id" % 3 =!= 0L)
    val out = WarehouseOps.overwritePartition(
      spark, table, corrected, "event_date", day)
    val got = out.filter($"event_date".cast("string") === day).count()
    assert(got === corrected.count())
    val others = out.filter($"event_date".cast("string") =!= day).count()
    assert(others === ev.filter($"event_date" =!= day).count())
  }

  // ---------------------------------------------------------------- q220

  test("q220: mass conserves and no released cell is below l") {
    val docs = load(spark, dir, "documents")
    val out = WarehouseOps.lDiversityRelease(docs, l = 3L)
    assert(out.agg(sum($"n_docs")).head.getLong(0) === docs.count())
    out.filter($"len_bucket" =!= "__suppressed__").collect().foreach { r =>
      assert(r.getAs[Long]("n_langs") >= 3L,
        s"${r.getAs[String]("source")}/${r.getAs[String]("len_bucket")}: " +
          "homogeneous cell released")
    }
    // the residual rows carry only under-l cells
    out.filter($"len_bucket" === "__suppressed__").collect().foreach { r =>
      assert(r.getAs[Long]("n_langs") < 3L)
    }
  }

  // ---------------------------------------------------------------- q287

  test("q287: cdcDiff is an exact MULTISET diff — duplicated rows " +
      "reconcile, and applying the diff to the old version yields the " +
      "new one") {
    val v0 = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("c", 3L))
      .toDF("k", "v")
    val v1 = Seq(("a", 1L), ("a", 1L), ("a", 1L), ("c", 3L), ("d", 4L))
      .toDF("k", "v")
    val (ins, del) = WarehouseOps.cdcDiff(v0, v1)
    // ("a",1) went 2 -> 3: exactly ONE insert; ("b",2) left: one delete
    assert(ins.collect().map(_.toSeq).toSeq.sortBy(_.toString) ===
      Seq(Seq("a", 1L), Seq("d", 4L)).sortBy(_.toString),
      "multiset inserts must count copies, not values")
    assert(del.collect().map(_.toSeq).toSeq === Seq(Seq("b", 2L)))
    // reconciliation: v0 + ins - del == v1 as a multiset
    val recon = v0.unionByName(ins).exceptAll(del)
      .groupBy($"k", $"v").count()
    val want = v1.groupBy($"k", $"v").count()
    assert(recon.collect().map(_.toSeq).toSet ===
      want.collect().map(_.toSeq).toSet,
      "old + inserts - deletes must reconstruct the new version exactly")
    // identical versions diff to empty both ways
    val (i2, d2) = WarehouseOps.cdcDiff(v1, v1)
    assert(i2.isEmpty && d2.isEmpty)
  }
}
