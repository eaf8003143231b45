package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{lit, to_timestamp}
import org.scalatest.funsuite.AnyFunSuite

/** Fourth analytics batch (q105-q108): path-order determinism, the
  * planted-spike anomaly law, novelty attribution on verbatim copies,
  * and hand-computed PageRank fixpoints.
  */
class InsightOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // --------------------------------------------------------------- q105

  test("q105: paths follow event time with event_id tie-break, truncated to prefix") {
    val events = Seq(
      // user 1: b at 00:01, then ts-tie at 00:02 broken by event_id (a=5 < c=9), d beyond prefix
      (1L, 5L, "a", ts("2024-01-01 00:02:00")),
      (1L, 9L, "c", ts("2024-01-01 00:02:00")),
      (1L, 2L, "b", ts("2024-01-01 00:01:00")),
      (1L, 11L, "d", ts("2024-01-01 00:09:00")),
      // user 2: shorter history than the prefix
      (2L, 3L, "x", ts("2024-01-01 01:00:00")),
      (2L, 4L, "y", ts("2024-01-01 02:00:00")),
      // user 3: same path as user 1
      (3L, 1L, "b", ts("2024-02-01 00:00:00")),
      (3L, 2L, "a", ts("2024-02-02 00:00:00")),
      (3L, 3L, "c", ts("2024-02-03 00:00:00")),
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = InsightOps.sessionPaths(events, prefixLen = 3, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("b>a>c", 2L), ("x>y", 1L)))
  }

  // --------------------------------------------------------------- q106

  test("q106: a planted hourly spike is flagged; uniform traffic is not") {
    // type "spiky": nine quiet hours of 2 events + one hour of 40; type
    // "flat": ten hours of 2 events each. NOTE a sample of n hours can
    // never exceed z² = n-1, so a 2σ test needs n > 5 to be able to fire
    // at all — the quiet-hour count here is part of the law.
    val rows = (for {
      h <- 0 until 10
      t <- Seq("spiky", "flat")
      n = if (t == "spiky" && h == 9) 40 else 2
      i <- 0 until n
    } yield (t, ts(f"2024-03-01 0$h%d:${i % 60}%02d:00"))).toSeq
    val events = rows.toDF("event_type", "ts")
    val got = InsightOps.hourlyAnomaly(events, k = 2)
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("spiky", "2024-03-01 09:00:00", 40L)))
  }

  test("q106: the decimal-widened z-test flags exactly the same hours") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val long = InsightOps.hourlyAnomaly(events, k = 2)
      .orderBy("event_type", "hour").collect().toSeq
    val dec = InsightOps.hourlyAnomaly(events, k = 2, widen = true)
      .orderBy("event_type", "hour").collect().toSeq
    assert(long.nonEmpty && long === dec)
  }

  // --------------------------------------------------------------- q107

  test("q107: verbatim copies have zero novelty; the first occurrence owns it") {
    val docs = Seq(
      (0L, "a b c d e"),          // 3 shingles, all first-seen here
      (1L, "a b c d e"),          // exact copy -> 0 novel
      (2L, "a b c x y z"),        // shares "a b c" only -> 3 of 4 novel
    ).toDF("doc_id", "text")
    val got = InsightOps.shingleNovelty(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 3L, 3L, 1000000L),
      (1L, 3L, 0L, 0L),
      (2L, 4L, 3L, 750000L)))
  }

  test("q107 incremental: batch novelty against the stored index == full rebuild") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val old = docs.filter($"doc_id" < 300)
    val batch = docs.filter($"doc_id" >= 300)
    val full = InsightOps.shingleNovelty(docs)
      .filter($"doc_id" >= 300)
      .orderBy($"doc_id").collect().toSeq
    val inc = InsightOps.incrementalNovelty(batch, InsightOps.noveltyIndex(old))
      .orderBy($"doc_id").collect().toSeq
    assert(inc === full)
    // artifact maintenance: merged index == index built from everything
    val merged = InsightOps.updatedNoveltyIndex(InsightOps.noveltyIndex(old), batch)
      .orderBy($"g").collect().toSeq
    val rebuilt = InsightOps.noveltyIndex(docs).orderBy($"g").collect().toSeq
    assert(merged === rebuilt)
  }

  // --------------------------------------------------------------- q108

  test("q108: hand-computed integer ranks on a 3-node star") {
    // a->b, a->c, b->a, c->a (unit weights): out(a)=2, out(b)=out(c)=1
    val ed = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("u", "v", "n")
    // r1(b)=r1(c)=150000+850000*1000000//2000000 = 575000
    // r1(a)=150000+2*850000 = 1850000
    // r2(b)=r2(c)=150000+(850000*1850000)//2000000 = 936250
    // r2(a)=150000+2*((850000*575000)//1000000) = 1127500
    val got = InsightOps.pagerank(ed, iters = 2)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 1127500L, "b" -> 936250L, "c" -> 936250L))
  }

  test("q108: a symmetric 2-cycle is a fixpoint at 1000000") {
    val ed = Seq(("a", "b", 3L), ("b", "a", 3L)).toDF("u", "v", "n")
    val got = InsightOps.pagerank(ed, iters = 2)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("q108: 50-iteration plan depth stays flat (per-round checkpoint)") {
    val ed = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("u", "v", "n")
    // pre-fix, round i's plan nested all i-1 previous rounds — by iter
    // ~15 analysis alone dominated; with the per-round localCheckpoint
    // the 50th plan hangs off a materialized RDD and stays shallow
    val ranks = InsightOps.pagerank(ed, iters = 50)
    val depth = ranks.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(depth <= 10, s"plan has $depth nodes — lineage not truncated")
    assert(ranks.count() == 3)
  }

  test("q108: converge-or-throw reaches the 2-cycle fixpoint and matches the fixed-round form") {
    val ed = Seq(("a", "b", 3L), ("b", "a", 3L)).toDF("u", "v", "n")
    val got = InsightOps.pagerankConverged(ed, maxIters = 10)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 1000000L, "b" -> 1000000L))
    // an impossible cap trips the refusal, not a silent partial answer
    val star = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("u", "v", "n")
    intercept[IllegalStateException] {
      InsightOps.pagerankConverged(star, maxIters = 1)
    }
  }

  test("q108: decimal-widened ranks equal the Long path in range") {
    val ed = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("u", "v", "n")
    val narrow = InsightOps.pagerank(ed, iters = 3)
      .as[(String, Long)].collect().toMap
    val widened = InsightOps.pagerank(ed, iters = 3, widen = true)
      .selectExpr("node", "cast(rank_scaled as bigint)")
      .as[(String, Long)].collect().toMap
    assert(narrow === widened)
  }

  // --------------------------------------------------------------- q109

  test("q109: pair support counts baskets once, repeats collapse") {
    val events = Seq(
      // basket (1, day1): a,b,b -> one (a,b)
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 11:00:00")),
      (1L, "b", ts("2024-01-01 12:00:00")),
      // basket (1, day2): a only -> no pair
      (1L, "a", ts("2024-01-02 10:00:00")),
      // basket (2, day1): a,b,c -> (a,b), (a,c), (b,c)
      (2L, "a", ts("2024-01-01 09:00:00")),
      (2L, "b", ts("2024-01-01 09:30:00")),
      (2L, "c", ts("2024-01-01 09:45:00")),
    ).toDF("user_id", "event_type", "ts")
    val got = InsightOps.itemsetPairs(events)
      .as[(String, String, Long, Long)].collect().toSet
    // 3 baskets total
    assert(got === Set(
      ("a", "b", 2L, 666666L),
      ("a", "c", 1L, 333333L),
      ("b", "c", 1L, 333333L)))
  }

  test("q109: decimal-widened support ppm equals the Long path in range") {
    val events = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 11:00:00")),
      (2L, "a", ts("2024-01-01 09:00:00")),
      (2L, "b", ts("2024-01-01 09:30:00")),
      (2L, "c", ts("2024-01-01 09:45:00")),
    ).toDF("user_id", "event_type", "ts")
    val narrow = InsightOps.itemsetPairs(events)
      .as[(String, String, Long, Long)].collect().toSet
    val widened = InsightOps.itemsetPairs(events, widen = true)
      .selectExpr("item_a", "item_b", "support", "cast(support_ppm as bigint)")
      .as[(String, String, Long, Long)].collect().toSet
    assert(narrow === widened)
  }

  // --------------------------------------------------------------- q110

  test("q110: streaks split exactly at calendar gaps") {
    val events = Seq(
      // user 1: Jan 1,2,3 then 5,6 -> longest 3, 2 runs
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")), (1L, ts("2024-01-05 10:00:00")),
      (1L, ts("2024-01-06 23:59:59")),
      // user 2: one day, twice -> streak 1, 1 run
      (2L, ts("2024-02-10 08:00:00")), (2L, ts("2024-02-10 09:00:00")),
    ).toDF("user_id", "ts")
    val got = InsightOps.activityStreaks(events)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set(
      (1L, 3L, 2L, "2024-01-01"),
      (2L, 1L, 1L, "2024-02-10")))
  }
  // ---------------------------------------------------------------- q197

  test("q197: planted triangle found once per member; sub-threshold and " +
    "flash-crowd edges refused (hot bucket accounted)") {
    // buckets are (type, hour); users 1,2,3 share 3 buckets (edge weight
    // 3 = threshold) -> one triangle. Users 1,4 share only 2 buckets
    // (below threshold). Hour 6 is a flash crowd of 20 users: occupancy
    // profile is twenty 1s, two 2s, three 3s, one 20 -> n=26, p90
    // position (9*26+9)/10 = 24 -> cap 3 -> the crowd bucket is refused.
    val rows =
      (for (h <- 1L to 3L; u <- Seq(1L, 2L, 3L)) yield (u, h)) ++
      (for (h <- 4L to 5L; u <- Seq(1L, 4L)) yield (u, h)) ++
      (for (u <- 10L to 29L) yield (u, 6L)) ++
      (for (u <- 50L to 69L) yield (u, 100L + u))
    val ev = rows.toDF("user_id", "h")
      .select($"user_id", lit("x").as("event_type"),
        to_timestamp($"h" * 3600).as("ts"))
    val got = InsightOps.triangleCounts(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq === Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }

  // ---------------------------------------------------------------- q205

  test("q205: two planted cliques each converge to their min-id label") {
    // clique {1,2,3} co-present in 3 'x' buckets; clique {10,11,12} in
    // 3 'y' buckets — disconnected, so propagation must NOT mix them
    val rows =
      (for (h <- 1L to 3L; u <- Seq(1L, 2L, 3L)) yield (u, "x", h)) ++
      (for (h <- 1L to 3L; u <- Seq(10L, 11L, 12L)) yield (u, "y", h))
    val ev = rows.toDF("user_id", "event_type", "h")
      .select($"user_id", $"event_type", to_timestamp($"h" * 3600).as("ts"))
    val got = InsightOps.labelPropagation(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("q205: every edge-bearing vertex labeled exactly once, label is a vertex") {
    val out = InsightOps.q205LabelProp(spark, "/root/testdata/sf0.001").collect()
    val users = out.map(_.getLong(0))
    assert(users.length === users.distinct.length)
    assert(out.nonEmpty)
    val userSet = users.toSet
    out.foreach(r => assert(userSet.contains(r.getLong(1)),
      s"label ${r.getLong(1)} is not a labeled vertex"))
  }

  // ---------------------------------------------------------------- q207

  test("q207: LPA labels refine exact components (never merge across)") {
    val comp = InsightOps.q207Components(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lpa = InsightOps.q205LabelProp(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.keySet === lpa.keySet)
    // same LPA label ⇒ same component, and component id ≤ any LPA label
    lpa.groupBy(_._2).values.foreach { members =>
      val comps = members.keys.map(comp).toSet
      assert(comps.size === 1, s"LPA label spans components $comps")
    }
    comp.foreach { case (u, c) => assert(c <= lpa(u) && c <= u) }
  }

  test("q211: planted 4-clique survives 3-core peeling, pendant chain peels away") {
    import spark.implicits._
    // 4-clique on 1-4 (every degree 3) + chain 4-10-11-12 (degrees < 3)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 10L), (10L, 11L), (11L, 12L)).toDF("u", "v")
    val core = InsightOps.kCore(edges, k = 3L, maxRounds = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("core_deg")).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("q211: long chains need DEEP peeling — the round cap refuses below depth") {
    import spark.implicits._
    // a path peels one endpoint pair per round: depth ~ n/2
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("u", "v")
    // k=2 on a path: fully peels (no cycle) — needs ~6 rounds, fits 16
    val core = InsightOps.kCore(path, k = 2L, maxRounds = 16).collect()
    assert(core.isEmpty)
    // but an insufficient cap must throw, not return a half-peeled graph
    intercept[IllegalStateException] {
      InsightOps.kCore(path, k = 2L, maxRounds = 2)
    }
  }

  test("q211: every core member's in-core degree is >= k on real data") {
    val out = InsightOps.q211KCore(spark, "/root/testdata/sf0.001").collect()
    out.foreach(r => assert(r.getAs[Long]("core_deg") >= 3L))
  }

  test("q211: the driver-local peel equals the distributed loop row-for-row") {
    import spark.implicits._
    // clique + chain + a 5-cycle (cycle survives k=2, peels at k=3)
    val edges = (Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 10L), (10L, 11L), (11L, 12L)) ++
      (20L until 24L).map(i => (i, i + 1)) :+ (20L, 24L)).toDF("u", "v")
    for (k <- Seq(2L, 3L)) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val local = InsightOps.kCoreLocal(spark, es, k, 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // force the distributed loop by pinning the local cutoff to 0
      val dist = InsightOps.kCore(edges, k, maxRounds = 16, maxLocalEdges = 0L)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("core_deg"))).toSet
      assert(local === dist, s"hybrid paths diverge at k=$k")
    }
  }

  test("q235: every walk takes real edges, has full length, and is deterministic") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("u", "v")
    val sym = edges.collect().flatMap(r =>
      Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    val out = InsightOps.randomWalks(edges, steps = 4).collect()
    assert(out.length === 4) // one walk per node
    out.foreach { r =>
      val hops = r.getAs[String]("path").split(">").map(_.toLong)
      assert(hops.length === 5)
      assert(hops.head === r.getAs[Long]("walker"))
      assert(hops.last === r.getAs[Long]("end_node"))
      hops.sliding(2).foreach { case Array(a, b) =>
        assert(sym.contains((a, b)), s"phantom edge $a>$b")
      }
    }
    val again = InsightOps.randomWalks(edges, steps = 4).collect()
      .map(r => r.getAs[Long]("walker") -> r.getAs[String]("path")).toMap
    out.foreach(r =>
      assert(again(r.getAs[Long]("walker")) === r.getAs[String]("path")))
  }

  test("q236: a planted spike exceeds twice its hour-of-day median, steady hours don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 7 days, hod 0: one event per day except day 4 which gets 5
    val rows = (0 until 7).flatMap { d =>
      val n = if (d == 4) 5 else 1
      (1 to n).map(i => ("x", d * 86400L + i))
    }
    val ev = rows.toDF("event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = InsightOps.seasonalResidual(ev).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_cells") === 7L)
    assert(out.head.getAs[Long]("n_flagged") === 1L) // 5 > 2*1
    assert(out.head.getAs[Long]("max_exceed") === 3L)
  }

  test("q238: new users sum to the distinct-user total; the curve is monotone") {
    val out = InsightOps.q238CumulativeUsers(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getAs[String]("day"))
    val total = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("new_users")).sum === total)
    assert(out.last.getAs[Long]("cum_users") === total)
    assert(out.map(_.getAs[Long]("cum_users")).toSeq ===
      out.map(_.getAs[Long]("new_users")).scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("q235: a hub's walk space truncates to the maxDeg smallest neighbor ids") {
    import spark.implicits._
    val edges = (1L to 10L).map((0L, _)).toDF("u", "v")
    val out = InsightOps.randomWalks(edges, steps = 4, maxDeg = 4).collect()
    out.foreach { r =>
      val hops = r.getAs[String]("path").split(">").map(_.toLong)
      hops.sliding(2).foreach { case Array(a, b) =>
        if (a == 0L) assert(b >= 1L && b <= 4L,
          s"hub stepped outside its truncated list: $a>$b")
        else assert(b === 0L) // leaves' only neighbor is the hub
      }
    }
  }

  test("q241: a star graph is perfectly disassortative (r = -1 exactly)") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val r = InsightOps.assortativity(star).collect().head
    // M=6, sx=12, sxy=18, sxx=30 -> num=-36, den=36 -> r = -1
    assert(r.getAs[Long]("m") === 3L)
    assert(r.getAs[Long]("assort_num") === -36L)
    assert(r.getAs[Long]("assort_den") === 36L)
  }

  test("q242: two equal cliques under the perfect partition score Q = 1/2") {
    import spark.implicits._
    val cliques = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("u", "v")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 2L), (5L, 2L), (6L, 2L)).toDF("node", "label")
    val r = InsightOps.modularityOf(cliques, lab).collect().head
    // per clique: 4m*e_c - d_c^2 = 72 - 36 = 36; q = 72/144 = 1/2
    assert(r.getAs[Long]("n_communities") === 2L)
    assert(r.getAs[Long]("q_num") === 72L)
    assert(r.getAs[Long]("q_den") === 144L)
    // the everything-in-one-community partition scores exactly 0
    val one = lab.select($"node", lit(0L).as("label"))
    val r0 = InsightOps.modularityOf(cliques, one).collect().head
    assert(r0.getAs[Long]("q_num") === 0L)
  }

  test("q222: the prefix-sum identity reproduces hand-run CUSUM on a pinned drift") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hourly counts [3,3,3,3,10,10,10]: ref (median) = 3, slack 1 ->
    // d = [-1,-1,-1,-1,6,6,6], P = [-1,-2,-3,-4,2,8,14],
    // S = P - min(0, runmin P) = [0,0,0,0,6,12,18] -> max 18, one hour >= 16
    val counts = Seq(3, 3, 3, 3, 10, 10, 10)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map(i => ("x", 400000L * 3600L + h * 3600L + i))
    }
    val ev = rows.toDF("event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = InsightOps.cusumHourly(ev, slack = 1L, theta = 16L).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("ref") === 3L)
    assert(r.getAs[Long]("max_s") === 18L)
    assert(r.getAs[Long]("n_flagged") === 1L)
    assert(r.getAs[Long]("first_flag_hour") === 400006L)
  }

  test("q259: Theil-Sen shrugs off the spiked day and floors negative " +
    "slopes exactly") {
    // type a: days 0..3, counts 10,12,14,1000 — five of six pairwise
    // slopes are 2 or huge; the MEDIAN stays 2000 permille (OLS would
    // be dragged to ~+300/day by the spike)
    // type b: day 0 count 10, day 3 count 3 — dy=-7 over dx=3:
    // floor(-7000/3) = -2334 (truncation would give -2333; the
    // positive-offset trick pins FLOOR on both engines)
    def rows(t: String, dcs: Seq[(Long, Long)]) = dcs.flatMap {
      case (d, c) => (0L until c).map(k =>
        (t, d * 86400L + k)) // k < 86400 keeps events inside day d
    }
    val ev = (rows("a", Seq((0L, 10L), (1L, 12L), (2L, 14L), (3L, 1000L))) ++
      rows("b", Seq((0L, 10L), (3L, 3L))))
      .toDF("event_type", "s")
      .select($"event_type", to_timestamp($"s").as("ts"))
    val out = InsightOps.theilSenDaily(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("slope_permille")))).toMap
    assert(out("a") === ((4L, 6L, 2000L)))
    assert(out("b") === ((2L, 1L, -2334L)))
  }

  test("q259: a single-day type yields n_pairs 0 / NULL slope (no ANSI " +
    "crash), and a decline steeper than -1000/day floors exactly") {
    def rows(t: String, dcs: Seq[(Long, Long)]) = dcs.flatMap {
      case (d, c) => (0L until c).map(k => (t, d * 86400L + k))
    }
    // c: ONE observed day — the unguarded fan-out would evaluate
    // sequence(1, 0) (descending) and pts[1] out of bounds
    // d: dy=-5000 over dx=1 — slope -5,000,000 permille, far below
    // the old positive-offset trick's silent -10^6 domain bound;
    // dy=-5000 over dx=3: floor(-5000000/3) = -1666667 (truncation
    // would give -1666666)
    val ev = (rows("c", Seq((5L, 7L))) ++
      rows("d", Seq((0L, 5003L), (1L, 3L), (3L, 3L))))
      .toDF("event_type", "s")
      .select($"event_type", to_timestamp($"s").as("ts"))
    val out = InsightOps.theilSenDaily(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
          if (r.isNullAt(r.fieldIndex("slope_permille"))) None
          else Some(r.getAs[Long]("slope_permille"))))).toMap
    assert(out("c") === ((1L, 0L, None)))
    // d's three pairwise slopes: (0,1): -5000000; (0,3):
    // floor(-5000000/3) = -1666667; (1,3): 0 — median (rank 2) is
    // -1666667, which only a TRUE floor produces
    assert(out("d") === ((3L, 3L, Some(-1666667L))))
  }
}
