package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.load

/** Second curation batch (q81-q87): interval-join semantics vs the
  * brute-force theta join, bigram/chunk conservation laws, and
  * determinism of the hash-threshold sampler.
  */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q81

  test("q81: bucketed interval count matches the brute-force theta join") {
    val ev = load(spark, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", unix_micros($"ts").as("pus"), $"user_id")
    val k = ev.filter($"event_type" === "click")
      .select($"user_id".as("cuser"), unix_micros($"ts").as("cus"))
    val W = 3600000000L
    val brute = p.join(k,
        $"user_id" === $"cuser" && $"cus" <= $"pus" && $"cus" > $"pus" - W,
        "left")
      .groupBy($"event_id").agg(count($"cus").as("n_clicks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = CurationOps.q81IntervalJoin(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == brute)
    assert(bucketed.nonEmpty)
  }

  test("q81: window boundary semantics are (t-W, t] exactly") {
    val left = Seq((1L, 10000L)).toDF("id", "lt")
    val right = Seq(
      10000L, // == lt: counted
      9001L,  // just inside
      9000L,  // == lt-W: excluded (open lower bound)
      10001L, // after lt: excluded
      1L      // far before: excluded
    ).toDF("rt").withColumn("rid", lit(1L))
    val out = CurationOps.intervalCount(
      left, "id", "lt", right, "rid", "rt", 1000L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_matches") == 2L)
  }

  test("q81: a match spanning a bucket boundary is found exactly once") {
    // left at t=1000 (bucket 1), right at t=999 (bucket 0, expands to 0,1)
    val left = Seq((1L, 1000L)).toDF("id", "lt")
    val right = Seq((1L, 999L)).toDF("rid", "rt")
    val out = CurationOps.intervalCount(
      left, "id", "lt", right, "rid", "rt", 1000L).collect()
    assert(out.head.getAs[Long]("n_matches") == 1L)
  }

  test("q81: plan is an equi-join, not a nested-loop join") {
    val plan = CurationOps.q81IntervalJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  // ---------------------------------------------------------------- q82

  test("q82: bigram mass conservation and exact lift for a known pair") {
    val docs = load(spark, dir, "documents")
    val expected = docs
      .select((size(split($"text", " ")) - 1).cast("long").as("nb"))
      .agg(sum(when($"nb" > 0, $"nb"))).collect().head.getLong(0)
    // recompute the marginals independently from raw bigram rows
    val bg = docs.select(split($"text", " ").as("ts"))
      .filter(size($"ts") >= 2)
      .select(posexplode($"ts").as(Seq("i", "a")), $"ts")
      .filter($"i" < size($"ts") - 1)
      .select($"a", expr("ts[i+1]").as("b"))
    assert(bg.count() == expected)
    val top = CurationOps.q82BigramLift(spark, dir).collect()
    assert(top.length <= 20 && top.nonEmpty)
    val first = top.minBy(_.getAs[Long]("rk"))
    val (a, b) = (first.getAs[String]("a"), first.getAs[String]("b"))
    val n = bg.count()
    val cab = bg.filter($"a" === a && $"b" === b).count()
    val ca = bg.filter($"a" === a).count()
    val cb = bg.filter($"b" === b).count()
    assert(first.getAs[Long]("lift_ppm") == (cab * n * 1000000L) / (ca * cb))
    // ranks are 1..k with no gaps
    assert(top.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to top.length).toSeq)
  }

  // ---------------------------------------------------------------- q83

  test("q83: BOW fingerprints collapse at least as much as exact hashes") {
    val rows = CurationOps.q83BowFingerprint(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, exact, bow) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_bow"))
      assert(bow <= exact, s"bow $bow > exact $exact")
      assert(exact <= docs)
      assert(bow >= 1)
    }
  }

  // ---------------------------------------------------------------- q84

  test("q84: score is the exact integer mean of floor-log2 token counts") {
    val docs = load(spark, dir, "documents")
    val tokens = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val cnt = tokens.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    def l2(c: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(c)
    val expected = tokens.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.map(t => l2(cnt(t._2))).sum * 1000000L / xs.length)
    }
    val got = CurationOps.q84Log2Quality(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_ppm")).toMap
    assert(got == expected)
  }

  // ---------------------------------------------------------------- q85

  test("q85: top-1 score matches a driver-side recompute of the formula") {
    val docs = load(spark, dir, "documents")
    val terms = Set("spark", "vector", "window")
    val all = docs.select($"doc_id", split($"text", " ").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = all.length.toLong
    val sumdl = all.map(_._2.length.toLong).sum
    val df = terms.map(t => t -> all.count(_._2.contains(t)).toLong).toMap
    def score(ts: Seq[String]): Long = {
      val dl = ts.length.toLong
      terms.toSeq.map { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0) 0L
        else {
          val idf = (n - df(t)) * 1000L / df(t)
          22L * idf * tf * sumdl * 1000L /
            (10L * tf * sumdl + 3L * sumdl + 9L * dl * n)
        }
      }.sum
    }
    val expectedTop = all.map { case (id, ts) => (id, score(ts)) }
      .filter(_._2 > 0)
      .sortBy { case (id, sc) => (-sc, id) }.head
    val got = CurationOps.q85Bm25(spark, dir).collect()
      .minBy(_.getAs[Long]("rk"))
    assert((got.getAs[Long]("doc_id"), got.getAs[Long]("score")) == expectedTop)
  }

  // ---------------------------------------------------------------- q86

  test("q86: sampler is deterministic, bounded, and keeps a real subset") {
    val a = CurationOps.q86MixtureSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val b = CurationOps.q86MixtureSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(a.toSeq == b.toSeq)
    a.foreach { case (_, nIn, nKept, tok) =>
      assert(nKept <= nIn)
      assert(tok >= 0)
    }
    val (kept, tot) = (a.map(_._3).sum.toDouble, a.map(_._2).sum.toDouble)
    // mixed p=.5/p=.25 tiers: global keep rate must land well inside (0, 1)
    assert(kept / tot > 0.1 && kept / tot < 0.7, s"keep rate ${kept / tot}")
  }

  // ---------------------------------------------------------------- q87

  test("q87: chunking conserves tokens and bounds chunk counts") {
    val docs = load(spark, dir, "documents")
    val nTok = docs.select(sum(size(split($"text", " ")))).collect().head.getLong(0)
    val rows = CurationOps.q87CdcChunk(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == nTok)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chunks") >= 1)
      assert(r.getAs[Long]("n_distinct_chunks") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("max_chunk_tokens") >= 1)
      // mean_chunk_ppm = n_tokens*1e6 div n_chunks, exactly
      assert(r.getAs[Long]("mean_chunk_ppm") ==
        r.getAs[Long]("n_tokens") * 1000000L / r.getAs[Long]("n_chunks"))
    }
  }

  // ---------------------------------------------------------------- q88

  test("q88: CMS prefilter returns exactly the sketch-free heavy hitters") {
    val tok = load(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("w"))
    val total = tok.count()
    val exact = tok.groupBy($"w").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= total / 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = CurationOps.q88CmsHeavyHitters(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(got.nonEmpty)
  }

  // ---------------------------------------------------------------- q89

  test("q89: per-group sample is k rows per source, hash-deterministic, native plan") {
    val df = CurationOps.q89GroupSample(spark, dir)
    val plan = { df.collect(); df.queryExecution.executedPlan.toString }
    assert(plan.contains("TopKPerKey"), s"native top-k did not fire:\n$plan")
    val rows = df.collect()
    val bySrc = rows.groupBy(_.getString(0))
    val nSources = load(spark, dir, "documents")
      .select($"source").distinct().count()
    assert(bySrc.size == nSources)
    bySrc.values.foreach(g => assert(g.length == 3))
    // deterministic: a second run picks the identical docs
    val again = CurationOps.q89GroupSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(again.toSeq == rows.map(r => (r.getString(0), r.getLong(1))).sorted.toSeq)
  }

  // ---------------------------------------------------------------- q90

  test("q90: streaming interval join matches the batch inner-join twin") {
    val ev = load(spark, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"ts".as("pts"), $"user_id")
    val k = ev.filter($"event_type" === "click")
      .select($"user_id".as("cuser"), $"ts".as("cts"))
    val batch = p.join(k,
        $"user_id" === $"cuser" && $"cts" <= $"pts" &&
          $"cts" > $"pts" - expr("INTERVAL 1 HOUR"))
      .groupBy($"event_id").agg(count(lit(1)).as("n_clicks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = graft.streaming.EventStream.q90StreamIntervalJoin(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("q87: chunk boundaries are content-defined (same token set, same cuts)") {
    // two docs with identical text must produce identical chunk fingerprints
    val ts = load(spark, dir, "documents").select($"text").limit(1)
      .collect().head.getString(0)
    val two = Seq((1L, "srcA", ts), (2L, "srcB", ts)).toDF("doc_id", "source", "text")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tok = two.select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .withColumn("chunk", sum(when(substring(md5($"w"), 1, 1) === "0", 1L)
        .otherwise(0L)).over(w))
    val fps = tok.groupBy($"doc_id", $"chunk")
      .agg(md5(concat_ws(" ", transform(
        array_sort(collect_list(struct($"pos", $"w"))), x => x("w")))).as("cfp"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"cfp")).as("fps"))
      .collect().map(_.getSeq[String](1))
    assert(fps.length == 2 && fps(0) == fps(1))
  }

  test("q139: budget draw is the greedy per-source prefix of the epoch-0 order") {
    val budget = 800L
    val rows = load(spark, dir, "documents")
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .withColumn("ord", CurationOps.epochOrder($"doc_id", lit(0L)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val drawn = CurationOps.q139TokenBudgetDraw(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    rows.groupBy(_._2).foreach { case (src, docs) =>
      // replay the greedy fill over the (ord, doc_id)-sorted prefix
      var cum = 0L
      val want = docs.sortBy(r => (r._4, r._1)).takeWhile { r =>
        val admit = cum < budget; cum += r._3; admit
      }
      val (nDocs, nTok, xr) = drawn(src)
      assert(nDocs == want.length, s"$src: n_docs")
      assert(nTok == want.map(_._3).sum, s"$src: token total")
      assert(xr == want.map(_._1).reduce(_ ^ _), s"$src: drawn-set xor")
      // greedy fill reaches the budget whenever the source has the tokens
      if (docs.map(_._3).sum >= budget)
        assert(nTok >= budget, s"$src: under budget with tokens available")
    }
  }

  test("q132: the bigram exchange is computed once and reused (no re-explode)") {
    val df = CurationOps.q132BigramSurprise(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the repartition on (w1, w2) feeds the bigram-count aggregate AND
    // the score join from ONE materialization — the corpus is exploded
    // into bigrams exactly once
    assert(p.contains("ReusedExchange"), p)
    // per-document ranking must not devolve into a global sort: the
    // top-20 is a TakeOrderedAndProject
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q145: char entropy is zero for one repeated char, permutation-blind, monotone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa"),            // single char: zero surprise
      (2L, "abababab"),            // two chars, uniform
      (3L, "babababa"),            // permutation of doc 2
      (4L, "abcdefgh")             // uniform alphabet: maximal
    ).toDF("doc_id", "text")
    val out = CurationOps.charEntropyProfile(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((8L, 1L, 0L, 0L)), out(1L))
    // N=8 -> floor(log2)=3; k=4 -> 2: bits = 8*3 - 2*(4*2) = 8
    assert(out(2L) == ((8L, 2L, 8L, 1000000L)), out(2L))
    assert(out(3L) == out(2L)) // histogram-only: order-blind
    // k=1 -> floor(log2 1)=0: bits = 8*3 = 24, strictly above doc 2
    assert(out(4L) == ((8L, 8L, 24L, 3000000L)), out(4L))
  }

  // ---------------------------------------------------------------- q169

  private def keptSet(df: org.apache.spark.sql.DataFrame, cap: Int) =
    CurationOps.sourceCap(df, cap).select($"source", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("q169: capping is a selection monoid — cap(A∪B) == cap(cap(A) ∪ cap(B))") {
    val docs = load(spark, dir, "documents").select($"doc_id", $"source")
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    val direct = keptSet(docs, 7)
    val cappedShards = CurationOps.sourceCap(a, 7).select($"doc_id", $"source")
      .union(CurationOps.sourceCap(b, 7).select($"doc_id", $"source"))
    assert(keptSet(cappedShards, 7) === direct,
      "re-capping the union of capped shards must lose nothing")
    // release stability: survivors of the union that come from A are
    // survivors of A alone (growth displaces, never reshuffles)
    val aIds = a.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(direct.filter(kv => aIds(kv._2)).subsetOf(keptSet(a, 7)))
  }

  test("q169: accounting is exact and the cap plans as the bounded-heap top-k") {
    graft.plans.TopKPerKey.install(spark)
    val out = CurationOps.q169SourceCap(spark, dir)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "cap must plan as the bounded heap:\n" + p)
    assert(!p.contains("Window"), "window full-sort survived the rewrite:\n" + p)
    val rows = out.collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (_, rs) =>
      assert(rs.length === 10 && rs.forall(_.getAs[Long]("n_source") === 25L) &&
        rs.forall(_.getAs[Long]("n_kept") === 10L))
    }
    // a cap above the group size keeps whole groups
    val docs = load(spark, dir, "documents")
    assert(CurationOps.sourceCap(docs, 1000).count() === docs.count())
  }

  // ---------------------------------------------------------------- q173

  test("q173: ordinals are dense, order-isomorphic, bucket-count-blind — and no global window plans") {
    val docs = load(spark, dir, "documents").select($"doc_id")
    val out = CurationOps.denseOrdinals(docs, $"doc_id")
    out.collect()
    // the scale gate: every window in the plan is PARTITIONED (on the
    // bucket key) — the single-task global-sort WindowExec never
    // appears. String-level because AQE wraps the physical tree.
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("windowspecdefinition(__b"),
      "expected a bucket-partitioned window:\n" + planStr)
    assert(!planStr.replace("windowspecdefinition(__b", "")
        .contains("windowspecdefinition("),
      "global (unpartitioned) window planned:\n" + planStr)
    val rows = out.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("ord"),
        r.getAs[Long]("ordinal")))
    // dense: exactly 0..n-1
    assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    // order-isomorphic to (ord, doc_id)
    assert(rows.sortBy(_._3).map(t => (t._2, t._1)).toSeq ===
      rows.map(t => (t._2, t._1)).sortBy(identity).toSeq)
    // numbering is independent of the bucket count (incl. skewed few)
    val seven = CurationOps.denseOrdinals(docs, $"doc_id", buckets = 7)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ordinal"))
      .toMap
    assert(rows.map(t => t._1 -> t._3).toMap === seven)
  }

  // ---------------------------------------------------------------- q180

  test("q180: distributed ntile ≡ Spark's native global ntile; sizes differ by ≤ 1") {
    val docs = load(spark, dir, "documents").select($"doc_id")
    val dist = CurationOps.globalNtile(docs, $"doc_id", 7, buckets = 11)
      .select($"doc_id", $"tile").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = docs
      .withColumn("ord", CurationOps.epochOrder($"doc_id", lit(0L)))
      .withColumn("tile", ntile(7).over(
        org.apache.spark.sql.expressions.Window.orderBy($"ord", $"doc_id"))
        .cast("long"))
      .select($"doc_id", $"tile").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === native)
    val sizes = dist.values.groupBy(identity).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"tile sizes must differ by ≤ 1: $sizes")
    // degenerate k > n: every row its own tile, numbered by ordinal
    val tiny = (1L to 3L).toDF("doc_id")
    val t = CurationOps.globalNtile(tiny, $"doc_id", 10)
      .select($"ordinal", $"tile").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(0L -> 1L, 1L -> 2L, 2L -> 3L))
  }

  // ---------------------------------------------------------------- q175

  test("q175: funnel is monotone per source and every stage genuinely cuts somewhere") {
    val rows = CurationOps.q175ReleasePipeline(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getAs[Long]("n_source"), r.getAs[Long]("n_capped"),
        r.getAs[Long]("n_unique"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_drawn")))
    assert(rows.nonEmpty)
    rows.foreach { case (s0, s1, s2, s3, s4) =>
      assert(s0 >= s1 && s1 >= s2 && s2 >= s3 && s3 >= s4 && s4 >= 0,
        s"funnel not monotone: $s0 >= $s1 >= $s2 >= $s3 >= $s4")
    }
    // non-vacuity: each boundary strictly cuts for at least one source
    assert(rows.exists(t => t._1 > t._2), "cap never cut")
    assert(rows.exists(t => t._2 > t._3), "dedup never cut")
    assert(rows.exists(t => t._3 > t._4), "quality never cut")
    assert(rows.exists(t => t._4 > t._5), "draw never cut")
  }

  // ---------------------------------------------------------------- q208

  test("q208: identical sources pin cos = 1; disjoint vocab pairs absent") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x y y z"), ("a", "x z"),
      ("b", "x y y z"), ("b", "x z"),     // identical to a
      ("c", "q q r")                       // disjoint vocabulary
    ).toDF("source", "text")
    val out = CurationOps.sourceSimilarity(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("dot"), r.getAs[Long]("ss_a"), r.getAs[Long]("ss_b"))).toMap
    val (d, sa, sb) = out(("a", "b"))
    assert(d * d === sa * sb, s"identical sources must be cos=1: $d $sa $sb")
    assert(!out.keySet.exists { case (x, y) => x == "c" || y == "c" })
  }

  test("q208: Cauchy-Schwarz holds on real data and pairs are canonical") {
    val out = CurationOps.q208SourceSimilarity(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"pair not canonical: $a $b")
      val (d, sa, sb) = (r.getAs[Long]("dot"), r.getAs[Long]("ss_a"),
        r.getAs[Long]("ss_b"))
      assert(d > 0L && BigInt(d) * BigInt(d) <= BigInt(sa) * BigInt(sb))
    }
  }

  test("q223: a target-vocabulary document outranks a corpus-common one") {
    // target = min(source) = 'aa' is all 'zebra'; 'common' never appears
    // there but dominates the rest of the corpus. Integer-log scores:
    // s(zebra) = il2(9) - il2(13) = 0, s(common) = il2(1) - il2(17) = -4,
    // K = il2(28) - il2(8) = 1 -> doc3 scores 4, doc4 scores -12
    val docs = Seq(
      (1L, "aa", "zebra zebra zebra zebra zebra zebra zebra zebra"),
      (3L, "bb", "zebra zebra zebra zebra"), // target-like candidate
      (4L, "bb", "common common common common"), // corpus-like candidate
      (5L, "cc", "common common common common common common " +
        "common common common common common common"))
      .toDF("doc_id", "source", "text")
    val out = CurationOps.dsirSelect(docs, k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
    assert(!out.contains(1L), "target docs selected")
    assert(out(3L) === 4L && out(4L) === -12L, s"pinned scores moved: $out")
    assert(out(3L) > out(4L), s"zebra doc must outrank common doc: $out")
  }

  test("q228: every stratum gets exactly floor(n*p/100) validation rows, " +
    "assignment is deterministic") {
    val docs = load(spark, dir, "documents")
    val out = CurationOps.stratifiedSplit(docs, valPct = 20)
    val rows = out.collect()
    rows.foreach { r =>
      val (n, v, t) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_val"),
        r.getAs[Long]("n_train"))
      assert(v === n * 20L / 100L, s"${r.getString(0)}: quota violated")
      assert(v + t === n)
    }
    // determinism: a second run folds the identical val membership
    val again = CurationOps.stratifiedSplit(docs, valPct = 20).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("val_xor")).toMap
    rows.foreach(r =>
      assert(again(r.getString(0)) === r.getAs[Long]("val_xor")))
  }

  test("q226: allocations sum to the budget exactly and stay within 1 of " +
    "proportional; equal remainders break ties by source") {
    val w = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("source", "w")
    val out = CurationOps.apportion(w, budget = 10L).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    // 10/3: base 3 each, shortfall 1, equal remainders -> 'a' wins
    assert(out === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    val docs = load(spark, dir, "documents").groupBy(col("source"))
      .agg(count(lit(1)).as("w"))
    val rows = CurationOps.apportion(docs, budget = 9973L).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum === 9973L)
    val tot = rows.map(_.getAs[Long]("w")).sum
    rows.foreach { r =>
      val ideal = r.getAs[Long]("w") * 9973L
      val alloc = r.getAs[Long]("alloc")
      assert(alloc === ideal / tot || alloc === ideal / tot + 1L)
    }
  }

  test("q232: shards conserve the corpus, ids are contiguous, and the " +
    "bucketed prefix equals the naive global recompute") {
    val docs = load(spark, dir, "documents")
    val out = CurationOps.shardCut(docs, budget = 2000L).collect()
      .map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    val totalTok = docs
      .select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(out.values.map(_._2).sum === totalTok)
    assert(out.keys.toSeq.sorted === (0L until out.size.toLong))
    // naive recompute: single-partition global prefix in epochOrder
    import org.apache.spark.sql.expressions.Window
    val naive = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .withColumn("ord", CurationOps.epochOrder(col("doc_id"), lit(0L)))
      .coalesce(1)
      .withColumn("cb", coalesce(sum(col("ntok")).over(
        Window.orderBy(col("ord"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy(expr("cb div 2000").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      .collect()
      .map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(out === naive)
  }

  test("q256: dup-2-gram per-mille pins the loop, the novel text, and " +
    "the one-word exclusion") {
    val docs = Seq(
      (1L, "a b a b a b", "s"),   // grams: ab ba ab ba ab -> 5 total, 2 distinct -> 600
      (2L, "p q r s t", "s"),     // 4 grams all distinct -> 0
      (3L, "x x x x", "s"),       // 3 grams, 1 distinct -> (2*1000) div 3 = 666
      (4L, "solo", "s"))          // < 2 words: excluded from the profile
      .toDF("doc_id", "text", "source")
    val out = CurationOps.dupNgramProfile(docs, flagPermille = 100L)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 3L)          // doc 4 excluded
    assert(r.getAs[Long]("n_flagged") === 2L)       // 600 and 666
    assert(r.getAs[Long]("sum_dup_permille") === 600L + 0L + 666L)
  }

  // --------------------------------------------------------------- q283

  test("q283: trainLogistic LEARNS a separable fixture to 100% " +
      "accuracy, and the integer-cleared gradients make the weights " +
      "invariant under repartitioning") {
    // separable on x1: y = 1 iff x1 >= 0.6 (quantized grid values)
    val rows = (0 until 400).map { i =>
      val x1 = (i % 10) / 10.0
      (if (x1 >= 0.6) 1 else 0, x1, ((i * 7) % 10) / 10.0)
    }
    val feats = rows.toDF("y", "x1", "x2")
    val w = CurationOps.trainLogistic(feats, Seq("x1", "x2"), "y",
      iters = 40, lr = 8.0)
    val scored = CurationOps.scoreLogistic(feats, Seq("x1", "x2"), w)
    val acc = scored.filter((col("p") > 0.5) === (col("y") === 1)).count()
    assert(acc === 400L,
      s"separable fixture must train to 100% (got $acc/400, " +
        s"w=${w.toSeq})")
    // partition invariance: the per-row quantized-long gradients sum
    // exactly under ANY layout — a plain double sum would drift
    val w13 = CurationOps.trainLogistic(feats.repartition(13),
      Seq("x1", "x2"), "y", iters = 40, lr = 8.0)
    assert(w.toSeq === w13.toSeq,
      "weights must be bit-identical under repartitioning")
    // prediction threshold never fires without signal: zero iterations
    // = zero weights = p exactly 0.5 everywhere
    val w0 = CurationOps.trainLogistic(feats, Seq("x1", "x2"), "y",
      iters = 0, lr = 1.0)
    assert(w0.toSeq === Seq(0L, 0L, 0L))
  }

  test("trainLogistic is self-caching: an uncached feature frame runs " +
      "ONE scan job per iteration (plus the count) — the helper takes " +
      "the cache for the duration and releases it; a caller-managed " +
      "cache is untouched") {
    val rows = (0 until 200).map { i =>
      val x1 = (i % 10) / 10.0
      (if (x1 >= 0.6) 1 else 0, x1)
    }
    // lineage-evaluation accounting: a counting UDF in the feature
    // lineage fires once per row per SCAN of the uncached lineage.
    // Self-caching ⇒ the lineage materializes ONCE (the count())
    // and the 5 iterations read the cache: ≤ ~1 evaluation per row.
    // Without the internal cache, count + 5 aggregates would evaluate
    // it 6× per row (1200 for 200 rows).
    val evals = spark.sparkContext.longAccumulator("feat-evals")
    val counting = udf { x: Double => evals.add(1L); x }
    val feats = rows.toDF("y", "x1raw")
      .withColumn("x1", counting(col("x1raw"))).drop("x1raw")
    val w = CurationOps.trainLogistic(feats, Seq("x1"), "y",
      iters = 5, lr = 8.0)
    assert(evals.value <= 400L,
      s"feature lineage must evaluate ~once under the helper's own " +
        s"cache (got ${evals.value} evaluations for 200 rows × " +
        "(count + 5 iterations))")
    assert(feats.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "the helper must release the cache it took")
    // a caller-managed cache is left exactly as the caller set it
    feats.persist()
    try {
      val w2 = CurationOps.trainLogistic(feats, Seq("x1"), "y",
        iters = 5, lr = 8.0)
      assert(w2.toSeq === w.toSeq,
        "cached and self-cached training must be bit-identical")
      assert(feats.storageLevel !=
        org.apache.spark.storage.StorageLevel.NONE,
        "a caller-managed cache must remain")
    } finally { feats.unpersist(); () }
  }
}
