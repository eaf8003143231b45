package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.load

/** Sketch-operator laws (q146-q148): the integer rank rule behind the
  * exact distributed quantiles, and the HLL register algebra — building
  * registers shard-wise then merging with bucket-wise max IS the sketch
  * of the union (the property that makes the sketch mergeable across
  * executors/partitions/days without re-reading history).
  */
class SketchOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q146

  test("q146: rank rule picks the smallest value with 100*cum >= N*p") {
    // token counts 1..10 in one source: p50 -> 5, p90 -> 9, p99 -> 10
    val docs = (1 to 10).map { i =>
      (i.toLong, Seq.fill(i)("w").mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val q = SketchOps.tokenQuantiles(docs).collect()
      .map(r => r.getAs[Long]("p") -> r.getAs[Long]("q_value")).toMap
    assert(q === Map(50L -> 5L, 90L -> 9L, 99L -> 10L))
  }

  test("q146: quantiles are repartition-invariant (histogram is global)") {
    val docs = load(spark, dir, "documents")
    val a = SketchOps.tokenQuantiles(docs).collect().toSet
    val b = SketchOps.tokenQuantiles(docs.repartition(13)).collect().toSet
    assert(a === b && a.nonEmpty)
  }

  // ---------------------------------------------------------------- q147

  /** Registers as a comparable map (key, bucket) -> m. */
  private def regMap(regs: DataFrame): Map[(String, Long), Long] =
    regs.collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("bucket")) ->
      r.getAs[Long]("m")).toMap

  test("q147: shard-wise registers + bucket-wise max == union registers") {
    val docs = load(spark, dir, "documents")
    val whole = regMap(SketchOps.hllRegisters(docs, $"doc_id", $"source"))
    val evens = SketchOps.hllRegisters(
      docs.filter($"doc_id" % 2 === 0), $"doc_id", $"source")
    val odds = SketchOps.hllRegisters(
      docs.filter($"doc_id" % 2 === 1), $"doc_id", $"source")
    // merge = full outer on (k, bucket), max of the two ranks
    val merged = evens.as("a").join(odds.as("b"),
        col("a.k") === col("b.k") && col("a.bucket") === col("b.bucket"),
        "full_outer")
      .select(coalesce(col("a.k"), col("b.k")).as("k"),
        coalesce(col("a.bucket"), col("b.bucket")).as("bucket"),
        greatest(coalesce(col("a.m"), lit(0L)),
          coalesce(col("b.m"), lit(0L))).as("m"))
    assert(regMap(merged) === whole, "register max-merge must equal the union sketch")
  }

  test("q155: store roundtrip — merge of persisted shards == registers of the union corpus") {
    val docs = load(spark, dir, "documents")
    val tmp = graft.TempDirs.create("hllstore").toString
    SketchOps.writeHllSketch(
      SketchOps.hllRegisters(docs.filter($"doc_id" % 2 === 0), $"doc_id", $"source"),
      s"$tmp/a")
    SketchOps.writeHllSketch(
      SketchOps.hllRegisters(docs.filter($"doc_id" % 2 === 1), $"doc_id", $"source"),
      s"$tmp/b")
    val merged = SketchOps.mergeHllSketches(
      SketchOps.readHllSketch(spark, s"$tmp/a"),
      SketchOps.readHllSketch(spark, s"$tmp/b"))
    val whole = regMap(SketchOps.hllRegisters(docs, $"doc_id", $"source"))
    assert(regMap(merged) === whole,
      "persisted shard merge must equal the single-pass union sketch")
    // merge is idempotent: merging a sketch with itself changes nothing
    assert(regMap(SketchOps.mergeHllSketches(merged, merged)) === whole)
    // a key present in only one shard keeps its full 64-bucket spine
    val aOnly = SketchOps.mergeHllSketches(
      SketchOps.readHllSketch(spark, s"$tmp/a"),
      SketchOps.readHllSketch(spark, s"$tmp/a").filter(lit(false)))
    assert(regMap(aOnly) ===
      regMap(SketchOps.hllRegisters(
        docs.filter($"doc_id" % 2 === 0), $"doc_id", $"source")))
  }

  test("q147: every key carries all 64 buckets; singleton key has v_empty = 63") {
    val one = Seq((42L, "only")).toDF("id", "k")
    val regs = SketchOps.hllRegisters(one, $"id", $"k")
    assert(regs.count() === 64L)
    val est = SketchOps.hllEstimate(regs).collect().head
    assert(est.getAs[Long]("v_empty") === 63L)
    // lc[63] = round(64·ln(64/63)) = 1: the corrected estimate of a
    // singleton is exactly 1
    assert(est.getAs[Long]("hll_est") === 1L)
  }

  test("q147: raw estimate lands near the exact count on the corpus") {
    val out = SketchOps.q147HllCardinality(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Long]("hll_est").toDouble
      // 64 registers -> ~13% stddev; in the small-range regime (which
      // sf0.001's ~25 docs/source is, deeply) the estimate is the
      // linear-counting lookup, which lands well inside 2x
      assert(est > exact * 0.5 && est < exact * 2.0,
        s"${r.getAs[String]("source")}: est $est vs exact $exact")
    }
  }

  // ---------------------------------------------------------------- q148

  test("q148: subset segment makes the union sketch equal the superset sketch") {
    // users of type "b" are a subset of type "a" => registers(a U b) ==
    // registers(a), so est_union == est_a exactly (integer equality)
    val ev = ((1L to 200L).map(u => ("a", u)) ++ (1L to 50L).map(u => ("b", u)))
      .toDF("event_type", "user_id")
    val regs = SketchOps.hllRegisters(ev, $"user_id", $"event_type")
    val est = SketchOps.hllEstimate(regs).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("hll_est")).toMap
    val union = SketchOps.hllEstimate(
      regs.groupBy($"bucket").agg(max($"m").as("m"))
        .select(lit("u").as("k"), $"bucket", $"m")).collect().head
    assert(union.getAs[Long]("hll_est") === est("a"))
  }

  test("q148: inclusion-exclusion identity holds row-wise on the corpus") {
    val out = SketchOps.q148HllOverlap(spark, dir)
    assert(out.filter($"overlap_est" =!= $"est_a" + $"est_b" - $"est_union")
      .count() === 0L)
    assert(out.count() > 0L)
  }

  // ---------------------------------------------------------------- q157

  private def bloomMap(bloom: DataFrame): Map[Long, Long] =
    bloom.collect().map(r =>
      r.getAs[Long]("word") -> r.getAs[Long]("bits")).toMap

  test("q157: bloom has no false negatives — every inserted key probes through") {
    val keys = (1 to 500).map(i => s"member-$i").toDF("t")
    val bloom = SketchOps.buildBloom(keys, $"t")
    assert(SketchOps.bloomProbe(keys, $"t", bloom).count() === 500L)
  }

  test("q157: bloom probe rejects the vast majority of non-members") {
    val members = (1 to 500).map(i => s"member-$i").toDF("t")
    val others = (1 to 2000).map(i => s"stranger-$i").toDF("t")
    val bloom = SketchOps.buildBloom(members, $"t")
    val fp = SketchOps.bloomProbe(others, $"t", bloom).count()
    // m = 2^20 bits, k = 4, n = 500 -> expected FP rate ~(2000/2^20)^4 ≈ 0;
    // 5% is a loose ceiling that still proves the prefilter filters
    assert(fp < 100L, s"false-positive count $fp out of 2000 non-members")
  }

  test("q157: OR-merge of per-release blooms == bloom of the union release") {
    val a = (1 to 300).map(i => s"doc-a-$i").toDF("t")
    val b = (1 to 300).map(i => s"doc-b-$i").toDF("t")
    val merged = SketchOps.mergeBlooms(
      SketchOps.buildBloom(a, $"t"), SketchOps.buildBloom(b, $"t"))
    val whole = SketchOps.buildBloom(a.union(b), $"t")
    assert(bloomMap(merged) === bloomMap(whole),
      "word-wise OR must equal the union bloom bit-for-bit")
    // idempotent: merging a bloom with itself changes nothing
    assert(bloomMap(SketchOps.mergeBlooms(merged, merged)) === bloomMap(whole))
  }

  test("q157: probe plan is map-only — broadcast lookups, no shuffle at all") {
    val members = (1 to 500).map(i => s"member-$i").toDF("t")
    // the production shape probes a STORED bloom (built once, read per
    // release), so the probe plan must not inherit the build's aggregate
    val tmp = graft.TempDirs.create("bloomplan").toString
    SketchOps.writeBloom(SketchOps.buildBloom(members, $"t"), s"$tmp/bf")
    val bloom = SketchOps.readBloom(spark, s"$tmp/bf")
    val probe = SketchOps.bloomProbe(members, $"t", bloom)
    probe.collect() // force the AQE final plan
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bloom side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"probe must not sort-merge against the bloom:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"probe must not shuffle the probed side:\n$plan")
  }

  test("q157: store roundtrip preserves the bloom bit-for-bit") {
    val keys = (1 to 400).map(i => s"k-$i").toDF("t")
    val bloom = SketchOps.buildBloom(keys, $"t")
    val tmp = graft.TempDirs.create("bloomstore").toString
    SketchOps.writeBloom(bloom, s"$tmp/bf")
    assert(bloomMap(SketchOps.readBloom(spark, s"$tmp/bf")) === bloomMap(bloom))
  }

  test("q157: planted cross-release dups are found exactly despite the prefilter") {
    // history: h-1..h-100; release: 10 planted dups of history + 90 fresh
    val hist = (1 to 100).map(i => (i.toLong, s"h-$i", "src")).toDF("doc_id", "text", "source")
    val rel = ((1 to 10).map(i => (1000L + i, s"h-$i", "src")) ++
      (1 to 90).map(i => (2000L + i, s"fresh-$i", "src")))
      .toDF("doc_id", "text", "source")
    val bloom = SketchOps.buildBloom(hist, $"text")
    val candidates = SketchOps.bloomProbe(rel, $"text", bloom)
    // no false negatives: all 10 dups are candidates
    assert(candidates.count() >= 10L)
    val confirmed = candidates
      .join(hist.select($"text").distinct(), Seq("text"), "left_semi")
    // exact verify removes every false positive: exactly the planted 10
    assert(confirmed.count() === 10L)
    assert(confirmed.collect().map(_.getAs[String]("text")).toSet ===
      (1 to 10).map(i => s"h-$i").toSet)
  }

  test("q161: decon through the persisted sketch ≡ q67's in-memory-bloom decon") {
    val viaStore = SketchOps.q161BloomDeconStore(spark, dir).collect().toSet
    val viaBuiltin = TextOps.q67BloomDecontaminate(spark, dir).collect().toSet
    assert(viaStore === viaBuiltin && viaStore.nonEmpty)
  }

  // ---------------------------------------------------------------- q163

  test("q163: every artifact join broadcasts — no sort-merge over KB-scale stores") {
    val drift = SketchOps.q163ReleaseDrift(spark, dir)
    drift.collect() // force the AQE final plan
    val plan = drift.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"artifact-only monitoring must not sort-merge:\n$plan")
  }

  // ---------------------------------------------------------------- q164

  test("q164: planted novel tokens count exactly against the persisted vocab") {
    import graft.operators.SketchOps._
    val relA = Seq((1L, "a b c", "s")).toDF("doc_id", "text", "source")
    val tmp = graft.TempDirs.create("vocab").toString
    writeVocab(vocabFrame(relA), s"$tmp/v")
    val vocabA = readVocab(spark, s"$tmp/v")
    assert(vocabA.collect().map(r =>
      r.getAs[String]("token") -> r.getAs[Long]("df")).toMap ===
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    // release B: 4 distinct tokens, 2 novel -> 500000 ppm
    val bTokens = Seq((2L, "a b x y", "s")).toDF("doc_id", "text", "source")
      .select($"source", explode(array_distinct(split($"text", " "))).as("token"))
      .distinct()
    val oov = bTokens.join(vocabA, Seq("token"), "left_anti")
    assert(oov.collect().map(_.getAs[String]("token")).toSet === Set("x", "y"))
  }

  test("q164: shard vocab sum-merge == vocabulary of the union corpus") {
    import graft.operators.SketchOps._
    val docs = load(spark, dir, "documents")
    val merged = mergeVocabs(
      vocabFrame(docs.filter($"doc_id" % 2 === 0)),
      vocabFrame(docs.filter($"doc_id" % 2 === 1)))
    def m(df: DataFrame) = df.collect().map(r =>
      r.getAs[String]("token") -> r.getAs[Long]("df")).toMap
    assert(m(merged) === m(vocabFrame(docs)))
  }

  // ---------------------------------------------------------------- q159

  // ---------------------------------------------------------------- q166

  private def cmsMap(cms: DataFrame): Map[(Int, Long), Long] =
    cms.collect().map(r => (r.getAs[Int]("row"), r.getAs[Long]("pos")) ->
      r.getAs[Long]("n")).toMap

  test("q166: CMS never undercounts — planted occurrence counts are lower bounds") {
    // key-i occurs i times; the sketch estimate must be >= i for every i
    val rows = (1 to 50).flatMap(i => Seq.fill(i)(s"key-$i")).toDF("g")
    val cms = SketchOps.buildCms(rows, $"g")
    for (t <- Seq(1L, 10L, 30L, 50L)) {
      val heavy = SketchOps.cmsHeavyProbe(rows, $"g", cms, t)
        .select($"g").distinct().collect().map(_.getString(0)).toSet
      val truly = (t to 50L).map(i => s"key-$i").toSet
      assert(truly.subsetOf(heavy),
        s"t=$t: missing truly-heavy keys ${truly.diff(heavy)}")
    }
  }

  test("q166: counter-wise sum of per-release sketches == sketch of the union") {
    val a = (1 to 40).flatMap(i => Seq.fill(3)(s"a-$i")).toDF("g")
    val b = (1 to 40).flatMap(i => Seq.fill(2)(s"b-$i")).toDF("g")
    val merged = SketchOps.mergeCms(
      SketchOps.buildCms(a, $"g"), SketchOps.buildCms(b, $"g"))
    assert(cmsMap(merged) === cmsMap(SketchOps.buildCms(a.union(b), $"g")))
  }

  test("q166: store roundtrip preserves counters; probe + exact verify is exact") {
    val corpus = ((1 to 8).flatMap(i => Seq.fill(10)(s"heavy-$i")) ++
      (1 to 200).map(i => s"light-$i")).toDF("g")
    val tmp = graft.TempDirs.create("cmsstore").toString
    SketchOps.writeCms(SketchOps.buildCms(corpus, $"g"), s"$tmp/cms")
    val cms = SketchOps.readCms(spark, s"$tmp/cms")
    assert(cmsMap(cms) === cmsMap(SketchOps.buildCms(corpus, $"g")))
    val probe = SketchOps.cmsHeavyProbe(corpus, $"g", cms, 10L)
    val heavy = probe
      .groupBy($"g").agg(count(lit(1)).as("n")).filter($"n" >= 10L)
      .collect().map(_.getString(0)).toSet
    assert(heavy === (1 to 8).map(i => s"heavy-$i").toSet,
      "exact verify must keep exactly the planted heavy keys")
    // the probe itself is map-only: d broadcast lookups, no shuffle
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"probe must not shuffle:\n$plan")
  }

  // ---------------------------------------------------------------- q186

  test("q186: percentile tags are exact, tie-sharing, and span to 1e6") {
    // source s: lengths 1,2,2,4 -> cume 1,3,3,4 of 4
    val docs = Seq(
      (1L, "w", "s"), (2L, "w w", "s"), (3L, "x x", "s"),
      (4L, "a b c d", "s")).toDF("doc_id", "text", "source")
    val hist = SketchOps.tokenHistogram(docs)
    val out = SketchOps.percentileFromHistogram(docs, hist).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pct_ppm")).toMap
    assert(out === Map(1L -> 250000L, 2L -> 750000L, 3L -> 750000L,
      4L -> 1000000L))
  }

  test("q186: no corpus-wide window — the only WindowExec runs on the histogram") {
    val docs = load(spark, dir, "documents")
    val tagged = SketchOps.percentileFromHistogram(
      docs, SketchOps.tokenHistogram(docs))
    // every doc tagged exactly once; max percentile is exactly 1e6
    assert(tagged.count() === docs.count())
    assert(tagged.agg(max($"pct_ppm")).head.getLong(0) === 1000000L)
    // the window operates on histogram rows, never document rows: its
    // child's row count is the histogram's, far below the corpus
    val plan = tagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"tagging must be a broadcast lookup:\n$plan")
    val histRows = SketchOps.tokenHistogram(docs).count()
    assert(histRows < docs.count(), "histogram must be smaller than corpus")
  }

  // ---------------------------------------------------------------- q190

  test("q190: the advisor picks each strategy exactly at its threshold") {
    def adv(a: Seq[Long], b: Seq[Long]): String =
      SketchOps.joinAdvisor(a.toDF("k"), b.toDF("k"),
        broadcastRows = 10L, saltCut = 4L)
        .collect().head.getAs[String]("strategy")
    // small build side wins regardless of skew
    assert(adv((1L to 100L) ++ Seq.fill(50)(7L), 1L to 10L) === "broadcast_b")
    // hot key on the big probe side: 60 of 110 rows on key 7 over ~51
    // keys -> salt factor ~28 >= 4
    assert(adv((1L to 50L) ++ Seq.fill(60)(7L), 1L to 11L) === "salted")
    // uniform both sides, build side above the broadcast cut
    assert(adv(1L to 100L, 1L to 50L) === "shuffle")
  }

  test("q190: est_pairs in the advisory is the q181 estimator verbatim") {
    val a = (1L to 200L).flatMap(i => Seq.fill((i % 3 + 1).toInt)(i)).toDF("k")
    val b = (100L to 300L).toDF("k")
    val viaAdvisor = SketchOps.joinAdvisor(a, b)
      .collect().head.getAs[Long]("est_pairs")
    assert(viaAdvisor === ip(a, b))
  }

  // ---------------------------------------------------------------- q189

  test("q189: as-of tagging matches the <=-count definition, 0 below the min") {
    // A lengths per source s: {2, 4, 6}; B docs of lengths 1,2,3,4,5,6,7
    val a = Seq((0L, "w w", "s"), (2L, "w w w w", "s"),
      (4L, "w w w w w w", "s")).toDF("doc_id", "text", "source")
    val b = (1 to 7).map(i =>
      (2L * i + 1L, Seq.fill(i)("w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val docs = a.union(b)
    val tmp = graft.TempDirs.create("q189t").toString
    SketchOps.writeTokenHistogram(SketchOps.tokenHistogram(a), s"$tmp/h")
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy($"source")
    val cum = SketchOps.readTokenHistogram(spark, s"$tmp/h")
      .select($"source", $"tok_n",
        sum($"c").over(bySrc.orderBy($"tok_n").rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).as("cum"))
    val bb = b.select($"doc_id", $"source",
      size(split($"text", " ")).cast("long").as("tok_n"))
    val tagged = AsofOps.asofJoin(bb, cum, Seq("source"), "tok_n", Seq("cum"))
      .select($"doc_id", coalesce($"cum", lit(0L)).as("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // len 1 -> below all A lengths -> 0; len 2,3 -> 1; 4,5 -> 2; 6,7 -> 3
    assert(tagged === Map(3L -> 0L, 5L -> 1L, 7L -> 1L, 9L -> 2L,
      11L -> 2L, 13L -> 3L, 15L -> 3L))
  }

  test("q189: the block split is non-vacuous — every source has both releases") {
    val out = SketchOps.q189PercentileDrift(spark, dir).collect()
    assert(out.nonEmpty, "source-disjoint release split would gut the gate")
    val docs = load(spark, dir, "documents")
    val nSources = docs.select($"source").distinct().count()
    // at least half the sources must be comparable across the releases
    assert(out.length * 2 >= nSources, s"${out.length} of $nSources compared")
    for (r <- out)
      assert(r.getAs[Long]("sum_pct") <= r.getAs[Long]("n_b") * 1000000L)
  }

  // ---------------------------------------------------------------- q181

  private def ip(a: DataFrame, b: DataFrame): Long =
    SketchOps.cmsInnerProduct(
      SketchOps.buildCmsPortable(a, $"k"), SketchOps.buildCmsPortable(b, $"k"))
      .collect().head.getAs[Long]("est_pairs")

  test("q181: inner-product estimate never undercounts the true join size") {
    // many-to-many: key i occurs i times on A, (51-i) times on B
    val a = (1L to 50L).flatMap(i => Seq.fill(i.toInt)(i)).toDF("k")
    val b = (1L to 50L).flatMap(i => Seq.fill(51 - i.toInt)(i)).toDF("k")
    val exact = (1L to 50L).map(i => i * (51L - i)).sum
    assert(ip(a, b) >= exact, "CMS inner product must be an overestimate")
  }

  test("q181: single shared key is estimated exactly (no collisions possible)") {
    // every row hashes to the same d positions, so each row's inner
    // product is exactly nA*nB and the min is too
    val a = Seq.fill(7)(42L).toDF("k")
    val b = Seq.fill(11)(42L).toDF("k")
    assert(ip(a, b) === 77L)
  }

  test("q181: disjoint key sets estimate collisions only, never below zero") {
    val a = (1L to 100L).toDF("k")
    val b = (10001L to 10100L).toDF("k")
    val est = ip(a, b)
    assert(est >= 0L, "estimate of an empty join must be nonnegative")
  }

  test("q181: portable sketches sum-merge like the xxhash family") {
    val a = (1L to 200L).toDF("k")
    val b = (150L to 400L).toDF("k")
    val merged = SketchOps.mergeCms(
      SketchOps.buildCmsPortable(a, $"k"), SketchOps.buildCmsPortable(b, $"k"))
    assert(cmsMap(merged) ===
      cmsMap(SketchOps.buildCmsPortable(a.union(b), $"k")))
  }

  test("q181: inner product through the persisted store == direct") {
    val a = (1L to 300L).flatMap(i => Seq.fill((i % 3 + 1).toInt)(i)).toDF("k")
    val b = (200L to 500L).toDF("k")
    val tmp = graft.TempDirs.create("cmsip").toString
    SketchOps.writeCms(SketchOps.buildCmsPortable(a, $"k"), s"$tmp/a")
    SketchOps.writeCms(SketchOps.buildCmsPortable(b, $"k"), s"$tmp/b")
    val stored = SketchOps.cmsInnerProduct(
      SketchOps.readCms(spark, s"$tmp/a"), SketchOps.readCms(spark, s"$tmp/b"))
      .collect().head.getAs[Long]("est_pairs")
    assert(stored === ip(a, b))
  }

  // ---------------------------------------------------------------- q167

  test("q167: planted campaign surfaces as emerging; established boilerplate does not") {
    val spam = "spam alpha beta gamma"   // 2 shingles, only in the new release
    val boiler = "old boiler plate text" // heavy in BOTH releases
    val docs = (
      Seq((1L, spam), (3L, spam), (5L, spam),
        (7L, boiler), (9L, boiler), (11L, boiler)) ++    // odd = new
      Seq((2L, boiler), (4L, boiler), (6L, boiler),
        (8L, "w x y z"), (10L, "p q r s"))               // even = old
    ).toDF("doc_id", "text")
    val out = SketchOps.cmsEmerging(docs, threshold = 3L).collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_b"), r.getAs[Long]("n_a")))).toMap
    assert(out === Map(
      "spam alpha beta" -> ((3L, 0L)),
      "alpha beta gamma" -> ((3L, 0L))),
      s"emerging set wrong: $out")
  }

  // ---------------------------------------------------------------- q162

  private def histMap(df: DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("tok_n")) ->
      r.getAs[Long]("c")).toMap

  test("q162: streaming wrapper folds arriving batches into the exact corpus histogram") {
    import graft.streaming.HistogramStream
    val docs = load(spark, dir, "documents")
    val base = graft.TempDirs.create("histstream")
    val (src, store) = (s"$base/src", s"$base/store")
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$src/b0.parquet")
    val q = HistogramStream.tokenHistogramStream(spark, src, store)
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" % 2 === 1).write
        .mode("append").parquet(s"$src/b1.parquet")
      q.processAllAvailable()
    } finally q.stop()
    assert(HistogramStream.liveTags(spark, store).size >= 2)
    assert(histMap(HistogramStream.readHistogram(spark, store)) ===
      histMap(SketchOps.tokenHistogram(docs)))
    // compaction folds to one shard without changing a single count
    HistogramStream.compact(spark, store)
    assert(HistogramStream.liveTags(spark, store) === Seq("folded-0"))
    assert(histMap(HistogramStream.readHistogram(spark, store)) ===
      histMap(SketchOps.tokenHistogram(docs)))
    // idempotent re-compaction: single live shard, zero work, same state
    HistogramStream.compact(spark, store)
    assert(HistogramStream.liveTags(spark, store) === Seq("folded-0"))
  }

  test("q162: shard replay is idempotent and unlisted crash residue is invisible") {
    import graft.streaming.HistogramStream
    val store = graft.TempDirs.create("histcrash").toString
    val b0 = Seq((1L, "a b c", "s"), (2L, "a b", "s"))
      .toDF("doc_id", "text", "source")
    val expect = histMap(SketchOps.tokenHistogram(b0))
    HistogramStream.appendShard(spark, store, "batch_0",
      SketchOps.tokenHistogram(b0))
    // replay of the same batch tag overwrites, never double-counts
    HistogramStream.appendShard(spark, store, "batch_0",
      SketchOps.tokenHistogram(b0))
    assert(histMap(HistogramStream.readHistogram(spark, store)) === expect)
    // a shard written but never manifest-committed (the append crash
    // window) is invisible to readers...
    SketchOps.tokenHistogram(b0).withColumn("btag", lit("batch_orphan"))
      .write.partitionBy("btag").mode("append").parquet(s"$store/data")
    assert(histMap(HistogramStream.readHistogram(spark, store)) === expect)
    // ...and swept by the next real compaction
    HistogramStream.appendShard(spark, store, "batch_1",
      SketchOps.tokenHistogram(b0))
    HistogramStream.compact(spark, store)
    val dirs = new java.io.File(s"$store/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("btag=folded-0"), s"crash residue not swept: $dirs")
    // two committed copies of b0 sum to exactly twice the counts
    assert(histMap(HistogramStream.readHistogram(spark, store)) ===
      expect.map { case (k, v) => k -> v * 2 })
    // the read partition-prunes to live tags: crash residue is never
    // even listed into the scan
    val plan = HistogramStream.readHistogram(spark, store)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
      .exists(f => f.contains("btag") && !f.contains("[]")),
      s"store read must prune on btag:\n$plan")
  }

  test("q162: empty store reads as an empty, well-typed histogram") {
    import graft.streaming.HistogramStream
    val store = graft.TempDirs.create("histempty").toString
    val empty = HistogramStream.readHistogram(spark, store)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("source", "tok_n", "c"))
  }

  test("q159: sum-merge of persisted histogram shards == single-pass histogram") {
    val docs = load(spark, dir, "documents")
    val tmp = graft.TempDirs.create("histstore").toString
    SketchOps.writeTokenHistogram(
      SketchOps.tokenHistogram(docs.filter($"doc_id" % 2 === 0)), s"$tmp/a")
    SketchOps.writeTokenHistogram(
      SketchOps.tokenHistogram(docs.filter($"doc_id" % 2 === 1)), s"$tmp/b")
    val merged = SketchOps.mergeTokenHistograms(
      SketchOps.readTokenHistogram(spark, s"$tmp/a"),
      SketchOps.readTokenHistogram(spark, s"$tmp/b"))
    val whole = SketchOps.tokenHistogram(docs)
    def m(df: DataFrame): Map[(String, Long), Long] = df.collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("tok_n")) ->
        r.getAs[Long]("c")).toMap
    assert(m(merged) === m(whole),
      "persisted shard sum-merge must equal the single-pass histogram")
    // and therefore the quantiles through the store equal q146's
    assert(SketchOps.q159QuantilesPersisted(spark, dir).collect().toSet ===
      SketchOps.tokenQuantiles(docs).collect().toSet)
  }

  // ---------------------------------------------------------------- q176

  test("q176: bloom semi-join ≡ plain semi join; empty right side yields empty") {
    val dirSf = "/root/testdata/sf0.01"
    val orders = load(spark, dirSf, "orders")
    val cust = load(spark, dirSf, "customer").filter($"c_nationkey" < 5)
    val viaBloom = SketchOps.bloomSemiJoin(
        orders, $"o_custkey", cust, $"c_custkey")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val plain = orders.join(cust, orders("o_custkey") === cust("c_custkey"),
        "left_semi")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaBloom === plain && plain.nonEmpty)
    // the prefilter is a strict subset path: no false negatives means
    // candidates ⊇ matches; the exact verify must remove every FP
    val emptyRight = cust.filter(lit(false))
    assert(SketchOps.bloomSemiJoin(
      orders, $"o_custkey", emptyRight, $"c_custkey").count() === 0L)
  }

  test("q177: bloom anti-join ≡ plain anti join; semi + anti partition the left side") {
    val dirSf = "/root/testdata/sf0.01"
    val orders = load(spark, dirSf, "orders")
    val cust = load(spark, dirSf, "customer").filter($"c_nationkey" < 5)
    val viaBloom = SketchOps.bloomAntiJoin(
        orders, $"o_custkey", cust, $"c_custkey")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val plain = orders.join(cust, orders("o_custkey") === cust("c_custkey"),
        "left_anti")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaBloom === plain && plain.nonEmpty)
    val semi = SketchOps.bloomSemiJoin(
        orders, $"o_custkey", cust, $"c_custkey")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    assert((semi & viaBloom).isEmpty)
    assert(semi.size + viaBloom.size === orders.count())
    // empty right side: every left row is a guaranteed miss
    assert(SketchOps.bloomAntiJoin(orders, $"o_custkey",
      cust.filter(lit(false)), $"c_custkey").count() === orders.count())
  }

  // ---------------------------------------------------------------- q178

  test("q178: streaming bloom shards OR-fold to the bloom of the union, bit-for-bit") {
    import graft.streaming.HistogramStream
    val docs = load(spark, dir, "documents")
    val store = graft.TempDirs.create("bloomstream").toString
    HistogramStream.appendBloomShard(spark, store, "b0",
      SketchOps.buildBloom(docs.filter($"doc_id" % 2 === 0), $"text"))
    HistogramStream.appendBloomShard(spark, store, "b1",
      SketchOps.buildBloom(docs.filter($"doc_id" % 2 === 1), $"text"))
    def m(df: DataFrame): Map[Long, Long] = df.collect()
      .map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits")).toMap
    val whole = m(SketchOps.buildBloom(docs, $"text"))
    assert(m(HistogramStream.readBloomStore(spark, store)) === whole)
    HistogramStream.compactBloom(spark, store)
    assert(HistogramStream.liveTags(spark, store) === Seq("folded-0"))
    assert(m(HistogramStream.readBloomStore(spark, store)) === whole,
      "fold must not change a single bit")
  }

  // ---------------------------------------------------------------- q170

  test("q170: streaming CMS wrapper accumulates the exact union sketch; fold preserves counters") {
    import graft.streaming.HistogramStream
    val docs = load(spark, dir, "documents")
    val base = graft.TempDirs.create("cmsstream")
    val (src, store) = (s"$base/src", s"$base/store")
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$src/b0.parquet")
    val q = HistogramStream.shingleCmsStream(spark, src, store)
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" % 2 === 1).write
        .mode("append").parquet(s"$src/b1.parquet")
      q.processAllAvailable()
    } finally q.stop()
    assert(HistogramStream.liveTags(spark, store).size >= 2)
    val whole = cmsMap(SketchOps.buildCms(
      docs.select(explode(graft.operators.TextOps.shingles($"text")).as("g")),
      $"g"))
    assert(cmsMap(HistogramStream.readCmsStore(spark, store)) === whole,
      "shard-accumulated counters must equal the one-shot union sketch")
    HistogramStream.compactCms(spark, store)
    assert(HistogramStream.liveTags(spark, store) === Seq("folded-0"))
    assert(cmsMap(HistogramStream.readCmsStore(spark, store)) === whole,
      "fold must not change a single counter")
  }

  test("q172: log-histogram shards through the generic store fold to the single-pass histogram") {
    import graft.streaming.HistogramStream
    val docs = load(spark, dir, "documents")
    val store = graft.TempDirs.create("loghstream").toString
    def shard(p: Long) = SketchOps.logHistogram(
      docs.filter($"doc_id" % 2 === p), $"source", $"n_chars")
    HistogramStream.appendLogHistShard(spark, store, "b0", shard(0L))
    HistogramStream.appendLogHistShard(spark, store, "b1", shard(1L))
    HistogramStream.compactLogHist(spark, store)
    assert(HistogramStream.liveTags(spark, store) === Seq("folded-0"))
    def m(df: DataFrame): Map[(String, Long), Long] = df.collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    assert(m(HistogramStream.readLogHistStore(spark, store)) ===
      m(SketchOps.logHistogram(docs, $"source", $"n_chars")))
  }

  test("q170: empty CMS store reads as an empty, well-typed sketch") {
    import graft.streaming.HistogramStream
    val store = graft.TempDirs.create("cmsempty").toString
    val empty = HistogramStream.readCmsStore(spark, store)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("row", "pos", "n"))
  }

  // ---------------------------------------------------------------- q168

  /** Sweep of values exercising every regime of the log-bucket index:
    * the exact region [0, 32), every power-of-2 boundary ± 1 up to
    * 2^62, and odd values deep inside octaves. */
  private def logSweep: Seq[Long] =
    (0L until 32L) ++
      (5 to 62).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1)) ++
      Seq(100L, 1000L, 123457L, (1L << 40) + 987654321L, Long.MaxValue - 1)

  test("q168: bucket index is monotone and rep inverts to within 1/16 below v") {
    val df = logSweep.toDF("v")
      .selectExpr("v",
        """CAST(CASE WHEN v < 32 THEN v
          |  ELSE (length(bin(v)) - 5) * 16
          |       + shiftright(v, cast(length(bin(v)) - 5 as int)) END
          |AS BIGINT) AS qb""".stripMargin)
      .selectExpr("v", "qb",
        """CAST(CASE WHEN qb < 32 THEN qb
          |  ELSE shiftleft(qb % 16 + 16, cast(qb div 16 - 1 as int)) END
          |AS BIGINT) AS rep""".stripMargin)
    val rows = df.collect().map(r =>
      (r.getAs[Long]("v"), r.getAs[Long]("qb"), r.getAs[Long]("rep")))
      .sortBy(_._1)
    rows.foreach { case (v, _, rep) =>
      assert(rep <= v, s"rep must lower-bound: v=$v rep=$rep")
      if (v < 32) assert(rep === v, s"exact region: v=$v rep=$rep")
      else {
        val width = 1L << (63 - java.lang.Long.numberOfLeadingZeros(v) - 4)
        assert(v - rep < width, s"1/16 contract: v=$v rep=$rep width=$width")
      }
    }
    // strict monotonicity of the index in v (distinct values may share
    // a bucket, but the index never DECREASES as v grows)
    rows.sliding(2).foreach { case Array((v1, b1, _), (v2, b2, _)) =>
      assert(b1 <= b2, s"monotone: v=$v1->$v2 bucket=$b1->$b2")
    }
  }

  test("q168: persisted shard sum-merge == single-pass log histogram; small domains exact") {
    val docs = load(spark, dir, "documents")
    val tmp = graft.TempDirs.create("loghist").toString
    SketchOps.writeLogHistogram(
      SketchOps.logHistogram(docs.filter($"doc_id" % 2 === 0), $"source", $"n_chars"),
      s"$tmp/a")
    SketchOps.writeLogHistogram(
      SketchOps.logHistogram(docs.filter($"doc_id" % 2 === 1), $"source", $"n_chars"),
      s"$tmp/b")
    val merged = SketchOps.mergeLogHistograms(
      SketchOps.readLogHistogram(spark, s"$tmp/a"),
      SketchOps.readLogHistogram(spark, s"$tmp/b"))
    def m(df: DataFrame): Map[(String, Long), Long] = df.collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    assert(m(merged) === m(SketchOps.logHistogram(docs, $"source", $"n_chars")),
      "persisted shard sum-merge must equal the single-pass log histogram")
    // values < 32 are their own bucket, so quantiles over a small-value
    // corpus coincide with the EXACT histogram path's answers
    val small = (1 to 100).map(i => (i.toLong, "s", (i % 31 + 1).toLong))
      .toDF("doc_id", "source", "n_chars")
    val viaLog = SketchOps.quantilesFromLogHistogram(
        SketchOps.logHistogram(small, $"source", $"n_chars")).collect()
      .map(r => r.getAs[Long]("p") -> r.getAs[Long]("q_lo")).toMap
    val exact = SketchOps.quantilesFromHistogram(
        small.select($"source", $"n_chars".as("tok_n"))
          .groupBy($"source", $"tok_n").agg(count(lit(1)).as("c"))).collect()
      .map(r => r.getAs[Long]("p") -> r.getAs[Long]("q_value")).toMap
    assert(viaLog === exact, "small-value region must be exact")
    // artifact is bounded: total buckets never exceed 992 per source
    assert(merged.groupBy($"source").count().collect()
      .forall(_.getAs[Long]("count") <= 992L))
  }

  // ---------------------------------------------------------------- q206

  test("q206: identical sets estimate 16/16; partial overlap bounded; " +
    "disjoint sets never pair") {
    val items = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L), // identical to set 1
      (3L, 10L), (3L, 99L),            // overlaps 1/2 in one element
      (4L, 777L), (4L, 888L)           // disjoint from everything
    ).toDF("set_id", "elem")
    val out = SketchOps.minhashErrorAudit(items)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_match"))).toMap
    // disjoint set 4 appears in no pair (inverted-index join)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
    val (i12, na12, nb12, m12) = out((1L, 2L))
    assert((i12, na12, nb12, m12) === (3L, 3L, 3L, 16L))
    val (i13, _, _, m13) = out((1L, 3L))
    assert(i13 === 1L && m13 >= 0L && m13 < 16L,
      s"partial overlap must not estimate identity: $m13")
  }

  test("q206: real-data audit rows are sane and identical-set rows pin 16") {
    val out = SketchOps.q206MinhashError(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (inter, na, nb, m) = (r.getAs[Long]("inter"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_match"))
      assert(inter >= 1L && inter <= math.min(na, nb))
      assert(m >= 0L && m <= 16L)
      if (inter == na && inter == nb) assert(m === 16L)
    }
  }

  test("q215: MAD pins the rank rule and shrugs off the outlier stddev can't") {
    import spark.implicits._
    // values [1,2,3,100]: median = smallest v with 2*cum >= 4 -> 2;
    // deviations [1,0,1,98] -> sorted cum [0:1, 1:3, 98:4] -> MAD = 1.
    // (sample stddev here is ~48.8 — one outlier owns it; MAD ignores it)
    val vals = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 100L))
      .toDF("source", "v")
    val out = SketchOps.madPerSource(vals).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("median") === 2L)
    assert(out.head.getAs[Long]("mad") === 1L)
    assert(out.head.getAs[Long]("n_docs") === 4L)
  }

  test("q215: constant values have MAD 0; shifting values shifts only the median") {
    import spark.implicits._
    val const = Seq(("c", 7L), ("c", 7L), ("c", 7L)).toDF("source", "v")
    val c = SketchOps.madPerSource(const).collect().head
    assert(c.getAs[Long]("median") === 7L && c.getAs[Long]("mad") === 0L)
    val base = Seq(("s", 1L), ("s", 3L), ("s", 6L)).toDF("source", "v")
    val shifted = base.select($"source", ($"v" + 1000L).as("v"))
    val (b, sh) = (SketchOps.madPerSource(base).collect().head,
      SketchOps.madPerSource(shifted).collect().head)
    assert(sh.getAs[Long]("median") === b.getAs[Long]("median") + 1000L)
    assert(sh.getAs[Long]("mad") === b.getAs[Long]("mad"))
  }

  test("q227: p99 cap on 1..100 clips exactly the top value, mass accounted") {
    import spark.implicits._
    val vals = (1L to 100L).map(("a", _)).toDF("source", "v")
    val r = SketchOps.winsorize(vals, pct = 99).collect().head
    // cap = smallest v with 100*cum >= 99*100 -> 99; only 100 clips
    assert(r.getAs[Long]("cap") === 99L)
    assert(r.getAs[Long]("n_clipped") === 1L)
    assert(r.getAs[Long]("sum_before") === 5050L)
    assert(r.getAs[Long]("sum_after") === 5049L)
    assert(r.getAs[Long]("n_docs") === 100L)
  }

  test("q257: the approx gate passes on the corpus and the gated output " +
    "IS the exact q146 table") {
    val out = SketchOps.q257QuantileApprox(spark, dir)
      .collect().map(_.toSeq).toSet
    val exact = SketchOps.q146TokenQuantiles(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(out === exact)
  }
}
