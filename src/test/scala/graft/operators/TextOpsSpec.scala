package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.load

/** Text-curation operator semantics not covered by the oracle gate. */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("native simhash64 equals the HOF twin over the whole corpus") {
    import spark.implicits._
    // the q27/q63 oracles pin corpus-profile literals computed from the
    // fingerprint; the native codegen kernel must be bit-identical to
    // the independent higher-order-function formulation on every doc —
    // including null-handling and empty/whitespace token edges
    val docs = load(spark, dir, "documents")
      .select($"doc_id", $"text")
      .unionByName(Seq(
        (90001L, ""), (90002L, " "), (90003L, "one"),
        (90004L, "a  b")).toDF("doc_id", "text"))
    val mismatch = docs
      .select($"doc_id",
        TextOps.simhash($"text").as("native"),
        TextOps.simhashHof($"text").cast("long").as("hof"))
      .filter($"native" =!= $"hof" || $"native".isNull =!= $"hof".isNull)
      .count()
    assert(mismatch == 0L)
  }

  test("approx token percentiles hit the exact rank on testdata groups") {
    import spark.implicits._
    // the sketch guarantee is on RANK, not value: at accuracy 10⁴ the
    // returned (observed) value's rank is within n/10⁴ ≈ 0 of the
    // target rank p·(n−1); exact `percentile` interpolates BETWEEN
    // ranks, so compare by rank neighborhood, not value distance
    val docs = load(spark, dir, "documents")
    val tokens = docs
      .select($"source", size(split($"text", " ")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = TextOps.tokenPercentilesApprox(docs)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == tokens.keySet)
    for ((src, ps) <- approx; (v, p) <- ps.zip(Seq(0.5, 0.9, 0.99))) {
      val sorted = tokens(src)
      val target = p * (sorted.length - 1)
      val lo = sorted.count(_ < v) // smallest rank v can hold
      val hi = sorted.count(_ <= v) - 1 // largest rank v can hold
      assert(target >= lo - 1 && target <= hi + 1,
        s"$src p$p: value $v holds ranks [$lo,$hi], target $target")
      // and v must be an actually-observed value (no interpolation)
      assert(sorted.contains(v.toInt) && v == v.toInt, s"$src p$p: $v not observed")
    }
  }

  test("persisted MinHash signatures reproduce the direct near-dup pairs") {
    import spark.implicits._
    // the signature frame is the reusable dedup artifact: write → read →
    // pairs must equal the direct (re-shingling) pipeline's pairs
    val base = (0 until 150).map(i => s"w$i").mkString(" ")
    val docs = ((0 until 20).map(i =>
      (i.toLong, s"unrelated filler $i " + s"x${i * 3} y${i * 7} " * 10)) ++
      Seq((300L, base), (301L, base.replace("w70", "z70"))))
      .toDF("doc_id", "text")
    val tmp = graft.TempDirs.create("sigs")
    TextOps.signatureFrame(docs).write.parquet(s"$tmp/sigs")
    val fromArtifact = TextOps.nearDupPairsFromSignatures(
        spark.read.parquet(s"$tmp/sigs"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = TextOps.lshNearDupPairs(docs, 0.8)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromArtifact == direct && fromArtifact.contains((300L, 301L)),
      s"artifact=$fromArtifact direct=$direct")
  }

  test("signature artifact updates incrementally (new docs only) to the full rebuild") {
    import spark.implicits._
    val mk = (r: Range) => r.map(i =>
      (i.toLong, s"document number $i " + s"alpha${i % 7} beta${i % 11} " * 15)).toDF("doc_id", "text")
    val first = mk(0 until 30)
    val all = mk(0 until 45)
    val sigs0 = TextOps.signatureFrame(first)
    val delta = TextOps.updateSignatures(all, sigs0)
    // only the 15 new docs are re-shingled
    assert(delta.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == (30L until 45L))
    // artifact + delta == from-scratch rebuild
    val merged = sigs0.unionByName(delta)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    val rebuilt = TextOps.signatureFrame(all)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    assert(merged == rebuilt)
  }

  test("JSONL corpus sink: deterministic shards, lossless roundtrip") {
    import spark.implicits._
    val docs = load(spark, dir, "documents").select($"doc_id", $"source", $"text")
    val tmp = graft.TempDirs.create("jsonl")
    graft.sources.Export.writeJsonlCorpus(docs, s"$tmp/corpus", nShards = 8)
    val back = spark.read.json(s"$tmp/corpus")
    assert(back.count() == docs.count())
    // shard dirs exist and every row sits in its hash-assigned shard
    val misplaced = back
      .filter(pmod(xxhash64($"doc_id"), lit(8)) =!= $"shard")
    assert(misplaced.count() == 0)
    // content is lossless
    val a = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = back.select($"doc_id", $"source", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a == b)
  }

  test("approx percentile aggregates partially (map-side combine, no value buffering)") {
    val df = TextOps.tokenPercentilesApprox(load(spark, dir, "documents"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // partial + final pair: the sketch, not the value list, crosses the wire
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2
      || "HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("bloom decontamination equals the exact broadcast-set path") {
    // no false negatives + exact verify behind the prefilter ⇒ the bloom
    // plan must return EXACTLY q55's result on the same split
    val a = TextOps.q55Decontamination(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = TextOps.q67BloomDecontaminate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.nonEmpty) // trivial-gate guard: the split must actually hit
  }

  test("substring-dup finds a planted 8-token verbatim overlap, not unrelated docs") {
    import spark.implicits._
    val shared = (0 until 12).map(i => s"s$i").mkString(" ") // 12 tokens → 5 shared 8-windows
    val docs = Seq(
      (0L, shared + " tail0 tail1 tail2"),
      (1L, "head0 head1 " + shared),
      (2L, (0 until 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val w = docs.select($"doc_id", explode(TextOps.tokenWindows($"text", 8)).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("nd"))
    val sharedWins = w.filter($"nd" >= 2).collect().map(_.getString(0)).toSet
    assert(sharedWins.size == 5) // windows fully inside the shared span
    assert(sharedWins.forall(_.startsWith("s")))
  }

  test("incremental near-dup pairs + old pairs == full rebuild (the artifact law)") {
    import spark.implicits._
    val base = (0 until 150).map(i => s"w$i").mkString(" ")
    val tmpl = (0 until 150).map(i => s"t$i").mkString(" ")
    // old corpus: one planted dup pair (10,11); new batch: a dup of an
    // OLD doc (200 ~ 10) and a dup pair WITHIN the batch (201,202)
    val oldDocs = ((0 until 8).map(i =>
      (i.toLong, s"unrelated filler $i " + s"x${i * 3} y${i * 7} " * 10)) ++
      Seq((10L, base), (11L, base.replace("w70", "z70"))))
      .toDF("doc_id", "text")
    val newDocs = Seq(
      (200L, base.replace("w80", "z80")),
      (201L, tmpl), (202L, tmpl.replace("t40", "u40")),
      (203L, "entirely different content here"))
      .toDF("doc_id", "text")
    val oldSigs = TextOps.signatureFrame(oldDocs)
    val newSigs = TextOps.updateSignatures(newDocs.union(oldDocs), oldSigs)
    // appended artifact = old ∪ new (what a production store holds)
    val allSigs = oldSigs.union(newSigs)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oldPairs = pairs(TextOps.nearDupPairsFromSignatures(oldSigs, 0.8))
    val incPairs = pairs(TextOps.incrementalNearDupPairs(newSigs, allSigs, 0.8))
    val fullPairs = pairs(TextOps.nearDupPairsFromSignatures(allSigs, 0.8))
    assert(oldPairs == Set((10L, 11L)))
    // the increment sees old×new AND new×new edges, nothing old×old
    assert(incPairs.contains((10L, 200L)) && incPairs.contains((201L, 202L)))
    assert(incPairs.forall { case (a, b) => b >= 200L })
    assert(oldPairs ++ incPairs == fullPairs)
  }

  test("hashed substring-dup profile equals the exact-string form on testdata") {
    // the 8-byte-key production path must agree with the string-key
    // oracle path wherever no 64-bit collision occurs (i.e. here)
    val docs = load(spark, dir, "documents")
    val exact = TextOps.q69SubstringDup(spark, dir).collect().head.toSeq
    val hashed = TextOps.substringDupProfileHashed(docs).collect().head.toSeq
    assert(hashed == exact)
  }

  test("sequence packing conserves tokens and respects the 256 stream boundary") {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
    val packs = TextOps.q70SeqPacking(spark, dir).collect()
    // conservation: per-source pack token sums == per-source corpus tokens
    val bySrc = packs.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    val truth = docs.select($"source", size(split($"text", " ")).as("n"))
      .groupBy($"source").agg(sum($"n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == truth)
    // boundary law: every doc's pack is its start-offset div 256, so a
    // pack's doc count is ≥ 1 and pack ids per source are contiguous 0..max
    for ((src, rows) <- packs.groupBy(_.getString(0))) {
      val ids = rows.map(_.getLong(1)).sorted.toSeq
      assert(ids.head == 0L && ids == (0L to ids.last).toSeq,
        s"$src pack ids $ids")
    }
  }

  test("q187: segments tile every pack — no gaps, no overlaps, tokens conserved") {
    import spark.implicits._
    val segs = TextOps.q187PackBoundaries(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(segs.nonEmpty)
    // per-doc conservation: the segments of a doc sum to its token count
    val perDoc = segs.groupBy(t => (t._1, t._3)).view
      .mapValues(_.map(_._5).sum).toMap
    val truth = load(spark, dir, "documents")
      .select($"source", $"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(perDoc === truth.filter(_._2 > 0L))
    // per-pack tiling: sorted segments are contiguous from 0; every pack
    // but each source's last is exactly full
    for (((src, pid), rows) <- segs.groupBy(t => (t._1, t._2))) {
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"$src pack $pid starts at offset 0")
      for (pair <- sorted.sliding(2) if pair.length == 2)
        assert(pair(0)._4 + pair(0)._5 === pair(1)._4,
          s"$src pack $pid gap/overlap at ${pair(1)._4}")
      val fill = sorted.map(_._5).sum
      val lastPack = segs.filter(_._1 == src).map(_._2).max
      assert(fill === 256L || pid === lastPack,
        s"$src pack $pid holds $fill of 256")
      assert(sorted.forall(t => t._4 >= 0L && t._4 < 256L))
    }
  }

  test("containment hot-shingle guard: strict refuses loudly, lossy accounts, raised cap is exact") {
    import spark.implicits._
    // a boilerplate 3-gram planted in every doc (df = 12) + two true
    // containment twins; per-doc tails keep all other shingles unique
    val boiler = "all rights reserved"
    val docs = ((0 until 10).map(i =>
      (i.toLong, s"$boiler u$i v$i w$i x$i y$i")) ++ Seq(
      (301L, s"$boiler p1 p2 p3 p4 p5"),
      (302L, s"$boiler p1 p2 p3 p4 p5 tail1 tail2")))
      .toDF("doc_id", "text")
    // strict mode: the planted shingle trips a maxDf=5 cap with a
    // message naming the offender — never a silently undercounted
    // score. The guard is IN-PLAN (raise_error on the df-cut column),
    // so it fires at action time, wrapped by Spark's task failure.
    val e = intercept[Exception] {
      TextOps.containmentPairs(docs, maxDf = 5)._1.collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains(boiler) && chain(e).contains("maxDf=5"), chain(e))
    // lossy mode under the same cap: runs, and surfaces exactly the
    // planted drop (1 hot shingle, 12 postings)
    val (lossyPairs, stats) = TextOps.containmentPairs(
      docs, maxDf = 5, allowLossy = true)
    val st = stats.head()
    assert(st.getLong(0) == 1L && st.getLong(1) == 12L)
    // under the cap the twins lose their hot shingle: inter drops 6→5,
    // so the score UNDERCOUNTS (8333 vs the true 10000) — the silent
    // wrongness strict mode exists to refuse
    val lossy = lossyPairs.collect()
    assert(lossy.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((301L, 302L)))
    assert(lossy.head.getLong(2) == 8333L)
    // with the cap raised past the corpus df, strict passes and the
    // score is exact again
    val (pairs, stats2) = TextOps.containmentPairs(docs, maxDf = 1000)
    val exact = pairs.collect()
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((301L, 302L)))
    assert(exact.head.getLong(2) == 10000L)
    assert(stats2.head().getLong(0) == 0L)
  }

  test("leakage-safe split co-assigns every near-dup cluster member") {
    import spark.implicits._
    val base = (0 until 150).map(i => s"w$i").mkString(" ")
    // a planted 3-doc chain cluster + two unrelated singletons
    val docs = Seq(
      (10L, base, "srcA"),
      (11L, base.replace("w40", "x40"), "srcB"),
      (12L, base.replace("w40", "x40").replace("w90", "y90"), "srcA"),
      (20L, (0 until 150).map(i => s"v$i").mkString(" "), "srcA"),
      (21L, "completely different " + (0 until 40).map(i => s"q$i").mkString(" "),
        "srcB"))
      .toDF("doc_id", "text", "source")
    val assign = TextOps.leakageSafeSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    // the leakage law: the whole cluster lands in ONE split
    assert(Set(assign(10L), assign(11L), assign(12L)).size == 1,
      s"cluster straddles splits: $assign")
    assert(assign.size == 5)
    // reproducible: a second run (different partitioning) agrees
    val again = TextOps.leakageSafeSplit(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(again == assign)
  }

  test("prefix-dup groups exact duplicates and survives the min-id rule") {
    import spark.implicits._
    val docs = Seq(
      (7L, "a b c d e rest1"), (3L, "a b c d e rest2"), // share 5-token prefix
      (9L, "z y x w v other"))
      .toDF("doc_id", "text")
    val out = docs
      .select($"doc_id", concat_ws(" ", slice(split($"text", " "), 1, 5)).as("prefix"))
      .groupBy($"prefix").agg(count(lit(1)).as("n_docs"), min($"doc_id").as("survivor"))
      .filter($"n_docs" >= 2).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "a b c d e")
    assert(out(0).getLong(2) == 3L)
  }

  test("q140: soft-dedup weights conserve cluster mass exactly") {
    import spark.implicits._
    val docs = load(spark, dir, "documents")
    val res = TextOps.q140SoftDedupSize(spark, dir).collect()
    // every document appears exactly once across the per-source rows
    assert(res.map(_.getLong(1)).sum == docs.count())
    // total effective mass = 1000 per singleton + n*(1000 div n) per
    // cluster -- the floor loses at most (n-1) milli-docs per cluster
    val sizes = TextOps.dedupClusterMembers(docs, 0.8)
      .groupBy($"cluster_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val singles = docs.count() - sizes.sum
    val expected = singles * 1000L + sizes.map(n => n * (1000L / n)).sum
    assert(res.map(_.getLong(2)).sum == expected)
    // soft dedup never exceeds raw mass, and only clusters reduce it
    assert(res.map(_.getLong(2)).sum <= docs.count() * 1000L)
    if (sizes.nonEmpty) assert(res.map(_.getLong(2)).sum < docs.count() * 1000L)
  }

  test("q234: confusion-matrix mass equals the corpus; diagonal equals q20 accuracy") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = TextOps.q234LangConfusion(spark, dir).collect()
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(out.map(_.getAs[Long]("n")).sum === nDocs)
    val diag = out.filter(r =>
      r.getAs[String]("true_lang") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n")).sum
    val matches = TextOps.q20LangId(spark, dir)
      .agg(sum(col("is_match"))).head.getLong(0)
    assert(diag === matches)
  }
}
