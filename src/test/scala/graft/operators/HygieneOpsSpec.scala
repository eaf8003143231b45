package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-hygiene operator semantics on planted fixtures (the oracle
  * gate covers the derived-fixture queries; here the operator laws). */
class HygieneOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("pii profile: matches counted per category, clean docs unchanged") {
    val docs = Seq(
      (1L, "sa", "reach me at alice.smith@corp.example.org today"),
      (2L, "sa", "node 192.168.0.17 and peer 10.1.2.3 are up"),
      (3L, "sb", "nothing sensitive here at all"))
      .toDF("doc_id", "source", "text")
    val got = HygieneOps.piiRedactionProfile(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // sa: doc1 one email, doc2 two IPs; sb: untouched
    assert(got("sa")._1 == 2L && got("sa")._2 == 1L && got("sa")._3 == 2L)
    assert(got("sb") == ((0L, 0L, 0L,
      "nothing sensitive here at all".length.toLong)))
    // redaction replaces, never deletes: doc1 len - email + <EMAIL>
    val d1 = "reach me at alice.smith@corp.example.org today"
    val d2 = "node 192.168.0.17 and peer 10.1.2.3 are up"
    val expected = (d1.length - "alice.smith@corp.example.org".length + "<EMAIL>".length) +
      (d2.length - "192.168.0.17".length - "10.1.2.3".length + 2 * "<IP>".length)
    assert(got("sa")._4 == expected.toLong)
  }

  test("canonical key collapses case/punctuation/whitespace variants only") {
    val docs = Seq(
      (1L, "big data rows"),
      (2L, "  BIG   data, rows!! "),
      (3L, "Big DATA rows."),
      (4L, "big data cols"),
      (5L, "big\tdata\nrows"), // tab/newline variants COLLAPSE, not delete
      (6L, "bigdata rows")) // glued tokens are a DIFFERENT text
      .toDF("doc_id", "text")
    val prof = HygieneOps.canonicalDedupProfile(docs).collect()(0)
    // 3 groups: {1,2,3,5}, {4}, {6}
    assert(prof.getLong(0) == 3L)
    assert(prof.getLong(1) == 6L)
    assert(prof.getLong(2) == 4L)
    assert(prof.getLong(3) == 3L)
  }

  test("df spectrum sums back to the posting total and buckets exactly") {
    // shared shingle "x y z" in 3 docs; each doc adds unique shingles
    val docs = Seq(
      (1L, "x y z a1 b1"), (2L, "x y z a2 b2"), (3L, "x y z a3 b3"))
      .toDF("doc_id", "text")
    // per doc: 3 shingles ("x y z", "y z aN", "z aN bN") → df(x y z)=3,
    // six unique df=1 shingles
    val got = HygieneOps.shingleDfSpectrum(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((6L, 6L)), 3L -> ((1L, 3L))))
    assert(got.values.map(_._2).sum == 9L) // = Σ per-doc shingles
  }

  test("head coverage is the cumulative Zipf share under total order") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = HygieneOps.tokenHeadCoverage(docs, Seq(1, 2, 3))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((3L, 500000L)), // a: 3/6
      2L -> ((5L, 833333L)), // +b: 5/6
      3L -> ((6L, 1000000L))))
  }

  test("substring decon flags verbatim phrase carriers, counts docs once") {
    val corpus = Seq(
      (10L, "sa", "prefix the exact answer text suffix"),
      (11L, "sa", "the exact answer appears here and the exact answer again"),
      (12L, "sb", "no overlap at all here"))
      .toDF("doc_id", "source", "text")
    val phrases = Seq("the exact answer", "another phrase").toDF("p")
    val got = HygieneOps.substringDecon(corpus, phrases)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("sa" -> 2L)) // doc 11 counted once despite 2 hits
  }

  test("segment dedup keeps each content at its first (doc, pos) and reassembles in order") {
    val docs = Seq(
      (1L, "a b c d a b"), // [a b][c d][a b]: pos-2 copy dropped intra-doc
      (2L, "a b x y z"),   // [a b][x y][z]: head boilerplate dropped cross-doc
      (3L, "c d"))         // sole segment dropped ((1,1) wins) -> empty doc
      .toDF("doc_id", "text")
    val got = HygieneOps.segmentDedup(docs, 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == (("a b c d", 3L, 1L)))
    assert(got(2L) == (("x y z", 3L, 1L)))
    // a fully-deduped document STAYS as an empty row, never vanishes
    assert(got(3L) == (("", 1L, 1L)))
    // conservation + global uniqueness: kept segment contents are
    // pairwise distinct across the whole corpus
    val kept = got.values.flatMap(_._1.split(" ").grouped(2).map(_.mkString(" ")))
      .filter(_.nonEmpty).toSeq
    assert(kept.distinct.size == kept.size)
  }

  test("near-dup decon flags paraphrase copies with best-match attribution; unrelated docs pass") {
    val base = (0 until 60).map(i => s"t$i").mkString(" ")
    val other = (0 until 60).map(i => s"z$i").mkString(" ")
    val evalSet = Seq((100L, base), (101L, other)).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, base.replace("t59", "x17")),                  // near-copy of 100
      (11L, (0 until 60).map(i => s"w$i").mkString(" ")), // unrelated
      (12L, other))                                       // verbatim copy of 101
      .toDF("doc_id", "text")
    val got = HygieneOps.nearDupDecontaminate(corpus, evalSet, 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(10L, 12L))
    // 1-token tail edit: only the last of 58 shingles differs ->
    // inter 57, union 59
    assert(got(10L) == ((100L, 57L * 1000L / 59L)))
    assert(got(12L) == ((101L, 1000L)))
  }

  test("q141: attribution picks the max-overlap train doc, ties to lowest id") {
    import graft.Tables.load
    val sh = load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", explode(TextOps.shingles($"text")).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = sh.groupBy(_._1).map { case (id, gs) => id -> gs.map(_._2).toSet }
    val bench = byDoc.filter(_._1 < 10)
    val train = byDoc.filter(_._1 >= 10).toSeq
    val got = HygieneOps
      .q141ContaminationAttribution(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (b, t, n) =>
      val best = train.map { case (tid, gs) => (tid, (gs & bench(b)).size.toLong) }
        .filter(_._2 > 0).minBy { case (tid, ov) => (-ov, tid) }
      assert((t, n) == (best._1, best._2), s"bench $b")
    }
    // every benchmark doc sharing any shingle with the corpus is attributed
    val expect = bench.collect {
      case (bid, gs) if train.exists { case (_, ts) => (ts & gs).nonEmpty } => bid
    }.toSet
    assert(got.map(_._1).toSet == expect)
  }

  test("cdc segment dedup is shift-resistant where fixed-width dedup is not") {
    import spark.implicits._
    import java.security.MessageDigest
    def nib(w: String): Char = MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    val vocab = (0 until 400).map(i => s"t$i")
    val bd = vocab.filter(nib(_) == '0')   // tokens that OPEN a chunk
    val pl = vocab.filter(nib(_) != '0')
    // shared tail with two internal boundaries; doc 2 inserts a prefix
    val tail = Seq(pl(0), bd(0), pl(1), pl(2), bd(1), pl(3))
    val a = tail.mkString(" ")
    val b = (Seq(pl(4), pl(5)) ++ tail).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val cdc = HygieneOps.cdcSegmentDedup(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1 chunks: [pl0][bd0 pl1 pl2][bd1 pl3]; doc 2's first chunk
    // absorbs the inserted prefix, the two boundary-opened chunks are
    // byte-identical to doc 1's and drop
    assert(cdc(1L) == ((a, 3L, 0L)), cdc(1L))
    assert(cdc(2L) ==
      ((Seq(pl(4), pl(5), pl(0)).mkString(" "), 3L, 2L)), cdc(2L))
    // the contrast: fixed-width segments are SHIFTED by the insertion,
    // so width-4 segment dedup finds nothing to drop
    val fixed = HygieneOps.segmentDedup(docs, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(fixed(1L) == 0L && fixed(2L) == 0L, fixed)
  }

  test("snapshot merge: missing-id delete no-ops, upsert replaces once, diff round-trips") {
    import spark.implicits._
    val old = Seq((1L, "s", "a"), (2L, "s", "b"), (3L, "s", "c"))
      .toDF("doc_id", "source", "text")
    val ups = Seq((2L, "s", "b2"), (9L, "s", "new"))
      .toDF("doc_id", "source", "text")
    val dels = Seq(3L, 77L).toDF("doc_id")
    val merged = HygieneOps.mergeChangeSet(old, ups, dels)
    val rows = merged.collect()
      .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2"), (9L, "new")), rows)
    val diff = HygieneOps.corpusDiff(old, merged).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(diff.toSeq == Seq((1L, 1L, 1L, 1L)), diff.toSeq)
  }

  test("q171: no under-k cell is released and the residual conserves every count") {
    // planted cells: (s1,en)=5 released at k=5; (s1,de)=2 + (s1,fr)=1
    // roll into one residual (3 docs, 2 cells); (s2,en)=4 suppressed
    // alone — its residual stays under k, which is allowed (it is not
    // a released cell: it names no lang)
    val docs = (
      (1 to 5).map(i => (i.toLong, "s1", "en", "a b")) ++
      Seq((6L, "s1", "de", "c"), (7L, "s1", "de", "d e f"), (8L, "s1", "fr", "g")) ++
      (9 to 12).map(i => (i.toLong, "s2", "en", "h i"))
    ).toDF("doc_id", "source", "lang", "text")
    val out = HygieneOps.kAnonRelease(docs, 5L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === Map(
      ("s1", "en") -> ((5L, 10L, 1L)),
      ("s1", "__suppressed__") -> ((3L, 5L, 2L)),
      ("s2", "__suppressed__") -> ((4L, 8L, 1L))))
    // conservation: released + residual doc/token mass == corpus mass
    assert(out.values.map(_._1).sum === 12L)
    assert(out.values.map(_._2).sum === 23L)
    // no released CELL (a row naming a real lang) is under k
    assert(out.collect { case ((_, l), v) if l != "__suppressed__" => v._1 }
      .forall(_ >= 5L))
  }

  test("q179: quarantine flags malformed and field-missing JSON; conservation holds") {
    val rows = Seq(
      (1L, """{"k": 7}"""),      // valid
      (2L, """{{"k": 7}"""),     // malformed from byte 0
      (3L, """{"other": 1}"""),  // parses, required field absent
      (4L, """not json at all""")
    ).toDF("id", "p")
    val out = HygieneOps.jsonFlagged(rows, $"p", "k INT")
      .select($"id", $"is_valid").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // gate-shape conservation on the real fixture
    val acct = HygieneOps.q179JsonQuarantine(spark, "/root/testdata/sf0.001")
      .collect()
    assert(acct.nonEmpty)
    acct.foreach { r =>
      assert(r.getAs[Long]("n_valid") + r.getAs[Long]("n_quarantined") ===
        r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_quarantined") > 0, "planted corruption missing")
    }
  }

  test("q224: checksum is order-independent and any single-row mutation moves it") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("doc_id"), col("text"), col("lang"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      HygieneOps.tableChecksum(df, col("source"),
          concat_ws("|", col("doc_id"), col("text"), col("lang")))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("xor_fold"),
            r.getAs[Long]("sum_fold")))).toMap
    val base = sums(docs)
    // order independence: a reshuffled copy folds identically
    assert(sums(docs.repartition(13)) === base)
    // sensitivity: flip one row's lang
    val mutated = docs.withColumn("lang",
      when(col("doc_id") === 0L, lit("__flip__")).otherwise(col("lang")))
    val mut = sums(mutated)
    assert(mut !== base)
    // only the mutated row's group moved
    assert(base.count { case (k, v) => mut(k) != v } === 1)
  }

  test("q239: the healthy corpus audits clean; planted breakage moves the counts") {
    import spark.implicits._
    val out = HygieneOps.q239ConstraintAudit(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations")))).toMap
    assert(out.size === 5)
    out.foreach { case (name, (n, v)) =>
      assert(n > 0L, s"$name checked nothing")
      assert(v === 0L, s"$name: unexpected violations on healthy data")
    }
    // plant: two negative prices trip the predicate check
    val dirty = Seq((1L, -5.0), (2L, 10.0), (3L, -0.5))
      .toDF("o_orderkey", "o_totalprice")
    val planted = HygieneOps.constraintCounts(
      dirty, "price_positive", col("o_totalprice") <= 0).collect().head
    assert(planted.getAs[Long]("n_violations") === 2L)
    // plant: an orphan key trips the referential check
    val fact = Seq(1L, 2L, 99L).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val ref = HygieneOps.referentialViolations(
      fact, col("k"), dim, col("dk"), "fk").collect().head
    assert(ref.getAs[Long]("n_violations") === 1L)
  }

  test("q247: deletion conserves rows per table and leaves zero residue") {
    val out = HygieneOps.q247ForgetUsers(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_removed") + r.getAs[Long]("n_after") ===
        r.getAs[Long]("n_before"), r.getAs[String]("table_name"))
      assert(r.getAs[Long]("n_residue") === 0L)
    }
    // the forget-set is non-empty, so events must actually shrink
    assert(out.find(_.getAs[String]("table_name") == "events").get
      .getAs[Long]("n_removed") > 0L)
  }

  test("q248: tokenization is total, deterministic, and collision-free here") {
    val out = HygieneOps.q248Pseudonymize(spark, "/root/testdata/sf0.001")
      .collect()
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val nUsersWithOrders = ev.select(col("user_id")).distinct()
      .join(graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
        .select(col("o_custkey").as("user_id")).distinct(), "user_id")
      .count()
    // one token row per user that has both events and orders — a
    // collision would merge rows, a non-deterministic token would drop
    assert(out.length.toLong === nUsersWithOrders)
    assert(out.map(_.getAs[String]("token")).distinct.length === out.length)
  }
}
