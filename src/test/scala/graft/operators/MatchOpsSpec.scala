package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.load

/** Fuzzy-ER, OLS, and Gini laws (q150/q152/q153): the resolver's
  * conservation + planted-confusion behavior, exact-fraction regression
  * on perfectly linear data, and pinned Gini fractions on tiny
  * histograms.
  */
class MatchOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  private def lcg(k: Long): Long = (k % 1000003L) * 2654435761L % 1000003L

  // ---------------------------------------------------------------- q150

  test("q150: every dirty row is correct, wrong, or ambiguous — nothing silent") {
    val out = MatchOps.q150FuzzyEr(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_correct") + r.getAs[Long]("n_wrong") +
        r.getAs[Long]("n_ambiguous") === r.getAs[Long]("n_dirty"),
        s"${r.getAs[String]("true_adj")}: rows unaccounted")
    }
  }

  test("q150: the planted cold→old confusion is the ONLY wrong resolution") {
    val parts = load(spark, dir, "part")
    val out = MatchOps.fuzzyEr(parts).collect()
      .map(r => r.getAs[String]("true_adj") -> r.getAs[Long]("n_wrong")).toMap
    // expected: 'cold' rows whose LCG lands (h%4==0, deletion pos==1)
    // become the clean adjective 'old' (distance 0 beats cold's 1)
    val expectCold = parts.select($"p_partkey", $"p_name").collect().count { r =>
      val h = lcg(r.getLong(0))
      val adj = r.getString(1).split(" ")(0)
      adj == "cold" && h % 4 == 0 && (h / 4) % adj.length == 0
    }.toLong
    assert(out("cold") === expectCold && expectCold > 0L)
    out.filter(_._1 != "cold").foreach { case (a, w) =>
      assert(w === 0L, s"unexpected wrong resolutions for $a")
    }
  }

  test("q150: a tie at minimum distance refuses as ambiguous, never picks") {
    // vocab {cat, bat}: deleting the head of either yields 'at', which
    // is distance 1 from BOTH — must count ambiguous, resolve nothing.
    // Search deterministic partkeys whose LCG plants head-deletion.
    def headDel(adjLen: Int): Long = (1L to 100000L).find { k =>
      lcg(k) % 4 == 0 && (lcg(k) / 4) % adjLen == 0
    }.get
    val kCat = headDel(3)
    val kBat = (kCat + 1 to 100000L).find { k =>
      lcg(k) % 4 == 0 && (lcg(k) / 4) % 3 == 0
    }.get
    val parts = Seq(
      (kCat, "cat gizmo"), (kBat, "bat gizmo"),
      (2L, "cat ring"), (3L, "bat ring")) // clean rows keep the vocab alive
      .toDF("p_partkey", "p_name")
    val out = MatchOps.fuzzyEr(parts).collect()
      .map(r => r.getAs[String]("true_adj") ->
        ((r.getAs[Long]("n_ambiguous"), r.getAs[Long]("n_correct"),
          r.getAs[Long]("n_wrong")))).toMap
    // lcg(2), lcg(3) may or may not be dirty; only assert the planted two
    assert(out("cat")._1 >= 1L || out("bat")._1 >= 1L,
      s"no ambiguity surfaced: $out")
    Seq("cat", "bat").foreach { a =>
      assert(out.get(a).forall(_._3 == 0L), s"$a resolved to the wrong vocab word")
    }
  }

  test("blocked resolver: parity with the cross-join resolver on a large vocabulary") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // deterministic pseudo-word vocabulary, lengths 4..11, many first chars
    def word(seed: Long, len: Int): String = {
      var h = seed
      val sb = new StringBuilder
      for (_ <- 0 until len) {
        h = (h * 2654435761L + 11L) % 1000003L
        sb += ('a' + (h % 26)).toChar
      }
      sb.toString
    }
    val vocabStrs = (1 to 5000).map(i => word(i.toLong, 4 + i % 8)).distinct
    // dirty: every 5th word with one char deleted at a rotating position,
    // plus a planted tie ("aaa" is distance 1 from both aaaa and aaab)
    val dirtyStrs = (vocabStrs.indices.by(5).map { i =>
      val w = vocabStrs(i)
      val p = i % w.length
      w.substring(0, p) + w.substring(p + 1)
    } :+ "aaa").distinct
    val vocabDf = (vocabStrs ++ Seq("aaaa", "aaab")).toDF("clean_str")
    val dirtyDf = dirtyStrs.toDF("dirty_str")

    // completeness law: the blocked candidate set IS the cross-join one
    val blockedCand = MatchOps.blockedCandidates(dirtyDf, vocabDf, 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val crossCand = dirtyDf.crossJoin(vocabDf)
      .withColumn("d", levenshtein($"dirty_str", $"clean_str"))
      .filter($"d" <= 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(blockedCand === crossCand, "blocking lost or invented candidates")
    assert(crossCand.nonEmpty)

    // resolution parity: unique-min winner + refuse-on-tie, byte-identical
    val blocked = MatchOps.fuzzyResolveBlocked(dirtyDf, vocabDf).collect()
      .map(r => r.getAs[String]("dirty_str") ->
        ((Option(r.getAs[String]("resolved")), r.getAs[Boolean]("ambiguous"))))
      .toMap
    val byD = Window.partitionBy($"dirty_str")
    val expected = dirtyDf.crossJoin(vocabDf)
      .withColumn("d", levenshtein($"dirty_str", $"clean_str"))
      .filter($"d" <= 1)
      .withColumn("dmin", min($"d").over(byD)).filter($"d" === $"dmin")
      .groupBy($"dirty_str")
      .agg(count(lit(1)).as("nb"), min($"clean_str").as("best"))
      .collect().map(r => r.getAs[String]("dirty_str") ->
        ((if (r.getAs[Long]("nb") == 1L) Some(r.getAs[String]("best")) else None,
          r.getAs[Long]("nb") > 1L))).toMap
    assert(blocked === expected, "blocked resolution diverged from cross-join")
    // the planted tie refuses
    assert(blocked("aaa") === ((None, true)))

    // degree bound: pairs examined per dirty string <= 6 blocks x the
    // largest clean block (replayed here with the operator's key formula),
    // and far below the vocabulary size the cross join would touch
    val pairs = MatchOps.blockedPairs(dirtyDf, vocabDf, 4)
    val maxDegree = pairs.groupBy($"dirty_str").count()
      .agg(max($"count")).collect().head.getLong(0)
    val maxBlock = vocabDf.distinct()
      .select($"clean_str", expr("length(clean_str) div 4").as("band"),
        explode(array_distinct(array(substring($"clean_str", 1, 1),
          coalesce(nullif(substring($"clean_str", 2, 1), lit("")), lit(" ")))))
          .as("ck"))
      .groupBy($"band", $"ck").count()
      .agg(max($"count")).collect().head.getLong(0)
    assert(maxDegree <= 6L * maxBlock,
      s"degree $maxDegree exceeds 6 x max block $maxBlock")
    assert(maxDegree * 4 < vocabStrs.length,
      s"degree $maxDegree not meaningfully below vocabulary ${vocabStrs.length}")
  }

  // ---------------------------------------------------------------- q152

  test("q152: perfectly linear data yields the exact slope fraction") {
    // y = tokens, x = 3·tokens chars -> slope = 1/3 exactly
    val docs = (1 to 20).map { i =>
      (i.toLong, Seq.fill(i)("w").mkString(" "), "s", 3L * i)
    }.toDF("doc_id", "text", "source", "n_chars")
    val r = MatchOps.olsDrift(docs).collect().head
    val (num, den) = (r.getAs[Long]("slope_num"), r.getAs[Long]("slope_den"))
    assert(num * 3 === den && num > 0L, s"$num/$den is not 1/3")
  }

  test("q152: constant x degenerates to slope_den == 0, not a crash") {
    val docs = Seq((1L, "a b", "s", 7L), (2L, "a b c", "s", 7L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = MatchOps.olsDrift(docs).collect().head
    assert(r.getAs[Long]("slope_den") === 0L)
  }

  // ---------------------------------------------------------------- q153

  test("q153: uniform vocabulary pins gini_num = 0; skew pins 2/8") {
    // counts (1,1): a b -> num 0. counts (1,3): a b b b -> num 2, den 8
    val uniform = Seq((1L, "a b", "u")).toDF("doc_id", "text", "source")
    val ru = MatchOps.tokenGini(uniform).collect().head
    assert(ru.getAs[Long]("gini_num") === 0L)
    val skew = Seq((1L, "a b b b", "s")).toDF("doc_id", "text", "source")
    val rs = MatchOps.tokenGini(skew).collect().head
    assert(rs.getAs[Long]("gini_num") === 2L)
    assert(rs.getAs[Long]("gini_den") === 8L)
  }

  test("q153: gini is permutation-blind and bounded by its denominator") {
    val docs = load(spark, dir, "documents")
    val a = MatchOps.tokenGini(docs).collect()
    val b = MatchOps.tokenGini(docs.repartition(13)).collect().toSet
    assert(a.toSet === b && a.nonEmpty)
    a.foreach { r =>
      val (num, den) = (r.getAs[Long]("gini_num"), r.getAs[Long]("gini_den"))
      assert(num >= 0L && num < den, s"${r.getAs[String]("source")}: $num/$den")
    }
  }

  // ---------------------------------------------------------------- q198

  test("q198: every dirty record lands in exactly one decision class; " +
    "links are all correct; every class is exercised") {
    val out = MatchOps.q198LinkageScore(spark, dir).collect()
      .map(r => r.getAs[String]("decision") ->
        (r.getAs[Long]("n_records"), r.getAs[Long]("n_correct"))).toMap
    val total = graft.Tables.load(spark, dir, "customer").count()
    // conservation: one decision per dirty record, none silently dropped
    assert(out.values.map(_._1).sum === total)
    // the link class must be pure (its threshold exists to make it so)
    val (nLink, nLinkCorrect) = out("link")
    assert(nLink > 0 && nLinkCorrect === nLink)
    // non-vacuity: the planted corruptions exercise the decision space
    assert(out.contains("possible") || out.contains("nonlink"))
    // refusals and blocking misses are accounted classes, never errors
    out.get("ambiguous").foreach { case (_, c) => assert(c === 0L) }
    out.get("nocandidate").foreach { case (_, c) => assert(c === 0L) }
  }

  // ---------------------------------------------------------------- q202

  test("q202: hand-computed tie fixture pins the average-rank arithmetic") {
    // x=[1,2,2,3], y=[5,5,7,9]: 2·avgranks rx=[2,5,5,8], ry=[3,3,6,8]
    // → n=4, num=4·115−20·20=60, den_x=den_y=4·118−400=72 (ρ=5/6)
    val df = Seq((1L, 5L), (2L, 5L), (2L, 7L), (3L, 9L))
      .toDF("x", "y")
      .select(lit("s").as("source"),
        $"x".as("n_chars"),
        // text with exactly y distinct single-char tokens
        concat_ws(" ", sequence(lit(1L), $"y").cast("array<string>")).as("text"))
    val r = MatchOps.spearman(df).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("n") === 4L)
    assert(row.getAs[Long]("num") === 60L)
    assert(row.getAs[Long]("den_x") === 72L)
    assert(row.getAs[Long]("den_y") === 72L)
  }

  test("q202: perfect monotone relation pins rho = 1 exactly") {
    val df = (1 to 20).map(i => (i.toLong, i.toLong)).toDF("x", "y")
      .select(lit("s").as("source"), $"x".as("n_chars"),
        concat_ws(" ", sequence(lit(1L), $"y").cast("array<string>")).as("text"))
    val row = MatchOps.spearman(df).collect()(0)
    assert(row.getAs[Long]("num") === row.getAs[Long]("den_x"))
    assert(row.getAs[Long]("den_x") === row.getAs[Long]("den_y"))
    assert(row.getAs[Long]("num") > 0L)
  }

  test("q202: histogram-first ranks match the corpus-window definition") {
    // independent implementation: avg rank via rank() + peer count
    // windows OVER THE CORPUS — the plan the operator refuses
    import org.apache.spark.sql.expressions.Window
    val docs = load(spark, dir, "documents")
    val d = docs.select($"source", $"n_chars".cast("long").as("x"),
      size(array_distinct(split($"text", " "))).cast("long").as("y"))
    def rk2(c: String) =
      lit(2L) * (org.apache.spark.sql.functions.rank()
        .over(Window.partitionBy($"source").orderBy(col(c))).cast("long") - 1L) +
        count(lit(1)).over(Window.partitionBy($"source", col(c))) + 1L
    val naive = d
      .withColumn("rx", rk2("x")).withColumn("ry", rk2("y"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum($"rx").as("sx"), sum($"ry").as("sy"),
        sum($"rx" * $"rx").as("sxx"), sum($"ry" * $"ry").as("syy"),
        sum($"rx" * $"ry").as("sxy"))
      .select($"source", $"n",
        ($"n" * $"sxy" - $"sx" * $"sy").as("num"),
        ($"n" * $"sxx" - $"sx" * $"sx").as("den_x"),
        ($"n" * $"syy" - $"sy" * $"sy").as("den_y"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("num"),
          r.getAs[Long]("den_x"), r.getAs[Long]("den_y"))).toMap
    val hist = MatchOps.spearman(docs)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("num"),
          r.getAs[Long]("den_x"), r.getAs[Long]("den_y"))).toMap
    assert(hist === naive)
    assert(hist.nonEmpty)
  }

  // ---------------------------------------------------------------- q203

  test("q203: exact independence pins every cell deviation to 0") {
    // every (a, b) combo appears exactly twice -> n = ra*cb/N exactly
    val rows = for { a <- Seq("x", "y"); b <- Seq("p", "q", "r"); _ <- 1 to 2 }
      yield (a, b)
    val df = rows.toDF("lang", "source")
    val out = MatchOps.chiSquare(df, "lang", "source").collect()
    assert(out.length === 6)
    out.foreach(r => assert(r.getAs[Long]("dev_num") === 0L, r.toString))
  }

  test("q203: absent combo is a real zero cell with dev = (ra*cb)^2") {
    // (y, q) never occurs; marginals ra(y)=2, cb(q)=2, N=8
    val df = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("x", "q"),
      ("x", "p"), ("x", "p"), ("y", "p"), ("y", "p")).toDF("lang", "source")
    val out = MatchOps.chiSquare(df, "lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("dev_num"), r.getAs[Long]("den"))).toMap
    assert(out.contains(("y", "q")))
    val (n0, dev0, den0) = out(("y", "q"))
    assert(n0 === 0L)
    assert(den0 === 4L)       // ra=2, cb=2
    assert(dev0 === 16L)      // (8*0 - 4)^2
  }

  test("q203: grid marginals conserve the corpus on real data") {
    val out = MatchOps.q203ChiSquare(spark, dir).collect()
    val nTotal = out.head.getAs[Long]("n_total")
    assert(out.map(_.getAs[Long]("n")).sum === nTotal)
    // each lang's ra equals the sum of its row's cells
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum === rows.head.getAs[Long]("ra"))
    }
  }
}
