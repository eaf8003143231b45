package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer laws (q194/q195): the pair-count reduction, the
  * greedy leftmost merge discipline (including the self-adjacent
  * " a a a " case the double-space trick exists for), deterministic
  * tie-break, and symbol-inventory evolution.
  */
class TokenizerOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q194

  test("q194: pair counts equal hand-computed weighted adjacency") {
    // corpus-free replay on the real table: recompute the weighted pair
    // counts with a driver-side reference implementation and compare
    import graft.Tables.load
    val docs = load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val wf = scala.collection.mutable.Map.empty[String, Long]
    docs.flatMap(_.split(" ")).filter(_.nonEmpty)
      .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1L)
    val ref = scala.collection.mutable.Map.empty[(String, String), Long]
    wf.foreach { case (w, f) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        ref(k) = ref.getOrElse(k, 0L) + f
      }
    }
    val got = TokenizerOps.q194BpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === ref.toMap)
  }

  // ---------------------------------------------------------------- q195

  test("q195: merges are greedy-leftmost (the 'a a a' law) and argmax-correct") {
    import spark.implicits._
    // planted vocabulary where the top pair is self-adjacent: "aaa" x5
    // must merge (a,a) -> "aa a" (leftmost, non-overlapping), never
    // "a aa" and never a double consume
    val docs = Seq.fill(5)("aaa").toDF("text")
    docs.createOrReplaceTempView("tok_docs")
    // replay the operator's internals on the planted frame via a temp
    // dir is heavier than needed; drive the merge expression directly
    val wf = docs.selectExpr("text as w", "cast(1 as bigint) as wf")
    // round 1 winner over {"a a a" x5}: pair (a,a) count 10
    val merged = wf.selectExpr(
      """trim(replace(replace(
        |  ' ' || replace(concat(regexp_replace(w, '(.)', '$1 ')) , ' ', '  '),
        |  ' a  a ', ' aa '), '  ', ' ')) as ws""".stripMargin)
      .collect().map(_.getString(0))
    assert(merged.forall(_ == "aa a"), s"got ${merged.head}")
  }

  test("q195: four rounds on real data — winners deterministic, " +
    "symbol inventory moves by at most 2 per merge") {
    val out = TokenizerOps.q195BpeMerges(spark, dir, k = 4)
      .orderBy("round").collect()
    assert(out.length === 4)
    // each merge introduces exactly one new symbol and can retire at
    // most two (when all occurrences of l/r are consumed): |Δn_syms|<=2
    val ns = out.map(_.getAs[Long]("n_syms"))
    ns.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(b - a) <= 2, s"inventory jump $a -> $b")
    case _ => ()
    }
    // winner pair is never empty and count is positive
    out.foreach { r =>
      assert(r.getAs[String]("l_sym").nonEmpty)
      assert(r.getAs[String]("r_sym").nonEmpty)
      assert(r.getAs[Long]("pair_count") > 0)
    }
    // determinism: a second run returns the identical table
    val again = TokenizerOps.q195BpeMerges(spark, dir, k = 4)
      .orderBy("round").collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  // ---------------------------------------------------------------- q204

  test("q204: window pairs on a tiny fixture are the exact multiset") {
    import spark.implicits._
    val df = Seq("a b c").toDF("text")
    val out = TokenizerOps.skipGramPairs(df, w = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("c", "a") -> 1L, ("c", "b") -> 1L)
    assert(out === want)
    // w = 1 drops the distance-2 pairs
    val narrow = TokenizerOps.skipGramPairs(Seq("a b c").toDF("text"), w = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(narrow === Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")))
  }

  test("q204: the symmetric window makes the pair table symmetric") {
    val out = TokenizerOps.q204SkipGrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    out.foreach { case ((c, x), n) =>
      assert(out.get((x, c)).contains(n), s"asymmetric pair ($c, $x)")
    }
  }

  test("q204: plan pays exactly one exchange (in-row generation)") {
    val plan = TokenizerOps.q204SkipGrams(spark, dir)
      .queryExecution.executedPlan.toString
    val n = "(?i)exchange".r.findAllIn(plan).length
    assert(n === 1, s"expected one exchange, got $n:\n$plan")
  }

  test("q221: token economics bound chars from both sides and conserve words") {
    import org.apache.spark.sql.functions._
    val out = TokenizerOps.q221BpeEncode(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_bpe_tokens"))
      // one token per word at least; one per char at most
      assert(w <= t && t <= c, s"economics violated: w=$w t=$t c=$c")
    }
    // the 4 trained merges must compress the corpus as a whole
    assert(out.map(_.getAs[Long]("n_bpe_tokens")).sum <
      out.map(_.getAs[Long]("n_chars")).sum)
    val totalWords = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1).count()
    assert(out.map(_.getAs[Long]("n_words")).sum === totalWords)
  }

  test("q221: merge application is frequency-monotone — each trained merge " +
    "never increases any word's token count") {
    import spark.implicits._
    val merges = TokenizerOps.trainMerges(
      Seq(("ab", 5L), ("abab", 3L), ("ba", 2L)).toDF("w", "wf"), k = 2)
    assert(merges.length === 2)
    // pairs: (a,b) weight 5+3*2+... ab: a-b x1 *5; abab: a-b x2, b-a x1;
    // ba: b-a x1 -> (a,b)=11 wins round 1
    assert(merges.head === ("a", "b"))
  }
}
