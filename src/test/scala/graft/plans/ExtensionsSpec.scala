package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Healpix

/** The `spark.sql.extensions` injection path: a session built with
  * [[GraftExtensions]] exposes the native expressions to plain SQL with
  * no programmatic registration. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=GraftExtensions exposes the native functions to SQL") {
    // force a NEW session: extensions only apply at session creation
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()

    val cell = spark.sql("SELECT healpix_cell(45.0D, 0.0D, 11) AS c").head().getLong(0)
    assert(cell == Healpix.ang2pixLonLat(11, 45.0, 0.0))

    val disc = spark.sql(
      "SELECT size(healpix_disc(45.0D, 0.0D, 10, 0.0023)) AS n").head().getInt(0)
    assert(disc > 0)

    val fc = spark.sql("SELECT float_compress(CAST(1.2345678 AS FLOAT)) AS v")
      .head().getFloat(0)
    assert((java.lang.Float.floatToIntBits(fc) & 0x1fff) == 0)
    assert(math.abs(fc / 1.2345678f - 1) < 0.001)

    val sh = spark.sql("SELECT simhash64('a b c') AS s, simhash64('a b c') AS t").head()
    assert(sh.getLong(0) == sh.getLong(1))
    assert(sh.getLong(0) != 0L)

    // the summary rule is injected too: a registered summary serves a
    // plain SQL aggregate with NO programmatic install() call
    val dir = "/root/testdata/sf0.001"
    val mv = graft.TempDirs.create("extspec")
      .toString + "/extmv"
    SummaryRewrite.buildSummary(spark, s"$dir/documents.parquet",
      keys = Seq("source", "lang"), sumCols = Seq("n_chars"), mvPath = mv)
    SummaryRewrite.register("ext_mv",
      SummaryRewrite.Summary("documents.parquet", mv, Set("source", "lang")))
    try {
      spark.read.parquet(s"$dir/documents.parquet")
        .createOrReplaceTempView("ext_docs")
      def q = spark.sql(
        "SELECT source, count(*) AS n, sum(n_chars) AS sc " +
          "FROM ext_docs GROUP BY source")
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("extmv") && !p.contains("documents.parquet"),
        s"config-injected summary rule did not fire:\n$p")
      SummaryRewrite.deregister("ext_mv")
      val expect = q.collect().map(_.toSeq).toSet
      SummaryRewrite.register("ext_mv",
        SummaryRewrite.Summary("documents.parquet", mv,
          Set("source", "lang")))
      assert(q.collect().map(_.toSeq).toSet === expect)

      // install() on an extension-built session is a NO-OP: the rule is
      // already injected into the optimizer's operator-optimization
      // batch, and adding it to extraOptimizations too would run it
      // twice per optimization pass (a wasted planning pass per query)
      assert(spark.sessionState.optimizer.extendedOperatorOptimizationRules
        .exists(_.isInstanceOf[SummaryRewrite.SummaryRewriteRule]),
        "precondition: the extension did not inject the rule")
      SummaryRewrite.install(spark)
      assert(!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[SummaryRewrite.SummaryRewriteRule]),
        "install() must not double-register the injected rule")
      // and the rewrite still fires through the injected instance alone
      val p2 = q.queryExecution.executedPlan.toString
      assert(p2.contains("extmv") && !p2.contains("documents.parquet"))

      // the hll sketch-partial aggregates are SQL-reachable too: a
      // pure-SQL producer can build register words and fold them, and
      // the fold of per-source partials is BIT-equal to the global
      // partial (the union-monoid law, in SQL)
      val whole = spark.sql(
        "SELECT graft_hll_partial(doc_id, 9) AS w FROM ext_docs")
        .head().getSeq[Long](0)
      assert(whole.nonEmpty, "graft_hll_partial returned no words")
      val folded = spark.sql(
        "WITH p AS (SELECT source, graft_hll_partial(doc_id, 9) AS w " +
          "FROM ext_docs GROUP BY source) " +
          "SELECT graft_hll_merge(w, 9) AS m FROM p")
        .head().getSeq[Long](0)
      assert(folded === whole,
        "merge of per-source register partials must be bit-equal to " +
          "the global partial")
    } finally SummaryRewrite.deregister("ext_mv")
  }
}
