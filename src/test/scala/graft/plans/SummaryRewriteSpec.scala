package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.syntax._

/** Soundness laws of the summary-table rewrite: it fires only on the
  * exact rollup-derivable shape, refuses every semantics-changing
  * variant, and the rewritten answer equals the fact-table answer for
  * every coarsening of the summary keys.
  */
class SummaryRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  lazy val mv: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-mvspec")
      .toString + "/mv"
    SummaryRewrite.buildSummary(spark, s"$dir/documents.parquet",
      keys = Seq("source", "lang"), sumCols = Seq("n_chars"), mvPath = p)
    SummaryRewrite.install(spark)
    p
  }

  private def withSummary[T](body: => T): T = {
    SummaryRewrite.register("spec_mv",
      SummaryRewrite.Summary("documents.parquet", mv, Set("source", "lang")))
    try body finally SummaryRewrite.deregister("spec_mv")
  }

  private def docs: DataFrame =
    graft.Tables.load(spark, dir, "documents")

  private def usesMv(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("graft-mvspec") && !p.contains("documents.parquet")
  }

  test("fires on every coarsening of the summary keys, with exact results") {
    withSummary {
      val groupings = Seq(Seq("source"), Seq("lang"), Seq("source", "lang"))
      groupings.foreach { g =>
        val q = docs.groupBy(g.map(col): _*)
          .agg(count(lit(1)).as("n"), sum($"n_chars").as("sc"))
        assert(usesMv(q), s"rewrite did not fire for grouping $g")
        val direct = spark.read.parquet(s"$dir/documents.parquet")
          .groupBy(g.map(col): _*)
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
        // compare against the UNREGISTERED path: deregister inside
        SummaryRewrite.deregister("spec_mv")
        val expect = direct.collect().map(_.toSeq).toSet
        SummaryRewrite.register("spec_mv",
          SummaryRewrite.Summary("documents.parquet", mv,
            Set("source", "lang")))
        assert(q.collect().map(_.toSeq).toSet === expect, s"grouping $g")
      }
    }
  }

  test("fires on the GLOBAL (no grouping) aggregate — the empty coarsening") {
    withSummary {
      val q = docs.agg(count(lit(1)).as("n"), sum($"n_chars").as("sc"))
      assert(usesMv(q), "global aggregate did not rewrite")
      val got = q.collect().head
      SummaryRewrite.deregister("spec_mv")
      val direct = docs
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("sc"))
        .collect().head
      SummaryRewrite.register("spec_mv",
        SummaryRewrite.Summary("documents.parquet", mv, Set("source", "lang")))
      assert(got.toSeq === direct.toSeq)
    }
  }

  test("refuses filters, non-key groupings, and non-derivable aggregates") {
    withSummary {
      // a filter between scan and aggregate changes the counts
      val filtered = docs.filter($"n_chars" > 100)
        .groupBy($"source").agg(count(lit(1)).as("n"))
      assert(!usesMv(filtered), "filtered aggregate must not rewrite")
      // grouping on a non-key column is not derivable
      val nonKey = docs.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      assert(!usesMv(nonKey), "non-key grouping must not rewrite")
      // avg is not in the measure contract (would need cnt-weighting)
      val avgQ = docs.groupBy($"source").agg(avg($"n_chars").as("a"))
      assert(!usesMv(avgQ), "avg must not rewrite")
      // count(column) skips nulls — not derivable from cnt
      val countCol = docs.groupBy($"source").agg(count($"lang").as("n"))
      assert(!usesMv(countCol), "count(col) must not rewrite")
      // sum of a column the summary does not carry
      val sumOther = docs.groupBy($"source")
        .agg(sum(length($"text")).as("n"))
      assert(!usesMv(sumOther), "unknown measure must not rewrite")
    }
  }

  test("deregistration restores the fact scan") {
    withSummary {
      assert(usesMv(docs.groupBy($"source").agg(count(lit(1)).as("n"))))
    }
    val after = docs.groupBy($"source").agg(count(lit(1)).as("n"))
    assert(!usesMv(after))
  }
}
