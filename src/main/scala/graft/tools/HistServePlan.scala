// Dumps the SERVED (inner) plan of the q289-class hist-distinct gate:
// the gate's returned frame is a collected LocalRelation, so the
// interesting physical plan — the rewritten aggregate over the
// exploded expression histogram — must be explained directly. Builds
// the same artifact, registers the same summary, explains the same
// query as IndexOps.q289SummaryExprHist. Scratch tool.
// Run: sbt "runMain graft.tools.HistServePlan <outFile>"
package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object HistServePlan {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxMetadataStringLength", "500")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.plans.SummaryRewrite
    val revenueSql = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)" +
      " * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))"
    val tmp = graft.TempDirs.create("histserveplan").toString
    SummaryRewrite.buildSummary(spark, s"$dir/lineitem.parquet",
      keys = Seq("l_returnflag", "l_linestatus"), sumCols = Seq.empty,
      mvPath = s"$tmp/lineitem_rev_hist",
      exprHistCols = Seq("revenue" -> revenueSql),
      histCap = 1 << 22)
    SummaryRewrite.install(spark)
    SummaryRewrite.register("q289_lineitem_rev_hist",
      SummaryRewrite.Summary("lineitem.parquet", s"$tmp/lineitem_rev_hist",
        Set("l_returnflag", "l_linestatus"),
        exprs = Map("revenue" -> revenueSql)))
    try {
      val q = graft.Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag")).agg(
          expr(s"count(DISTINCT $revenueSql)").as("n_uniq_rev"),
          expr(s"median($revenueSql)").as("med_rev"),
          expr(s"percentile($revenueSql, 0.9)").as("p90_rev"),
          expr(s"max($revenueSql)").as("max_rev"),
          count(lit(1)).as("n_items"))
      val formatted = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(out), formatted.getBytes(StandardCharsets.UTF_8))
      println(s"[histserveplan] wrote $out (${formatted.length} chars)")
      q.collect().sortBy(_.getString(0)).foreach(r =>
        println(s"[histserveplan] row: $r"))
    } finally SummaryRewrite.deregister("q289_lineitem_rev_hist")
    spark.stop()
  }
}
