package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ250 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.plans.SummaryRewrite
    val dir = "/root/testdata/sf0.001"
    val mv = java.nio.file.Files.createTempDirectory("graft-explain").toString + "/docs_by_source_lang"
    SummaryRewrite.buildSummary(s, s"$dir/documents.parquet", Seq("source","lang"), Seq("n_chars"), mv)
    SummaryRewrite.install(s)
    SummaryRewrite.register("x", SummaryRewrite.Summary("documents.parquet", mv, Set("source","lang")))
    val q = graft.Tables.load(s, dir, "documents")
      .filter(col("source").isin("src1","src3"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
    q.explain("formatted")
    s.stop()
  }
}
