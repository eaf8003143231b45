package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the library). */
object ProbeR12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val q = docs.groupBy($"source").agg(
      countDistinct($"lang").as("nl"),
      countDistinct($"lang", $"source").as("nls"),
      count(lit(1)).as("n"),
      sum($"n_chars").as("sc"))
    println("==== OPTIMIZED (mixed regular + 2 distinct groups) ====")
    println(q.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
