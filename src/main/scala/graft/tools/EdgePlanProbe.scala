// Final-AQE-plan probe for the co-engagement edge derivation: builds
// the coEdges-equivalent frame, executes it, prints the FINAL adaptive
// plan — names which exchange the pair-generation join actually ran on
// and at what parallelism. Scratch tool.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object EdgePlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
    val bu = ev.select(
        concat_ws("|", $"event_type",
          expr("unix_timestamp(ts) div 3600").cast("string")).as("b"),
        $"user_id")
      .distinct()
      .localCheckpoint(false)
    val occ = bu.groupBy($"b").agg(count(lit(1)).as("occ"))
    val ranked = occ.select($"b", $"occ",
      row_number().over(Window.orderBy($"occ", $"b")).as("rn"),
      count(lit(1)).over(Window.partitionBy()).as("n"))
    val cap = ranked
      .filter($"rn" === expr("(n * 9 + 9) div 10"))
      .select($"occ".as("cap"))
    val withCap = occ.crossJoin(broadcast(cap))
    val ku = bu.join(withCap.filter($"occ" <= $"cap").select($"b"), "b")
      .repartition(spark.sparkContext.defaultParallelism, $"b")
    val edges = ku.as("l").join(ku.as("r"),
        col("l.b") === col("r.b") && col("l.user_id") < col("r.user_id"))
      .groupBy(col("l.user_id").as("u"), col("r.user_id").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter($"w" >= 3L)
      .select($"u", $"v")
    println("edges = " + edges.count())
    println(edges.queryExecution.executedPlan.toString.take(7000))
    spark.stop()
  }
}
