// Plan audit for round-4 operators — run via sbt "runMain graft.tools.PlanAudit"
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for ((name, df) <- Seq(
      "q73" -> graft.operators.TextOps.q73SurvivorSelect(spark, dir),
      "q75" -> graft.operators.TextOps.q75SourceDivergence(spark, dir),
      "q67" -> graft.operators.TextOps.q67BloomDecontaminate(spark, dir),
      "q91" -> graft.operators.MiningOps.q91Winnowing(spark, dir),
      "q92" -> graft.operators.MiningOps.q92EventFunnel(spark, dir),
      "q93" -> graft.operators.MiningOps.q93TrailingActivity(spark, dir),
      "q95" -> graft.operators.MiningOps.q95PrefixFilterJoin(spark, dir),
      "q98" -> graft.operators.MiningOps.q98SessionTransitions(spark, dir),
      "q99" -> graft.operators.MiningOps.q99RetentionCohorts(spark, dir),
      "q100" -> graft.operators.MiningOps.q100QualityTrim(spark, dir))) {
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val ex = "Exchange hashpartitioning".r.findAllIn(p).size
      val bc = "BroadcastHashJoin".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      val ru = "ReusedExchange".r.findAllIn(p).size
      println(s"[$name] exchanges=$ex broadcastJoins=$bc sortMergeJoins=$smj reused=$ru")
    }
    spark.stop()
  }
}
