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
      "q67" -> graft.operators.TextOps.q67BloomDecontaminate(spark, dir))) {
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val ex = "Exchange hashpartitioning".r.findAllIn(p).size
      val bc = "BroadcastHashJoin".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      println(s"[$name] exchanges=$ex broadcastJoins=$bc sortMergeJoins=$smj")
    }
    spark.stop()
  }
}
