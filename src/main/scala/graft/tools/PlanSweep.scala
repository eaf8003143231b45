// Dev tool: sweep every SparkEntry query's physical plan for scale
// red flags. Run: sbt "runMain graft.tools.PlanSweep"
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanSweep {
  /** First window-spec argument starts with an ordering direction ⇒ the
    * partition-column list is empty ⇒ single-task global sort. */
  def globalWindows(plan: String): Int =
    "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(plan)
      .count(m => m.group(1).contains(" ASC") || m.group(1).contains(" DESC"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, dir)
        val p = df.queryExecution.executedPlan.toString
        val cart = "CartesianProduct".r.findAllIn(p).size
        val gw = globalWindows(p)
        if (cart > 0 || gw > 0)
          println(s"[FLAG] $name cartesian=$cart globalWindows=$gw")
      } catch {
        case e: Throwable => println(s"[ERR] $name: ${e.getMessage}")
      }
    }
    println("[done]")
    spark.stop()
  }
}
