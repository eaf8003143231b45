// Minimal probe: does repartition(n, col) under a self-join survive
// logical optimization? Scratch tool.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object RepartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = spark.range(1000).toDF("x")
      .select(($"x" % 7).as("b"), $"x".as("u"))
      .localCheckpoint(false)
    val dim = spark.range(200000).toDF("y")
      .select(($"y" % 7).as("b")).groupBy($"b")
      .agg(count(lit(1)).as("occ")).filter($"occ" >= 0).select($"b")
    val ku = base.join(dim, "b").repartition(4, $"b")
    val j = ku.as("l").join(ku.as("r"),
        col("l.b") === col("r.b") && col("l.u") < col("r.u"))
      .groupBy(col("l.u").as("a"), col("r.u").as("c"))
      .agg(count(lit(1)).as("w"))
      .filter($"w" >= 3)
    println("== optimized ==")
    println(j.queryExecution.optimizedPlan.toString.take(2000))
    println("== physical ==")
    println(j.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
