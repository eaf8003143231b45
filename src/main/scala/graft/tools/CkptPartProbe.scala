// Scratch probe: does a Dataset.localCheckpoint leaf PRESERVE its
// child's HashPartitioning in Spark 4.1 (so a same-key aggregate/join
// above it plans no exchange), and does AQE coalesce the partitioning
// it reports? Decides whether coEdges needs its REPARTITION_BY_NUM pin.
// Run: sbt "runMain graft.tools.CkptPartProbe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 100000).map(i => (i % 997, i)).toDF("b", "x")
      .repartition(13, col("b"))
      .dropDuplicates("b", "x")
    println("=== pre-checkpoint dedup plan (expect: one exchange) ===")
    df.explain()
    val ck = df.localCheckpoint(false)
    println("=== checkpoint leaf partitioning ===")
    println(ck.queryExecution.executedPlan.outputPartitioning)
    println("=== rdd partitions: " + ck.rdd.getNumPartitions)
    val agg = ck.groupBy(col("b")).agg(count(lit(1)).as("n"))
    agg.write.format("noop").mode("overwrite").save()
    println("=== post-checkpoint same-key agg (expect: no exchange if preserved) ===")
    println(agg.queryExecution.executedPlan.toString.take(2000))
    val j = ck.as("l").join(ck.as("r"),
      col("l.b") === col("r.b") && col("l.x") < col("r.x"))
      .groupBy(col("l.x")).agg(count(lit(1)).as("n"))
    j.write.format("noop").mode("overwrite").save()
    println("=== post-checkpoint self-join (expect: no exchange below join if preserved) ===")
    println(j.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
