// Measures the range-join rewrite: the same naive theta join with and
// without RangeJoinRewriteRule installed, at bench scale.
// Run: sbt "runMain graft.tools.RangeJoinBench [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object RangeJoinBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // direct read (no Tables.load: that would install the rule), but
    // through the ts normalizer so both testdata generations work
    // (int64-nanos under nanosAsLong AND TIMESTAMP_NTZ-micros)
    val ev = graft.Tables.normalizeEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("us", unix_micros($"ts"))
    val W = 3600000000L
    def naive() = {
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"us".as("pus"))
      val k = ev.filter($"event_type" === "click").select($"us".as("cus"))
      p.join(k, $"cus" <= $"pus" && $"cus" > $"pus" - W)
        .groupBy($"event_id").agg(count(lit(1)).as("n"))
    }
    def time(tag: String): Long = {
      val t0 = System.nanoTime()
      val df = naive()
      val n = df.count()
      val ms = (System.nanoTime() - t0) / 1000000
      val plan = df.queryExecution.executedPlan.toString
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      println(s"[rjbench] $tag: ${ms}ms rows=$n nestedLoop=$bnlj")
      ms
    }
    val before = time("without-rule(BNLJ)")
    graft.plans.RangeJoin.install(spark)
    val after = time("with-rule(bucketed)")
    println(f"[rjbench] speedup=${before.toDouble / after}%.1fx")
    spark.stop()
  }
}
