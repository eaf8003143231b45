// Raw per-job fixed-cost microbench for the local[32] environment:
// times trivial 1-job actions of various shapes (no-shuffle count,
// 1-exchange groupBy count, broadcast-join count) so the ladder
// analysis can separate scheduler floor from plan work. Scratch tool.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object JobOverhead {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def bench(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm codegen/plan caches
      val t0 = System.nanoTime()
      val n = 20
      (1 to n).foreach(_ => f)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[joboverhead] $label%-46s ${ms}%8.1f ms/action")
    }

    val df1 = spark.range(0, 100, 1, 1).toDF("id")
    val df32 = spark.range(0, 100, 1, 32).toDF("id")
    val small = spark.range(1000).select($"id", ($"id" % 7).as("k"))

    bench("count, 1 partition, no shuffle")(df1.count(): Unit)
    bench("count, 32 partitions, no shuffle")(df32.count(): Unit)
    bench("groupBy count, 1 exchange (AQE)")(
      small.groupBy($"k").count().count(): Unit)
    bench("groupBy x2, 2 exchanges (AQE)")(
      small.groupBy($"k").count().groupBy($"count").count().count(): Unit)
    bench("rdd parallelize count (no SQL)")(
      spark.sparkContext.parallelize(1 to 100, 1).count(): Unit)
    bench("rdd count, 32 partitions (no SQL)")(
      spark.sparkContext.parallelize(1 to 100, 32).count(): Unit)
    bench("planning only (executedPlan, fresh DF)")(
      df1.groupBy($"id").count().queryExecution.executedPlan: Unit)
    bench("broadcast join count")(
      small.join(broadcast(df1.select($"id".as("id2"))), $"id" === $"id2")
        .count(): Unit)
    bench("sort (range exchange)")(
      small.orderBy($"k").count(): Unit)
    val tmp = graft.TempDirs.create("joboverhead").toString
    var i = 0
    bench("parquet write 1k rows (fresh dir)") {
      i += 1
      small.write.mode("overwrite").parquet(s"$tmp/w$i")
    }
    bench("parquet read count (same path)")(
      spark.read.parquet(s"$tmp/w1").count(): Unit)
    bench("fresh read (new DataFrame) + count") {
      spark.read.parquet(s"$tmp/w2").count(): Unit
    }
    spark.stop()
  }
}
