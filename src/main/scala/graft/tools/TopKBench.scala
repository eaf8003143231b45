package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmark: the native heap top-k operator vs Spark's
  * sort-based WindowGroupLimit path, on the same synthetic grouped
  * table. Run:
  * {{{ sbt "runMain graft.tools.TopKBench" }}} */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.plans.TopKPerKey.install(spark)

    // 10M rows × ~200-byte payload, 2k keys: the sort-based path must
    // buffer (and at executor-memory pressure, spill) every payload in
    // the sort; the heap path holds k rows per key, period
    val df = spark.range(10000000L)
      .select(
        (col("id") % 2000).as("key"),
        col("id"),
        ((col("id") * 2654435761L) % 1000000L).as("score"),
        repeat(concat(lit("p"), (col("id") % 97).cast("string")), 64).as("payload"))
      .cache()
    df.count()

    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once (codegen compile), then min of 3
    def run(native: Boolean): Double = {
      val q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
      val out = if (native) q.select($"key", $"id", $"score", $"payload") // rewrite fires
        else q // rank kept → sort-based WindowGroupLimit path
      val times = (0 until 3).map(_ => timed(out.count())._2)
      val plan = out.queryExecution.executedPlan.toString
      require(plan.contains("TopKPerKey") == native, plan)
      times.min
    }
    run(native = true); run(native = false) // warmup
    val heap = run(native = true)
    val sort = run(native = false)
    println(f"""{"native_heap_sec":$heap%.2f,"window_sort_sec":$sort%.2f,"speedup":${sort / heap}%.2f}""")
    spark.stop()
  }
}
