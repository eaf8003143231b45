package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every query path flows through here — the one place to make the
    // engine's native expressions available on the session (idempotent)
    graft.plans.VectorExpressions.register(spark)
    graft.plans.TopKPerKey.install(spark)
    graft.plans.RangeJoin.install(spark)
    graft.plans.ZOrderExpression.install(spark)
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw long nanos and rebuild a (microsecond)
    * timestamp. Truncation is exact for every whole-second comparison the
    * queries do.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      // integer div, not `/`: Column./ is double division, and int64
      // nanos (~1.7e18) exceed a double's 2^53 integer range — the
      // rounded quotient can land ±1 µs off DuckDB's exact `epoch_us`
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
