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

  /** events.ts has shipped as two physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read as raw long nanos via `nanosAsLong` and
    * rebuild a microsecond timestamp) and plain TIMESTAMP_NTZ micros.
    * Normalize both to a session-zoned TimestampType so every consumer
    * (and the DuckDB oracle, which sees the same instants as naive-UTC)
    * agrees. Truncation is exact for every whole-second comparison the
    * queries do.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Schema-adaptive `ts` normalization shared with the streaming reader. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      // integer div, not `/`: Column./ is double division, and int64
      // nanos (~1.7e18) exceed a double's 2^53 integer range — the
      // rounded quotient can land ±1 µs off DuckDB's exact `epoch_us`
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ wall-clock → instant under the session zone (UTC everywhere
      // we run); DuckDB reads the same column as naive-UTC TIMESTAMP
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
