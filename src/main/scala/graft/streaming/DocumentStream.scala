package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming document ingest with exact dedup-at-ingest — the streaming
  * face of the batch curation surface: as document batches arrive, drop
  * every document whose content hash has been seen before, so the
  * downstream corpus only ever receives first occurrences.
  *
  * State = the set of seen content hashes (16 B each), partitioned by
  * hash across the state stores — the standard streaming-dedup shape.
  * With an event-time column a watermark bounds the state window
  * (`withWatermark` + `dropDuplicates(hash, ts)`); the documents table
  * carries no timestamp, so state here is the full seen-set (exactly
  * what exact dedup means for an unbounded corpus: the membership
  * structure IS the operator's working set — at 100 TB you shard it by
  * the same hash key across executors, which is what the state-store
  * partitioning does).
  */
object DocumentStream {

  /** The deduped stream: first occurrence of each content hash. */
  def dedupedDocs(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicates("content_hash")
  }

  /** Drain the stream (memory sink) and profile survivors per source —
    * must equal the batch `q17_dedup_exact` distinct counts. */
  def dedupProfile(spark: SparkSession, dir: String): DataFrame = {
    val name = "docdedup_" + UUID.randomUUID().toString.replace("-", "")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try dedupedDocs(spark, dir).writeStream
        .outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
  }
}
