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

  /** NEAR-dup dedup of one arriving batch against the persistent
    * signature store — the streaming face of the MinHash+LSH pipeline:
    * the batch is signed ([[graft.operators.TextOps.signatureFrame]]),
    * band-probed against store ∪ batch
    * ([[graft.operators.TextOps.incrementalNearDupPairs]] — work scales
    * with the BATCH, not history), and every batch doc verified-similar
    * to an earlier doc is dropped; survivors' signatures append to the
    * store, so the store stays survivor-only (the canonical
    * representatives). Append invariant (the novelty-index discipline):
    * batch doc_ids exceed every stored id, so the later end of a
    * canonical (id_a < id_b) pair is always the incoming duplicate.
    *
    * Dedup-vs-survivors note: a chain a~b, b~c, a≁c keeps c (b was
    * dropped and never entered the store) where a one-shot batch dedup
    * would drop it — survivor-set dedup is the standard streaming
    * semantics, and for clique-shaped duplicate groups (exact/near
    * twins) the two agree (StreamingSpec pins this parity). */
  def nearDupDedupBatch(
      batch: DataFrame, sigStore: String, threshold: Double): DataFrame = {
    import graft.operators.TextOps
    val spark = batch.sparkSession
    // batch-sized; checkpointed because it is consumed three times
    val newSigs = TextOps.signatureFrame(batch).localCheckpoint()
    val existing =
      try spark.read.parquet(sigStore)
      catch { case _: org.apache.spark.sql.AnalysisException => null }
    val all =
      if (existing == null) newSigs else existing.unionByName(newSigs)
    val dupIds = TextOps.incrementalNearDupPairs(newSigs, all, threshold)
      .select(col("id_b").as("doc_id")).distinct()
    val survivors = batch.join(dupIds, Seq("doc_id"), "left_anti")
    newSigs.join(dupIds, Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(sigStore)
    survivors
  }

  /** The streaming wrapper: documents arriving under `srcDir` flow
    * through [[nearDupDedupBatch]] per micro-batch (`foreachBatch` —
    * the incremental-artifact pattern, same as ObservationStream's
    * update loop); survivors append to `outDir`. */
  def nearDupDedupedStream(
      spark: SparkSession, srcDir: String, sigStore: String, outDir: String,
      threshold: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read
      .option("recursiveFileLookup", "true").parquet(srcDir).schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        nearDupDedupBatch(batch, sigStore, threshold)
          .write.mode("append").parquet(outDir)
      }
      .start()
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
