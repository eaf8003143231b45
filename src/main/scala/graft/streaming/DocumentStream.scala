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
    * signature store — the streaming face of the MinHash+LSH pipeline.
    * The batch is signed ([[graft.operators.TextOps.signatureFrame]])
    * and band-probed against store ∪ batch
    * ([[graft.operators.TextOps.incrementalNearDupPairs]] — work scales
    * with the BATCH, not history); survivor selection then runs as
    * connected components over the pairs
    * ([[graft.operators.TextOps.clusterMembersFromPairs]], the q51/q73
    * batch discipline) with TRANSITIVE representative resolution: the
    * store keeps a signature row for EVERY document ever seen, each
    * carrying `rep` — the id of its surviving representative (self for
    * survivors) — so a chain a~b, b~c, a≁c drops both b and c no matter
    * how the three split across batches: c matches the STORED signature
    * of the dropped b and inherits b's rep a. Representative choice is
    * SURVIVOR-STABLE: a component containing any already-stored member
    * resolves to the oldest STORED representative — an emitted survivor
    * is final, and a later arrival (whatever its id) can never displace
    * one; min id is only the tie-break among brand-new docs, so no id
    * ordering across batches is assumed. Store size is one row per
    * document seen — the same working-set law as exact streaming dedup,
    * sharded by the store's parquet layout.
    *
    * `batchTag` (the streaming path) makes the signature write
    * IDEMPOTENT: each micro-batch overwrites its own
    * `sigStore/batch_<id>` subdirectory, so a replay after a mid-batch
    * failure rewrites identical files instead of appending duplicates.
    * Batch callers (no tag) append to the store root. */
  def nearDupDedupBatch(
      batch: DataFrame, sigStore: String, threshold: Double,
      batchTag: Option[String] = None): DataFrame = {
    import graft.operators.TextOps
    val spark = batch.sparkSession
    // batch-sized; checkpointed because it is consumed three times
    val newSigs = TextOps.signatureFrame(batch).localCheckpoint()
    val existing =
      try spark.read.option("recursiveFileLookup", "true").parquet(sigStore)
      catch { case _: org.apache.spark.sql.AnalysisException => null }
    val all =
      if (existing == null) newSigs
      else existing.drop("rep").unionByName(newSigs)
    val pairs = TextOps.incrementalNearDupPairs(newSigs, all, threshold)
    val members = TextOps.clusterMembersFromPairs(pairs)
    // transitive resolution: each member's candidate rep is its STORED
    // rep (history dups point at their survivor) or itself. The
    // component rep PREFERS stored candidates (survivor stability),
    // falling back to the min new id only for all-new components.
    val r0 =
      if (existing == null)
        members.select(col("doc_id"), col("cluster_id"),
          col("doc_id").as("r0"), lit(false).as("in_store"))
      else members
        .join(existing.select(col("doc_id"), col("rep")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id"),
          coalesce(col("rep"), col("doc_id")).as("r0"),
          col("rep").isNotNull.as("in_store"))
    val reps = r0.groupBy(col("cluster_id")).agg(
      coalesce(min(when(col("in_store"), col("r0"))), min(col("r0")))
        .as("final_rep"))
    val assign = r0.join(reps, "cluster_id")
      .select(col("doc_id"), col("final_rep"))
      .localCheckpoint() // consumed by dupIds AND the store write
    val dupIds = assign.filter(col("doc_id") =!= col("final_rep"))
      .select(col("doc_id"))
    val survivors = batch.join(dupIds, Seq("doc_id"), "left_anti")
    val sigOut = newSigs.join(assign, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("final_rep"), col("doc_id")))
      .drop("final_rep")
    batchTag match {
      case Some(tag) =>
        sigOut.write.mode("overwrite").parquet(s"$sigStore/$tag")
      case None =>
        sigOut.write.mode("append").parquet(sigStore)
    }
    survivors
  }

  /** The streaming wrapper: documents arriving under `srcDir` flow
    * through [[nearDupDedupBatch]] per micro-batch (`foreachBatch` —
    * the incremental-artifact pattern, same as ObservationStream's
    * update loop). Both sinks are batch-scoped OVERWRITES keyed by the
    * micro-batch id, so post-failure replays are idempotent — the
    * foreachBatch exactly-once recipe. Production callers MUST pass
    * `checkpointDir`: batch-id idempotency only survives a query
    * restart when the batch ids themselves do, and without a durable
    * checkpoint a restarted query renumbers from 0 and reprocesses
    * every input (temp-checkpoint default kept for tests/exploration). */
  def nearDupDedupedStream(
      spark: SparkSession, srcDir: String, sigStore: String, outDir: String,
      threshold: Double = 0.8,
      checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    // probe with the SAME options as the stream read — a stray
    // non-parquet file must not break schema inference when the glob
    // would have excluded it from the stream anyway
    val schema = spark.read
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true").parquet(srcDir).schema
    val writer = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupDedupBatch(batch, sigStore, threshold, Some(s"batch_$batchId"))
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
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
