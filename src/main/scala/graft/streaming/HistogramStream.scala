package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SketchOps
import graft.syntax._

/** Streaming-maintained EXACT token-histogram store — the q159 sum
  * monoid kept current by the ingest stream itself: each micro-batch
  * writes its own histogram SHARD (one `btag=batch_N` partition,
  * histogram-sized — value domain × sources rows, corpus-size-free),
  * the read is a sum-merge over live shards, and a compaction folds
  * accumulated shards into one.
  *
  * The store discipline deliberately differs from the signature store
  * ([[DocumentStream.compactSigStore]]) because the MERGE MONOID
  * differs: signature rows are idempotent under duplication (probes
  * `distinct()` them), so that store tolerates transient duplication in
  * its crash windows. Histogram counts SUM — a transiently duplicated
  * shard double-counts — so this store adds a manifest COMMIT POINT:
  * the set of live tags lives in a versioned `_tags-N` file and every
  * state change commits by renaming a fresh manifest version into place
  * (atomic on HDFS-like filesystems; readers take the highest N).
  * Shard data dirs not named by the live manifest are invisible to
  * readers and swept by the next compaction, so every crash window
  * leaves a store that reads EXACTLY the committed counts:
  *
  *  - append crash between shard write and manifest commit → the shard
  *    dir exists but is unlisted; the replayed batch overwrites it
  *    (dynamic partition overwrite keyed by the batch tag) and then
  *    commits — never a double count;
  *  - compact crash between the folded-shard rename and the manifest
  *    commit → the folded dir is unlisted, the old manifest still
  *    names the old shards — reads unchanged;
  *  - compact crash after the manifest commit → reads see exactly the
  *    folded shard; stale old dirs are unlisted and swept later.
  *
  * At 100 TB the stream pays one histogram aggregate per batch (the
  * batch's own rows, map-side combinable) and the artifact stays
  * value-domain-sized forever; length-distribution monitoring reads the
  * store, never the corpus — the streaming complement of q159's
  * per-release batch artifacts.
  *
  * SINGLE-WRITER store: one streaming query (or one compaction) owns a
  * store root at a time — the same ownership contract as the signature
  * store. The manifest commit is a read-modify-write, so two concurrent
  * writers could each publish a manifest that omits the other's tag;
  * readers racing a writer are always safe (they see the last committed
  * manifest), it is only concurrent WRITERS that must be externally
  * serialized.
  */
object HistogramStream {

  private def fsOf(spark: SparkSession, store: String) =
    new Path(store).getFileSystem(spark.sessionState.newHadoopConf())

  private val ManifestRe = raw"_tags-(\d+)".r

  private def manifestVersions(spark: SparkSession, store: String): Seq[(Long, Path)] = {
    val fs = fsOf(spark, store)
    val root = new Path(store)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ManifestRe(n) => Some(n.toLong -> st.getPath)
        case _ => None
      }
    }.sortBy(_._1)
  }

  /** Live shard tags — the committed state. Metadata-only: one listing
    * plus one small-file read, zero Spark jobs. */
  def liveTags(spark: SparkSession, store: String): Seq[String] = {
    val versions = manifestVersions(spark, store)
    if (versions.isEmpty) Seq.empty
    else {
      val fs = fsOf(spark, store)
      val in = fs.open(versions.last._2)
      try {
        val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
      } finally in.close()
    }
  }

  /** Commit a new live-tag set: stage a dot-prefixed temp file, rename
    * it to the next `_tags-N` — the rename is the commit point. Older
    * manifest versions are deleted best-effort (readers always take the
    * highest N, so a failed delete only leaves harmless history). */
  private def commitTags(spark: SparkSession, store: String, tags: Seq[String]): Unit = {
    val fs = fsOf(spark, store)
    val versions = manifestVersions(spark, store)
    val next = versions.lastOption.map(_._1 + 1).getOrElse(0L)
    val tmp = new Path(s"$store/._tags-staging")
    val out = fs.create(tmp, true)
    try out.write(tags.distinct.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(s"$store/_tags-$next")
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(
        s"histogram store manifest commit failed: $tmp -> $dst")
    versions.foreach { case (_, p) => fs.delete(p, false) }
  }

  /** The generic sum-monoid shard core: every store whose merge is a
    * key-wise SUM (token histogram, Count-Min counters) shares the
    * shard/manifest/fold discipline verbatim — only the key columns,
    * the value column, and the empty-store schema differ. `cols` is
    * keys :+ value; `empty` supplies a well-typed zero-row frame. */
  private def appendSumShard(spark: SparkSession, store: String, tag: String,
      frame: DataFrame, cols: Seq[String]): Unit = {
    frame.select(cols.map(col): _*).withColumn("btag", lit(tag))
      .coalesce(1).sortWithinPartitions(cols.dropRight(1).map(col): _*)
      .write.partitionBy("btag")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$store/data")
    val live = liveTags(spark, store)
    if (!live.contains(tag)) commitTags(spark, store, live :+ tag)
  }

  /** The shard MERGE, parameterized: sum for the count monoids
    * (histogram, CMS, log-histogram), bitwise OR for Bloom. OR is also
    * idempotent, so the Bloom rider would tolerate transient shard
    * duplication — it inherits the manifest discipline anyway because
    * the machinery is shared and the stricter contract costs nothing. */
  private def readSumStore(spark: SparkSession, store: String,
      cols: Seq[String], empty: => DataFrame,
      merge: String => Column = n => sum(col(n))): DataFrame = {
    val live = liveTags(spark, store)
    if (live.isEmpty) empty
    else
      spark.read.parquet(s"$store/data")
        .filter($"btag".isin(live: _*))
        .groupBy(cols.dropRight(1).map(col): _*)
        .agg(merge(cols.last).as(cols.last))
  }

  private def compactSumStore(spark: SparkSession, store: String,
      cols: Seq[String], empty: => DataFrame,
      merge: String => Column = n => sum(col(n))): Unit = {
    val live = liveTags(spark, store)
    if (live.size <= 1) return
    val fs = fsOf(spark, store)
    val FoldRe = raw"folded-(\d+)".r
    val dataDir = new Path(s"$store/data")
    val existingTags =
      if (!fs.exists(dataDir)) Seq.empty
      else fs.listStatus(dataDir).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("btag="))
        .map(_.stripPrefix("btag="))
    val next = "folded-" + (existingTags.collect {
      case FoldRe(n) => n.toLong }.foldLeft(-1L)(_ max _) + 1)
    val staging = s"$store/.fold-staging"
    fs.delete(new Path(staging), true) // stale crash residue
    readSumStore(spark, store, cols, empty, merge).withColumn("btag", lit(next))
      .coalesce(1).sortWithinPartitions(cols.dropRight(1).map(col): _*)
      .write.partitionBy("btag").parquet(staging)
    val src = new Path(s"$staging/btag=$next")
    val dst = new Path(s"$store/data/btag=$next")
    if (!fs.rename(src, dst))
      throw new IllegalStateException(
        s"sum store fold rename failed: $src -> $dst — manifest " +
          "untouched, store still reads the unfolded shards; re-run")
    commitTags(spark, store, Seq(next)) // the commit point
    fs.delete(new Path(staging), true)
    // sweep everything the manifest no longer names (incl. crash residue)
    existingTags.filterNot(_ == next).foreach { t =>
      fs.delete(new Path(s"$store/data/btag=$t"), true)
    }
  }

  private val HistCols = Seq("source", "tok_n", "c")

  private def histEmpty(spark: SparkSession): DataFrame =
    spark.range(0).select(lit("").as("source"), lit(0L).as("tok_n"),
      lit(0L).as("c")).filter(lit(false))

  /** Append one micro-batch's histogram as the shard `tag`. Idempotent
    * under replay: the shard write is a dynamic partition OVERWRITE of
    * this tag's own directory, and re-committing an already-live tag is
    * a manifest no-op — the foreachBatch exactly-once recipe applied to
    * a non-idempotent monoid. */
  def appendShard(spark: SparkSession, store: String, tag: String,
      hist: DataFrame): Unit =
    appendSumShard(spark, store, tag, hist, HistCols)

  /** The store's current histogram: sum-merge over the LIVE shards only
    * (partition filter on `btag`, so unlisted crash-residue dirs are
    * never even read). Empty store → empty frame with the histogram
    * schema. */
  def readHistogram(spark: SparkSession, store: String): DataFrame =
    readSumStore(spark, store, HistCols, histEmpty(spark))

  /** Fold all live shards into one `folded-N` shard. The manifest
    * commit is the atomic cutover; old shard dirs (and any unlisted
    * crash residue) are swept afterwards. Already-consolidated stores
    * return after the metadata check alone — zero Spark jobs. */
  def compact(spark: SparkSession, store: String): Unit =
    compactSumStore(spark, store, HistCols, histEmpty(spark))

  // ----------------------------------------------------- CMS twin (q170)

  /** Count-Min counters share the histogram's sum monoid, so the
    * streaming CMS store is the SAME shard/manifest/fold discipline
    * over (row, pos, n) — each micro-batch appends its own d×w-bounded
    * counter shard, the read sum-merges live shards (≡
    * [[graft.operators.SketchOps.mergeCms]] over the shard frames),
    * and a fold consolidates. State per shard is ≤ d×w counters no
    * matter the batch, so a stream can maintain corpus-lifetime
    * frequency sketches with bounded storage forever — the streaming
    * complement of q166's per-release batch artifacts. `row` keeps
    * [[graft.operators.SketchOps.buildCms]]'s integer type so store
    * reads union/join cleanly with freshly built sketches. */
  private val CmsCols = Seq("row", "pos", "n")

  private def cmsEmpty(spark: SparkSession): DataFrame =
    spark.range(0).select(lit(0).as("row"), lit(0L).as("pos"),
      lit(0L).as("n")).filter(lit(false))

  def appendCmsShard(spark: SparkSession, store: String, tag: String,
      cms: DataFrame): Unit =
    appendSumShard(spark, store, tag, cms, CmsCols)

  def readCmsStore(spark: SparkSession, store: String): DataFrame =
    readSumStore(spark, store, CmsCols, cmsEmpty(spark))

  def compactCms(spark: SparkSession, store: String): Unit =
    compactSumStore(spark, store, CmsCols, cmsEmpty(spark))

  // ----------------------------------------------- Bloom twin (q178)

  /** Bloom filters are the OR-monoid rider: a stream appends its
    * per-batch membership sketch and the read is a word-wise OR over
    * live shards — streaming-maintained incremental-dedup history
    * (q157's artifact kept current by ingest itself). Each shard is ≤
    * mBits/64 rows forever. */
  private val BloomCols = Seq("word", "bits")

  private def bloomMerge(n: String): Column = expr(s"bit_or($n)")

  private def bloomEmpty(spark: SparkSession): DataFrame =
    spark.range(0).select(lit(0L).as("word"), lit(0L).as("bits"))
      .filter(lit(false))

  def appendBloomShard(spark: SparkSession, store: String, tag: String,
      bloom: DataFrame): Unit =
    appendSumShard(spark, store, tag, bloom, BloomCols)

  def readBloomStore(spark: SparkSession, store: String): DataFrame =
    readSumStore(spark, store, BloomCols, bloomEmpty(spark), bloomMerge)

  def compactBloom(spark: SparkSession, store: String): Unit =
    compactSumStore(spark, store, BloomCols, bloomEmpty(spark), bloomMerge)

  // ---------------------------------------- log-histogram twin (q172)

  /** The log-bucket histogram ([[graft.operators.SketchOps.logHistogram]])
    * is the third sum-monoid rider on the same core: a stream can keep
    * size/latency quantile state current in ≤ ~992-buckets-per-key
    * shards — the unbounded-value-domain complement of the exact token
    * histogram stream, at the same crash-safety contract. */
  private val LogHistCols = Seq("source", "bucket", "c")

  private def logHistEmpty(spark: SparkSession): DataFrame =
    spark.range(0).select(lit("").as("source"), lit(0L).as("bucket"),
      lit(0L).as("c")).filter(lit(false))

  def appendLogHistShard(spark: SparkSession, store: String, tag: String,
      hist: DataFrame): Unit =
    appendSumShard(spark, store, tag, hist, LogHistCols)

  def readLogHistStore(spark: SparkSession, store: String): DataFrame =
    readSumStore(spark, store, LogHistCols, logHistEmpty(spark))

  def compactLogHist(spark: SparkSession, store: String): Unit =
    compactSumStore(spark, store, LogHistCols, logHistEmpty(spark))

  // ------------------------------------------------ first-seen registry

  /** FIRST-SEEN REGISTRY — the fourth monoid on the shard core: per
    * fingerprint, the minimum doc_id ever seen with it. min() is
    * associative, commutative, and IDEMPOTENT (like the Bloom OR), so
    * shard duplication in a crash window could never corrupt it — it
    * inherits the stricter manifest contract anyway because the
    * machinery is shared. This is the store that gives ingest a STABLE
    * CANONICAL ID: however batches arrive, interleave, or replay, a
    * fingerprint's canonical id is the globally smallest doc that ever
    * carried it — so streaming dedup-at-ingest assigns the same
    * survivor a one-shot batch job would (q191's gate). Registry
    * cardinality = distinct fingerprints (the dedup history itself);
    * reads partition-filter to live tags like every rider. */
  private val RegCols = Seq("ahash", "first_id")

  private def regEmpty(spark: SparkSession): DataFrame =
    spark.range(0).select(lit(0L).as("ahash"), lit(0L).as("first_id"))
      .filter(lit(false))

  def appendRegistryShard(spark: SparkSession, store: String, tag: String,
      reg: DataFrame): Unit =
    appendSumShard(spark, store, tag, reg, RegCols)

  def readRegistry(spark: SparkSession, store: String): DataFrame =
    readSumStore(spark, store, RegCols, regEmpty(spark),
      n => min(col(n)))

  def compactRegistry(spark: SparkSession, store: String): Unit =
    compactSumStore(spark, store, RegCols, regEmpty(spark),
      n => min(col(n)))

  /** Streaming wrapper: documents arriving under `srcDir` are PNG-
    * fingerprinted per micro-batch (the q184 aHash over the real
    * codec) and their (ahash, min doc_id) shard joins the registry —
    * perceptual dedup history maintained by ingest itself. */
  def imageRegistryStream(
      spark: SparkSession, srcDir: String, store: String,
      checkpointDir: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.MultimodalOps
    val schema = spark.read
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true").parquet(srcDir).schema
    val writer = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendRegistryShard(spark, store, s"batch_$batchId",
          MultimodalOps.fingerprints(batch)
            .groupBy($"ahash").agg(min($"doc_id").as("first_id")))
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** The streaming wrapper: documents arriving under `srcDir` fold
    * their token histogram into the store per micro-batch. Same
    * checkpoint contract as [[DocumentStream.nearDupDedupedStream]]:
    * production callers pass `checkpointDir` so batch ids (and with
    * them the replay idempotency of [[appendShard]]) survive restarts. */
  def tokenHistogramStream(
      spark: SparkSession, srcDir: String, store: String,
      checkpointDir: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true").parquet(srcDir).schema
    val writer = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendShard(spark, store, s"batch_$batchId",
          SketchOps.tokenHistogram(batch))
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** The CMS streaming wrapper: documents arriving under `srcDir` fold
    * their shingle Count-Min counters into the store per micro-batch —
    * same foreachBatch/checkpoint contract as [[tokenHistogramStream]],
    * same replay idempotency from [[appendCmsShard]]'s tag-keyed
    * overwrite. */
  def shingleCmsStream(
      spark: SparkSession, srcDir: String, store: String,
      checkpointDir: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{SketchOps, TextOps}
    val schema = spark.read
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true").parquet(srcDir).schema
    val writer = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendCmsShard(spark, store, s"batch_$batchId",
          SketchOps.buildCms(
            batch.select(explode(TextOps.shingles($"text")).as("g")), $"g"))
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
