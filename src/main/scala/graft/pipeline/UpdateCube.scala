package graft.pipeline

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental update — the analogue of `hisscube.py update`
  * (`hisscube.py:18-80`, `builders_parallel.py`): bring NEW spectra into
  * an existing cube without a from-scratch rebuild. Where the reference
  * deletes and recreates whole HDF5 groups, the Spark-native shape is:
  *
  *  - `spectra`, `cutout_links`, `viz_cube`: per-observation tables →
  *    pure APPEND (a new spectrum adds its own rows and links; nothing
  *    existing changes).
  *  - `ml_cube`: per-target STACKS change when a target gains a spectrum
  *    → re-stack ONLY the affected targets and rewrite only the spatial
  *    buckets that contain them (dynamic partition overwrite on
  *    (zoom, bucket)); every other bucket's files are untouched.
  *
  * At 100 TB this touches O(new data) + O(affected buckets), not the
  * cube: an update of one plate re-reads a few order-3 supercells.
  */
object UpdateCube {

  /** order-15 target healpix → order-3 supercell (2 bits per order). */
  val BucketShift: Int = 2 * (Ingest.SpecHealOrder - 3)

  final case class UpdateSummary(
      newSpectra: Long, newLinks: Long, affectedTargets: Long,
      mlRowsRewritten: Long, vizRowsAppended: Long)

  /** Append `newSpectraDir`'s spectra to the cube at `outDir` and
    * re-stack affected targets. Equivalent to a full rebuild over the
    * union of old and new inputs (asserted in UpdateSpec). */
  def update(
      spark: SparkSession, outDir: String, newSpectraDir: String): UpdateSummary =
    updateWith(spark, outDir, Ingest.spectra(spark, newSpectraDir))

  /** Same, over an already-decoded batch of new spectra — the
    * `foreachBatch` entry the streaming ingest drives
    * ([[graft.streaming.ObservationStream.updateStream]]). */
  def updateWith(
      spark: SparkSession, outDir: String,
      newSpecsIn: Dataset[SpectrumObs]): UpdateSummary = {
    import spark.implicits._

    val newSpecs = newSpecsIn.cache()
    if (newSpecs.isEmpty) {
      newSpecs.unpersist()
      return UpdateSummary(0, 0, 0, 0, 0)
    }
    val images = spark.read.parquet(s"$outDir/images").as[ImageObs]

    // 1. append the new observations
    newSpecs.toDF().write.mode(SaveMode.Append)
      .partitionBy("zoom").parquet(s"$outDir/spectra")

    // 2. link ONLY the new spectra (links are per-spectrum → append)
    val newLinks = Link.linkCutouts(newSpecs, images).cache()
    newLinks.toDF().write.mode(SaveMode.Append)
      .partitionBy("zoom").parquet(s"$outDir/cutout_links")

    // 3. affected targets = healpix cells touched by the new spectra
    val affected = newSpecs.toDF().where(col("zoom") === 0)
      .select(col("healpix").as("affected_healpix")).distinct().cache()
    val affectedBuckets = affected
      .select(shiftright(col("affected_healpix"), BucketShift).as("bucket")).distinct()

    // 4. re-stack the affected targets from the UPDATED spectra table
    val allSpectra = spark.read.parquet(s"$outDir/spectra").as[SpectrumObs]
    val affectedSpectra = allSpectra.toDF()
      .join(broadcast(affected), col("healpix") === col("affected_healpix"))
      .drop("affected_healpix")
      .as[SpectrumObs]
    val affectedSpecIds = affectedSpectra.toDF().where(col("zoom") === 0)
      .select(col("spec_id").as("a_spec_id")).distinct()
    val allLinks = spark.read.parquet(s"$outDir/cutout_links").as[CutoutLink]
    val affectedLinks = allLinks.toDF()
      .join(broadcast(affectedSpecIds), col("spec_id") === col("a_spec_id"))
      .drop("a_spec_id")
      .as[CutoutLink]
    val mlNew = MlCube.build(affectedSpectra, affectedLinks, images)

    // 5. rewrite only the affected (zoom, bucket) partitions: surviving
    // rows of those buckets (unaffected targets) + the re-stacked rows
    val oldMl = spark.read.parquet(s"$outDir/ml_cube")
      .join(broadcast(affectedBuckets), Seq("bucket"), "left_semi")
      .join(broadcast(affected),
        col("target_healpix") === col("affected_healpix"), "left_anti")
    // materialization BARRIER: the dynamic overwrite below deletes
    // partition files this plan reads, so the union is pinned with
    // localCheckpoint — the write job's plan becomes a scan of already-
    // materialized blocks with its file lineage cut. (cache() was not a
    // barrier: an evicted block would recompute mid-write and re-read
    // files the overwrite is deleting.)
    val mlRewrite = oldMl.unionByName(
      mlNew.toDF().withColumn("bucket", shiftright(col("target_healpix"), BucketShift)))
      .localCheckpoint()
    require(!mlRewrite.queryExecution.executedPlan.toString.contains("ml_cube"),
      "ml_cube rewrite plan must not read the path being overwritten")
    val mlRowCount = mlRewrite.count()
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      mlRewrite
        .write.mode(SaveMode.Overwrite)
        .partitionBy("zoom", "bucket").parquet(s"$outDir/ml_cube")
    finally prevMode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    // 6. viz rows are per-observation → append the new spectrum samples
    // and the new links' cutout pixels
    val vizNew = VizCube.build(newSpecs, newLinks, images).cache()
    val vizCount = vizNew.count()
    vizNew.toDF()
      .repartitionByRange(col("zoom"), col("heal_id"))
      .sortWithinPartitions("zoom", "heal_id")
      .write.mode(SaveMode.Append)
      .partitionBy("zoom").parquet(s"$outDir/viz_cube")

    val summary = UpdateSummary(
      newSpecs.count(), newLinks.count(), affected.count(), mlRowCount, vizCount)
    newSpecs.unpersist(); newLinks.unpersist(); affected.unpersist()
    vizNew.unpersist() // mlRewrite's checkpoint blocks are GC'd by the ContextCleaner
    summary
  }

  /** CLI parity with `hisscube.py <in> <out> update`:
    * UpdateCube <cubeOutDir> <newSpectraDir> */
  def main(args: Array[String]): Unit = {
    val Array(outDir, newSpectraDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = update(spark, outDir, newSpectraDir)
    println(s"""{"new_spectra":${s.newSpectra},"new_links":${s.newLinks},"affected_targets":${s.affectedTargets},"ml_rows_rewritten":${s.mlRowsRewritten},"viz_rows_appended":${s.vizRowsAppended}}""")
    spark.stop()
  }
}
