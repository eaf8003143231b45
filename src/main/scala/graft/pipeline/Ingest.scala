package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.Healpix
import graft.functions.PhotometryKernels
import graft.sources.SdssFits

/** Ingest phase: FITS directories → typed observation Datasets with full
  * zoom pyramids (reference phases "metadata-cache/metadata/data",
  * SURVEY §3.1 — in Spark they collapse into one distributed scan; each
  * file is decoded exactly once, in the executor that owns its split).
  *
  * Scale shape: `binaryFile` scan parallelizes per file; the flatMap is
  * per-partition pure compute (no shuffle); the optional write partitions
  * by zoom and range-sorts by healpix so downstream joins prune (I3/I4).
  */
object Ingest {

  val ImgZoomCnt = 4
  val SpecZoomCnt = 4
  val ImgHealOrder = 10 // IMG_SPAT_INDEX_ORDER - 1 (config.ini:17)
  val SpecHealOrder = 15 // SPEC_SPAT_INDEX_ORDER - 1 (config.ini:18)

  /** FNV-1a 64-bit of the file name — stable observation id. */
  def stableId(name: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < name.length) {
      h ^= name.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h & Long.MaxValue // keep non-negative for readability
  }

  def baseName(path: String): String = path.substring(path.lastIndexOf('/') + 1)

  /** S1 recursive scan + S5 spectrum decode + X1 pyramid fan-out. */
  def spectra(
      spark: SparkSession, dir: String,
      pattern: String = "*.fits", limit: Int = Int.MaxValue,
      zoomCnt: Int = SpecZoomCnt): Dataset[SpectrumObs] = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .limit(limit)
      .select("path", "content").as[(String, Array[Byte])]
    files.flatMap { case (path, bytes) =>
      val sp = SdssFits.loadSpectrum(bytes, path, zoomCnt)
      val name = baseName(path)
      val id = stableId(name)
      val hp = Healpix.ang2pixLonLat(SpecHealOrder, sp.ra, sp.dec)
      val header = sp.header.cards.toMap
      sp.pyramid.zipWithIndex.map { case ((wl, f, s), z) =>
        SpectrumObs(z, id, name, sp.ra, sp.dec, sp.time,
          sp.plateid, sp.mjd, sp.fiberid, hp,
          SdssFits.toF32Scrubbed1d(wl),
          SdssFits.toF32Scrubbed1d(f),
          SdssFits.toF32Scrubbed1d(s),
          header)
      }
    }
  }

  /** S1 + S4 frame decode (P1-P4 kernels) + X2 pyramid fan-out.
    * CCD gain tables are read once on the driver and shipped in the
    * closure (tiny broadcast analogue of the reference's config cache). */
  def images(
      spark: SparkSession, dir: String, ccdConfigDir: String,
      pattern: String = "*.fits*", limit: Int = Int.MaxValue,
      zoomCnt: Int = ImgZoomCnt): Dataset[ImageObs] = {
    import spark.implicits._
    val gains = SdssFits.readCcdTsv(s"$ccdConfigDir/ccd_gain.tsv")
    val darkVars = SdssFits.readCcdTsv(s"$ccdConfigDir/ccd_dark_variance.tsv")
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .limit(limit)
      .select("path", "content").as[(String, Array[Byte])]
    files.flatMap { case (path, bytes) =>
      val fr = SdssFits.loadFrame(bytes, path, gains, darkVars, zoomCnt)
      val name = baseName(path)
      val id = stableId(name)
      val hp = Healpix.ang2pixLonLat(ImgHealOrder, fr.wcs.crval1, fr.wcs.crval2)
      val wlMid = PhotometryKernels.filterMidpoints(fr.band)
      val header = fr.header.cards.toMap
      fr.pyramid.zipWithIndex.map { case ((f, s), z) =>
        val wz = fr.wcs.atZoom(z)
        ImageObs(z, id, name, fr.band, wlMid, fr.run, fr.camcol, fr.field,
          fr.timeMjd, hp, f(0).length, f.length, f, s,
          WcsParams(wz.crpix1, wz.crpix2, wz.cd11, wz.cd12, wz.cd21, wz.cd22,
            wz.crval1, wz.crval2),
          header)
      }
    }
  }

  /** Persist an observation table the way the 100 TB layout wants it:
    * partitioned by zoom, range-sorted by healpix within partitions so
    * parquet row-group min/max stats prune spatial probes (I4). */
  def writeSorted[T](ds: Dataset[T], outDir: String, numFiles: Int = 32): Unit = {
    import org.apache.spark.sql.functions.col
    ds.toDF()
      .repartitionByRange(numFiles, col("zoom"), col("healpix"))
      .sortWithinPartitions("zoom", "healpix")
      .write.mode("overwrite")
      .partitionBy("zoom")
      .parquet(outDir)
  }
}
