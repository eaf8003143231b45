package graft.sources.fits

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.Ingest
import graft.sources.SdssFits

/** DataSourceV2 packaging of the SDSS FITS readers — the idiomatic
  * `spark.read.format(...)` form of `Ingest.spectra`/`Ingest.images`
  * (same parsers, same pyramid fan-out, parity-tested):
  *
  * {{{
  *   spark.read.format("graft.sources.fits.FitsDataSource")
  *     .option("zoomCnt", 4)          // pyramid depth (default 4)
  *     .option("pathGlobFilter", "*.fits")
  *     .load("/data/spectra")         // recursive
  *
  *   spark.read.format("graft.sources.fits.FitsDataSource")
  *     .option("kind", "images")      // SDSS frames
  *     .option("ccdConfig", "/ref/config")  // gain / dark-variance TSVs
  *     .load("/data/frames")
  * }}}
  *
  * Scale shape: one `InputPartition` per FITS file (the same
  * one-task-per-file parallelism as the `binaryFile` path — decode runs
  * in the executor that owns the file, zero shuffle); REQUIRED-COLUMN
  * PRUNING reaches the decoder, so a metadata-only query (`SELECT ra,
  * dec`) never materializes the pixel arrays — the DSv2 advantage over
  * `binaryFile`, which always ships whole files; zoom equality filters
  * skip pyramid levels at the source (returned as residual too, so
  * Spark re-checks them — pure optimization, never a semantic change).
  *
  * Reference: the HiSS-Cube ingestors walk directories and fitsio-read
  * each file serially per MPI rank (`hisscube/director.py`); here the
  * directory listing is one driver pass and the decode is the cluster's.
  */
class FitsDataSource extends TableProvider {
  private def kind(opts: CaseInsensitiveStringMap): String =
    Option(opts.get("kind")).getOrElse("spectra")

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    kind(options) match {
      case "images" => FitsDataSource.ImageSchema
      case _ => FitsDataSource.Schema
    }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft.fits: .load(path) is required"))
    kind(opts) match {
      case "images" =>
        val conf = Option(opts.get("ccdConfig")).getOrElse(
          throw new IllegalArgumentException(
            "graft.fits kind=images: .option(\"ccdConfig\", dir) is required"))
        new ImageFitsTable(path,
          Option(opts.get("pathGlobFilter")).getOrElse("*.fits*"),
          Option(opts.get("zoomCnt")).map(_.toInt).getOrElse(Ingest.ImgZoomCnt),
          SdssFits.readCcdTsv(s"$conf/ccd_gain.tsv"),
          SdssFits.readCcdTsv(s"$conf/ccd_dark_variance.tsv"),
          Option(opts.get("listParallelism")).map(_.toInt).getOrElse(0),
          // layout assertion: top-level dirs under path are run numbers
          Option(opts.get("runDirLayout")).exists(_.toBoolean))
      case "spectra" =>
        new FitsTable(path,
          Option(opts.get("pathGlobFilter")).getOrElse("*.fits"),
          Option(opts.get("zoomCnt")).map(_.toInt).getOrElse(Ingest.SpecZoomCnt),
          Option(opts.get("listParallelism")).map(_.toInt).getOrElse(0))
      case other =>
        throw new IllegalArgumentException(s"graft.fits: unknown kind '$other'")
    }
  }

  override def supportsExternalMetadata(): Boolean = false
}

object FitsDataSource {
  /** One row per (file, zoom) — the SpectrumObs shape (Model.scala). */
  val Schema: StructType = StructType(Seq(
    StructField("zoom", IntegerType, nullable = false),
    StructField("spec_id", LongType, nullable = false),
    StructField("fits_name", StringType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("time", DoubleType, nullable = false),
    StructField("plateid", LongType, nullable = false),
    StructField("mjd", LongType, nullable = false),
    StructField("fiberid", IntegerType, nullable = false),
    StructField("healpix", LongType, nullable = false),
    StructField("wl", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("flux", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("sigma", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("header", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  /** One row per (frame, zoom) — the ImageObs shape (Model.scala). */
  val ImageSchema: StructType = StructType(Seq(
    StructField("zoom", IntegerType, nullable = false),
    StructField("image_id", LongType, nullable = false),
    StructField("fits_name", StringType, nullable = false),
    StructField("band", StringType, nullable = false),
    StructField("wl", IntegerType, nullable = false),
    StructField("run", IntegerType, nullable = false),
    StructField("camcol", IntegerType, nullable = false),
    StructField("field", IntegerType, nullable = false),
    StructField("time", DoubleType, nullable = false),
    StructField("healpix", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("flux",
      ArrayType(ArrayType(FloatType, containsNull = false), containsNull = false),
      nullable = false),
    StructField("sigma",
      ArrayType(ArrayType(FloatType, containsNull = false), containsNull = false),
      nullable = false),
    StructField("wcs", ImageFits.WcsType, nullable = false),
    StructField("header", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))
}

/** Hadoop `Configuration` is not `java.io.Serializable`; this is the
  * standard write/readFields wrapper (Spark ships one, but it is
  * `private[spark]`). Captured on the driver at scan-build time from
  * the SESSION's Hadoop configuration — so `spark.hadoop.*` settings
  * (object-store credentials, custom filesystems, defaultFS) reach the
  * file listing and every executor-side reader, exactly as they do on
  * the `binaryFile` ingest path (`Ingest.scala`). */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object SerializableHadoopConf {
  /** The active session's Hadoop conf (SQL-conf-merged), wrapped. */
  def fromSession(): SerializableHadoopConf =
    new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
}

class FitsTable(path: String, glob: String, zoomCnt: Int, listPar: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft.fits(`$path`)"
  override def schema(): StructType = FitsDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FitsScanBuilder(path, glob, zoomCnt, listPar)
}

class FitsScanBuilder(path: String, glob: String, zoomCnt: Int, listPar: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = FitsDataSource.Schema
  private var zoomEq: Option[Int] = None
  private var prune: SpecPrune = SpecPrune.none

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    zoomEq = filters.collectFirst {
      case EqualTo("zoom", v: Int) => v
      case EqualTo("zoom", v: Integer) => v.intValue
    }
    // plate/mjd/fiber equalities prune the LISTING (the canonical
    // spec-PLATE-MJD-FIBER filename determines them — the FramePrune
    // discipline on the spectrum side); everything stays residual, so
    // the pruning is an optimization, never a semantic change
    def longEq(col: String): Option[Long] = filters.collectFirst {
      case EqualTo(`col`, v: Long) => v
      case EqualTo(`col`, v: java.lang.Long) => v.longValue
      case EqualTo(`col`, v: Int) => v.toLong
      case EqualTo(`col`, v: Integer) => v.longValue
    }
    val fiberEq = filters.collectFirst {
      case EqualTo("fiberid", v: Int) => v
      case EqualTo("fiberid", v: Integer) => v.intValue
    }
    prune = SpecPrune(longEq("plateid"), longEq("mjd"), fiberEq)
    filters // everything stays residual: the skips are optimizations
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan =
    new FitsScan(path, glob, zoomCnt, required, zoomEq,
      SerializableHadoopConf.fromSession(), listPar, prune)
}

class FitsScan(
    path: String, glob: String, zoomCnt: Int,
    required: StructType, zoomEq: Option[Int],
    hconf: SerializableHadoopConf, listPar: Int,
    prune: SpecPrune = SpecPrune.none)
    extends Scan with Batch with graft.plans.ResidualOnlyScan {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft.fits $path glob=$glob zoomCnt=$zoomCnt cols=${required.fieldNames.mkString(",")}" +
      (if (prune.isEmpty) "" else s" prune=$prune")

  override def planInputPartitions(): Array[InputPartition] =
    if (listPar > 0) FitsFiles.listDistributed(path, glob, hconf, listPar, prune)
    else FitsFiles.list(path, glob, hconf.value, prune)

  override def createReaderFactory(): PartitionReaderFactory =
    new FitsReaderFactory(zoomCnt, required, zoomEq, hconf)
}

case class FitsInputPartition(file: String) extends InputPartition

/** Filename-driven listing-time pruning contract shared by the frame
  * and spectrum scans: `keepFile` decides from the NAME alone whether a
  * file can possibly satisfy the pushed equality filters (always keep
  * on any parse doubt — pruning is an optimization, never a semantic
  * change; every filter stays residual), `keepTopDir` optionally skips
  * whole top-level subtrees under a declared directory layout.
  * Serializable: captured by the distributed-listing closure. */
sealed trait NamePrune extends Serializable {
  def isEmpty: Boolean
  def keepFile(name: String): Boolean
  def keepTopDir(name: String): Boolean
}

object NamePrune {
  val none: NamePrune = FramePrune.none
}

/** Equality pushdown → LISTING-time pruning for SDSS frame scans: a
  * canonical `frame-<band>-<run6>-<camcol>-<field4>` filename fully
  * determines those four columns, so a file whose name contradicts an
  * equality filter can never yield matching rows and is skipped before
  * any byte is read — the partition count shrinks at plan time (the
  * binaryFile manifest-join discipline, now on the DSv2 path).
  * Non-canonical names are ALWAYS kept (their metadata comes from the
  * FITS header and the residual filter re-checks every row), so the
  * pruning is sound, never semantic.
  *
  * `runDirs = true` (the `.option("runDirLayout", "true")` contract:
  * top-level directories under the load path are bare run numbers —
  * the standard SDSS frames layout) additionally skips whole sibling
  * run SUBTREES on a run equality: a 1.5 M-file scan for one run walks
  * one directory, not thousands. Off by default because it is a layout
  * assertion the source cannot verify. */
case class FramePrune(
    band: Option[String], run: Option[Int], camcol: Option[Int],
    field: Option[Int], runDirs: Boolean) extends NamePrune {
  def isEmpty: Boolean =
    band.isEmpty && run.isEmpty && camcol.isEmpty && field.isEmpty
  // anchored to the name START: a non-canonical name merely CONTAINING
  // a canonical substring (copy-of-frame-…) is header-described and
  // must never be pruned
  @transient private lazy val Re =
    raw"^frame-([A-Za-z0-9]+)-(\d+)-(\d+)-(\d+)\.".r
  private def intVal(s: String): Option[Int] =
    scala.util.Try(s.toInt).toOption
  def keepFile(name: String): Boolean =
    isEmpty || (Re.findFirstMatchIn(name) match {
      case Some(m) =>
        // a numeral too big for Int can't equal any Int filter value,
        // but the file may still be canonical-ish — keep it and let the
        // residual re-check decide (never crash the listing)
        band.forall(_ == m.group(1)) &&
          run.forall(r => intVal(m.group(2)).forall(_ == r)) &&
          camcol.forall(c => intVal(m.group(3)).forall(_ == c)) &&
          field.forall(f => intVal(m.group(4)).forall(_ == f))
      case None => true // header-described file — residual filter decides
    })
  /** Top-level subtree pruning — only under the declared run-dir
    * layout, and only for directory names that parse as integers. */
  def keepTopDir(name: String): Boolean =
    !runDirs || run.isEmpty ||
      scala.util.Try(name.trim.toInt).toOption.forall(_ == run.get)
}

object FramePrune {
  val none: FramePrune = FramePrune(None, None, None, None, runDirs = false)
}

/** The spectrum-side [[FramePrune]] analogue: a canonical
  * `spec-<plate4>-<mjd>-<fiber4>` filename fully determines the
  * plateid/mjd/fiberid columns (`Ingest.spectra` parses the same name;
  * reference `metadata_strategy_spectrum.py` keys spectra by exactly
  * this triple), so plate/mjd/fiber EQUALITY filters prune the spectra
  * listing before any byte is read. Same never-crash rules: the regex
  * is ANCHORED to the name start, a non-canonical name is always kept
  * (its metadata comes from the FITS header and the residual filter
  * re-checks every row), and a numeral that overflows Long is kept for
  * the residual to decide. No top-dir skip: the standard spectra
  * layout is flat (or plate-sharded, which the recursive walk handles
  * without a layout assertion). */
case class SpecPrune(
    plate: Option[Long], mjd: Option[Long], fiber: Option[Int])
    extends NamePrune {
  def isEmpty: Boolean = plate.isEmpty && mjd.isEmpty && fiber.isEmpty
  @transient private lazy val Re = raw"^spec-(\d+)-(\d+)-(\d+)\.".r
  private def longVal(s: String): Option[Long] =
    scala.util.Try(s.toLong).toOption
  def keepFile(name: String): Boolean =
    isEmpty || (Re.findFirstMatchIn(name) match {
      case Some(m) =>
        plate.forall(p => longVal(m.group(1)).forall(_ == p)) &&
          mjd.forall(d => longVal(m.group(2)).forall(_ == d)) &&
          fiber.forall(f => longVal(m.group(3)).forall(_ == f.toLong))
      case None => true // header-described file — residual filter decides
    })
  def keepTopDir(name: String): Boolean = true
}

object SpecPrune {
  val none: SpecPrune = SpecPrune(None, None, None)
}

/** File discovery → one partition per matching file. Driver-side
  * recursive walk by default; `listParallelism = N` fans the recursive
  * walk of each top-level subdirectory out across the cluster (one
  * small Spark job at plan time, collecting matched path STRINGS only)
  * — the listing analogue of the binaryFile manifest-join discipline:
  * at 1.5 M files over thousands of run/camcol directories the serial
  * driver walk is minutes of NameNode round-trips, the distributed
  * walk is one task wave. */
object FitsFiles {
  // one glob→regex compile per listing pass, NOT per file: at millions
  // of files a per-status getPathMatcher call is pure compile overhead
  private def globMatcher(glob: String): String => Boolean = {
    val m = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$glob")
    name => m.matches(java.nio.file.Paths.get(name))
  }

  def list(
      path: String, glob: String, conf: Configuration,
      prune: NamePrune = NamePrune.none): Array[InputPartition] = {
    val fs = new Path(path).getFileSystem(conf)
    val matches = globMatcher(glob)
    val out = Array.newBuilder[InputPartition]
    def walk(p: Path): Unit = {
      val it = fs.listFiles(p, /* recursive = */ true)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && matches(name) && prune.keepFile(name))
          out += FitsInputPartition(st.getPath.toString)
      }
    }
    val runDirSkip = prune match {
      case fp: FramePrune => fp.runDirs && fp.run.isDefined
      case _ => false
    }
    if (runDirSkip) {
      // run-dir layout declared: skip sibling run subtrees entirely
      fs.listStatus(new Path(path)).foreach { st =>
        val name = st.getPath.getName
        if (st.isFile) {
          if (matches(name) && prune.keepFile(name))
            out += FitsInputPartition(st.getPath.toString)
        } else if (prune.keepTopDir(name)) walk(st.getPath)
      }
    } else walk(new Path(path))
    out.result()
  }

  def listDistributed(
      path: String, glob: String,
      hconf: SerializableHadoopConf, parallelism: Int,
      prune: NamePrune = NamePrune.none): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val fs = new Path(path).getFileSystem(hconf.value)
    // one driver round-trip for the top level; subtrees walk on executors
    val top = fs.listStatus(new Path(path))
    val rootMatches = globMatcher(glob)
    val rootFiles = top
      .filter(st => st.isFile && rootMatches(st.getPath.getName) &&
        prune.keepFile(st.getPath.getName))
      .map(_.getPath.toString)
    val dirs = top.filter(st =>
        st.isDirectory && prune.keepTopDir(st.getPath.getName))
      .map(_.getPath.toString).toSeq
    val subFiles: Array[String] =
      if (dirs.isEmpty) Array.empty
      else spark.sparkContext
        .parallelize(dirs, math.max(1, math.min(dirs.length, parallelism)))
        .mapPartitions { ds =>
          val matches = globMatcher(glob) // once per task, not per file
          ds.flatMap { d =>
            val dfs = new Path(d).getFileSystem(hconf.value)
            val it = dfs.listFiles(new Path(d), /* recursive = */ true)
            val out = Array.newBuilder[String]
            while (it.hasNext) {
              val st = it.next()
              val name = st.getPath.getName
              if (st.isFile && matches(name) && prune.keepFile(name))
                out += st.getPath.toString
            }
            out.result()
          }
        }
        .collect()
    // deterministic partition order regardless of task completion order
    (rootFiles ++ subFiles).sorted
      .map(f => FitsInputPartition(f): InputPartition)
  }

  def readAll(file: String, conf: Configuration): Array[Byte] = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    // single-buffer decode: a frame is ~12 MB, a spectrum ~200 KB; fail
    // loudly on absurd inputs instead of silently truncating via toInt
    require(len <= Int.MaxValue, s"$file is ${len} B — not a FITS observation")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    bytes
  }
}

class FitsReaderFactory(
    zoomCnt: Int, required: StructType, zoomEq: Option[Int],
    hconf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FitsPartitionReader(
      partition.asInstanceOf[FitsInputPartition].file, zoomCnt, required, zoomEq,
      hconf)
}

/** Decodes ONE file (in the task that owns it) and emits its pyramid
  * rows, building only the columns the scan requires. */
class FitsPartitionReader(
    file: String, zoomCnt: Int, required: StructType, zoomEq: Option[Int],
    hconf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val bytes = FitsFiles.readAll(file, hconf.value)
    val sp = SdssFits.loadSpectrum(bytes, file, zoomCnt)
    val name = Ingest.baseName(file)
    val id = Ingest.stableId(name)
    val hp = graft.functions.Healpix.ang2pixLonLat(Ingest.SpecHealOrder, sp.ra, sp.dec)
    // .toMap first: duplicate cards dedup exactly as Ingest.decodeSpectra's
    // `cards.toMap` does, so the two read paths stay row-identical
    lazy val headerData = {
      val m = sp.header.cards.toMap.toArray
      ArrayBasedMapData(
        m.map(c => UTF8String.fromString(c._1): Any),
        m.map(c => UTF8String.fromString(c._2): Any))
    }
    sp.pyramid.zipWithIndex.iterator
      .filter { case (_, z) => zoomEq.forall(_ == z) }
      .map { case ((wl, f, s), z) =>
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          row.update(i, required.fields(i).name match {
            case "zoom" => z
            case "spec_id" => id
            case "fits_name" => UTF8String.fromString(name)
            case "ra" => sp.ra
            case "dec" => sp.dec
            case "time" => sp.time
            case "plateid" => sp.plateid
            case "mjd" => sp.mjd
            case "fiberid" => sp.fiberid
            case "healpix" => hp
            case "wl" => new GenericArrayData(SdssFits.toF32Scrubbed1d(wl))
            case "flux" => new GenericArrayData(SdssFits.toF32Scrubbed1d(f))
            case "sigma" => new GenericArrayData(SdssFits.toF32Scrubbed1d(s))
            case "header" => headerData
            case other => throw new IllegalArgumentException(s"unknown column $other")
          })
          i += 1
        }
        row
      }
  }

  private var cur: InternalRow = _
  override def next(): Boolean = { val h = rows.hasNext; if (h) cur = rows.next(); h }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

// ------------------------------------------------------------ images

object ImageFits {
  /** One row per (frame, zoom) — the ImageObs shape (Model.scala). */
  val WcsType: StructType = StructType(Seq(
    StructField("crpix1", DoubleType, nullable = false),
    StructField("crpix2", DoubleType, nullable = false),
    StructField("cd11", DoubleType, nullable = false),
    StructField("cd12", DoubleType, nullable = false),
    StructField("cd21", DoubleType, nullable = false),
    StructField("cd22", DoubleType, nullable = false),
    StructField("crval1", DoubleType, nullable = false),
    StructField("crval2", DoubleType, nullable = false)))
}

class ImageFitsTable(
    path: String, glob: String, zoomCnt: Int,
    gains: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    darkVars: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    listPar: Int, runDirs: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft.fits.images(`$path`)"
  override def schema(): StructType = FitsDataSource.ImageSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ImageFitsScanBuilder(path, glob, zoomCnt, gains, darkVars, listPar,
      runDirs)
}

class ImageFitsScanBuilder(
    path: String, glob: String, zoomCnt: Int,
    gains: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    darkVars: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    listPar: Int, runDirs: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = FitsDataSource.ImageSchema
  private var zoomEq: Option[Int] = None
  private var prune: FramePrune = FramePrune.none.copy(runDirs = runDirs)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    zoomEq = filters.collectFirst {
      case EqualTo("zoom", v: Int) => v
      case EqualTo("zoom", v: Integer) => v.intValue
    }
    // run/camcol/field/band equalities prune the LISTING (the canonical
    // frame filename determines them); everything stays residual, so
    // the pruning is an optimization, never a semantic change
    def intEq(col: String): Option[Int] = filters.collectFirst {
      case EqualTo(`col`, v: Int) => v
      case EqualTo(`col`, v: Integer) => v.intValue
    }
    val bandEq = filters.collectFirst { case EqualTo("band", v: String) => v }
    prune = FramePrune(bandEq, intEq("run"), intEq("camcol"), intEq("field"),
      runDirs)
    filters
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan =
    new ImageFitsScan(path, glob, zoomCnt, gains, darkVars, required, zoomEq,
      SerializableHadoopConf.fromSession(), listPar, prune)
}

class ImageFitsScan(
    path: String, glob: String, zoomCnt: Int,
    gains: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    darkVars: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    required: StructType, zoomEq: Option[Int],
    hconf: SerializableHadoopConf, listPar: Int,
    prune: FramePrune = FramePrune.none)
    extends Scan with Batch with graft.plans.ResidualOnlyScan {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft.fits.images $path glob=$glob zoomCnt=$zoomCnt " +
      s"cols=${required.fieldNames.mkString(",")}" +
      (if (prune.isEmpty) "" else s" prune=$prune")

  override def planInputPartitions(): Array[InputPartition] =
    if (listPar > 0) FitsFiles.listDistributed(path, glob, hconf, listPar, prune)
    else FitsFiles.list(path, glob, hconf.value, prune)

  override def createReaderFactory(): PartitionReaderFactory =
    new ImageFitsReaderFactory(zoomCnt, gains, darkVars, required, zoomEq, hconf)
}

class ImageFitsReaderFactory(
    zoomCnt: Int,
    gains: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    darkVars: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    required: StructType, zoomEq: Option[Int],
    hconf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ImageFitsPartitionReader(
      partition.asInstanceOf[FitsInputPartition].file,
      zoomCnt, gains, darkVars, required, zoomEq, hconf)
}

class ImageFitsPartitionReader(
    file: String, zoomCnt: Int,
    gains: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    darkVars: Seq[graft.functions.PhotometryKernels.CcdConfigRow],
    required: StructType, zoomEq: Option[Int],
    hconf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private def plane(a: Array[Array[Float]]): GenericArrayData =
    new GenericArrayData(a.map(r => new GenericArrayData(r): Any))

  private val rows: Iterator[InternalRow] = {
    val bytes = FitsFiles.readAll(file, hconf.value)
    val fr = SdssFits.loadFrame(bytes, file, gains, darkVars, zoomCnt)
    val name = Ingest.baseName(file)
    val id = Ingest.stableId(name)
    val hp = graft.functions.Healpix.ang2pixLonLat(
      Ingest.ImgHealOrder, fr.wcs.crval1, fr.wcs.crval2)
    val wlMid = graft.functions.PhotometryKernels.filterMidpoints(fr.band)
    lazy val headerData = {
      val m = fr.header.cards.toMap.toArray
      ArrayBasedMapData(
        m.map(c => UTF8String.fromString(c._1): Any),
        m.map(c => UTF8String.fromString(c._2): Any))
    }
    fr.pyramid.zipWithIndex.iterator
      .filter { case (_, z) => zoomEq.forall(_ == z) }
      .map { case ((f, s), z) =>
        // malformed frames fail with a file-named message, not an
        // ArrayIndexOutOfBounds from the width accessor below
        require(f.nonEmpty && f(0).nonEmpty,
          s"graft.fits: $file decoded to an empty plane at zoom $z")
        lazy val wz = fr.wcs.atZoom(z)
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          row.update(i, required.fields(i).name match {
            case "zoom" => z
            case "image_id" => id
            case "fits_name" => UTF8String.fromString(name)
            case "band" => UTF8String.fromString(fr.band)
            case "wl" => wlMid
            case "run" => fr.run
            case "camcol" => fr.camcol
            case "field" => fr.field
            case "time" => fr.timeMjd
            case "healpix" => hp
            case "width" => f(0).length
            case "height" => f.length
            case "flux" => plane(f)
            case "sigma" => plane(s)
            case "wcs" =>
              // build to the REQUIRED nested schema: nested-schema
              // pruning may have narrowed the struct to a field subset
              val st = required.fields(i).dataType.asInstanceOf[StructType]
              new GenericInternalRow(st.fields.map[Any](f => f.name match {
                case "crpix1" => wz.crpix1
                case "crpix2" => wz.crpix2
                case "cd11" => wz.cd11
                case "cd12" => wz.cd12
                case "cd21" => wz.cd21
                case "cd22" => wz.cd22
                case "crval1" => wz.crval1
                case "crval2" => wz.crval2
              }))
            case "header" => headerData
            case other => throw new IllegalArgumentException(s"unknown column $other")
          })
          i += 1
        }
        row
      }
  }

  private var cur: InternalRow = _
  override def next(): Boolean = { val h = rows.hasNext; if (h) cur = rows.next(); h }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}
