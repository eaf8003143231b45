package graft.sources.fits

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
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

/** DataSourceV2 packaging of the SDSS spectrum FITS reader — the
  * idiomatic `spark.read.format(...)` form of `Ingest.spectra`
  * (same parser, same pyramid fan-out, parity-tested):
  *
  * {{{
  *   spark.read.format("graft.sources.fits.FitsDataSource")
  *     .option("zoomCnt", 4)          // pyramid depth (default 4)
  *     .option("pathGlobFilter", "*.fits")
  *     .load("/data/spectra")         // recursive
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
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FitsDataSource.Schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FitsTable(
      Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException("graft.fits: .load(path) is required")),
      Option(opts.get("pathGlobFilter")).getOrElse("*.fits"),
      Option(opts.get("zoomCnt")).map(_.toInt).getOrElse(Ingest.SpecZoomCnt))
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
}

class FitsTable(path: String, glob: String, zoomCnt: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft.fits(`$path`)"
  override def schema(): StructType = FitsDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FitsScanBuilder(path, glob, zoomCnt)
}

class FitsScanBuilder(path: String, glob: String, zoomCnt: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = FitsDataSource.Schema
  private var zoomEq: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    zoomEq = filters.collectFirst {
      case EqualTo("zoom", v: Int) => v
      case EqualTo("zoom", v: Integer) => v.intValue
    }
    filters // everything stays residual: the zoom skip is an optimization
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = new FitsScan(path, glob, zoomCnt, required, zoomEq)
}

class FitsScan(
    path: String, glob: String, zoomCnt: Int,
    required: StructType, zoomEq: Option[Int]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft.fits $path glob=$glob zoomCnt=$zoomCnt cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val matcher = java.nio.file.FileSystems.getDefault
      .getPathMatcher(s"glob:$glob")
    val it = fs.listFiles(new Path(path), /* recursive = */ true)
    val out = Array.newBuilder[InputPartition]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile &&
          matcher.matches(java.nio.file.Paths.get(st.getPath.getName)))
        out += FitsInputPartition(st.getPath.toString)
    }
    out.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FitsReaderFactory(zoomCnt, required, zoomEq)
}

case class FitsInputPartition(file: String) extends InputPartition

class FitsReaderFactory(
    zoomCnt: Int, required: StructType, zoomEq: Option[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FitsPartitionReader(
      partition.asInstanceOf[FitsInputPartition].file, zoomCnt, required, zoomEq)
}

/** Decodes ONE file (in the task that owns it) and emits its pyramid
  * rows, building only the columns the scan requires. */
class FitsPartitionReader(
    file: String, zoomCnt: Int, required: StructType, zoomEq: Option[Int])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val p = new Path(file)
    val fs = p.getFileSystem(new Configuration())
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()

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
