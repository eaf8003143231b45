package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.pipeline.{Ingest, Link, MlCube, VizCube}
import graft.plans.HealpixExpressions.{healpix_cell, healpix_disc}
import graft.syntax._

/** Astronomy-operator queries for the driver gate. Spatial indexing runs
  * over synthetic sky positions derived from the testdata (deterministic
  * arithmetic); the FITS-backed queries exercise the real ingest pipeline
  * on the reference's committed files when present (rows-only checks —
  * healpix/FITS semantics have no SQL oracle; ScalaTest covers them).
  */
object AstroOps {

  private val refData = "/root/reference/data/raw"

  /** Synthetic sky positions: customers scattered deterministically. */
  private def sky(s: SparkSession, dir: String): DataFrame = {
    graft.plans.HealpixExpressions.register(s)
    load(s, dir, "customer").select(
      $"c_custkey",
      (($"c_custkey" * 7.001) % 360.0).as("ra"),
      ((($"c_custkey" * 3.503) % 120.0) - 60.0).as("dec"))
  }

  /** I1: native healpix_cell Expression inside whole-stage codegen;
    * spatial histogram at two orders (hierarchy via bit-shift, I2). */
  def q37Healpix(s: SparkSession, dir: String): DataFrame =
    sky(s, dir)
      .select(
        healpix_cell($"ra", $"dec", lit(11)).as("cell11"),
        healpix_cell($"ra", $"dec", lit(6)).as("cell6"))
      .withColumn("parent_ok", (shiftright($"cell11", 10) === $"cell6").cast("long"))
      .groupBy()
      .agg(
        countDistinct($"cell11").as("n_cells11"),
        countDistinct($"cell6").as("n_cells6"),
        sum($"parent_ok").as("n_parent_consistent"),
        count(lit(1)).as("n"))

  /** I6: disc-cover explode — the link phase's candidate generator. */
  def q42DiscCover(s: SparkSession, dir: String): DataFrame =
    sky(s, dir)
      .filter($"c_custkey" <= 50)
      .select($"c_custkey",
        explode(healpix_disc($"ra", $"dec", lit(10), lit(8.0 * math.Pi / (60 * 180))))
          .as("cell"))
      .groupBy($"c_custkey")
      .agg(count(lit(1)).as("n_cells"), countDistinct($"cell").as("n_distinct"))

  /** S1+S5+P5+P9+X1: real FITS spectra ingest through the pipeline
    * (reference's committed files), reporting the pyramid law. */
  def q38FitsSpectra(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val specs = Ingest.spectra(s, s"$refData/galaxy_small/spectra")
    specs.map(o => (o.zoom, o.flux.length, o.flux.count(v => !v.isNaN)))
      .toDF("zoom", "n_samples", "n_finite")
      .groupBy(col("zoom"), col("n_samples"))
      .agg(count(lit(1)).as("n_spectra"), sum(col("n_finite")).as("total_finite"))
  }

  /** S4+P1-P4+X2: real SDSS frame ingest (single committed frame). */
  def q39FitsImage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgs = Ingest.images(s, s"$refData/images_medium_ds", "/root/reference/config")
    imgs.map(o => (o.zoom, o.width, o.height, o.band))
      .toDF("zoom", "width", "height", "band")
      .orderBy(col("zoom"))
  }

  /** P12 float_compress over embedding vectors via the native expression:
    * every output float has its 13 low mantissa bits zero and stays
    * within 1/1024 of the input — both invariants aggregated so the
    * rows-only check still pins semantics. */
  def q50FloatCompress(s: SparkSession, dir: String): DataFrame = {
    graft.plans.FloatCompressExpression.register(s)
    import graft.plans.FloatCompressExpression.float_compress_array
    load(s, dir, "embeddings")
      .select($"vec_id", $"embedding", float_compress_array($"embedding").as("comp"))
      .select($"vec_id",
        zip_with($"embedding", $"comp", (a, b) =>
          when(a =!= 0.0f && !isnan(a),
            (abs(b.cast("double") / a.cast("double") - 1.0) < 0.001).cast("int"))
            .otherwise(lit(1))).as("ok"))
      .select($"vec_id", aggregate($"ok", lit(0), (acc, x) => acc + x).as("n_ok"))
      .groupBy()
      .agg(count(lit(1)).as("n_vectors"), sum($"n_ok").cast("long").as("total_ok"))
  }

  /** Full J1+A2 on synthetic-fixture-style data is covered in ScalaTest;
    * here: viz-flatten of the ingested spectra (V1) with heal order 19. */
  def q40VizFlatten(s: SparkSession, dir: String): DataFrame = {
    val specs = Ingest.spectra(s, s"$refData/galaxy_small/spectra")
    VizCube.spectrumRows(specs)
      .groupBy("zoom")
      .count()
  }
}
