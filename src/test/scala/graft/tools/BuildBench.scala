package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.pipeline.{BuildCube, FitsFixtures}

/** Full-pipeline scale smoke: N target positions, each with 5 bands of
  * frames and K repeat spectra → build (ingest → link → ML stack → viz)
  * at ~100× the PipelineSpec fixture size, timing each run end-to-end.
  * Exercises the partial-agg stack + broadcast cutout join under real
  * group fan-in (K repeats per target).
  *
  * Run: sbt "Test/runMain graft.tools.BuildBench [nTargets] [specsPerTarget]"
  */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val nTargets = args.headOption.map(_.toInt).getOrElse(10)
    val perTarget = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = graft.TempDirs.create("build-bench")
    val specDir = dir.resolve("spectra"); Files.createDirectories(specDir)
    val imgDir = dir.resolve("images"); Files.createDirectories(imgDir)
    val (loglam, flux, ivar) = FitsFixtures.specGrid()
    var run = 5000
    (0 until nTargets).foreach { t =>
      val (ra, dec) = (30.0 + t * 2.0, -20.0 + t * 1.5)
      for (band <- Seq("u", "g", "r", "i", "z")) {
        FitsFixtures.writeFrame(
          imgDir.resolve(f"frame-$band-$run%06d-3-0001.fits").toString,
          band, run, 3, 1, 512, 372, ra, dec)
        run += 1
      }
      (0 until perTarget).foreach { k =>
        // repeats at the exact target position (distinct mjd/fiber)
        FitsFixtures.writeSpectrum(
          specDir.resolve(f"spec-${4000 + t}%04d-${52000 + k}-${k + 1}%04d.fits").toString,
          ra, dec, 4000 + t, 52000 + k, k + 1, loglam, flux, ivar)
      }
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = dir.resolve("cube").toString
    val (spectra, tSpec) = timed {
      val d = graft.pipeline.Ingest.spectra(spark, specDir.toString).cache(); d.count(); d
    }
    val (images, tImg) = timed {
      val d = graft.pipeline.Ingest.images(spark, imgDir.toString,
        "/root/reference/config").cache(); d.count(); d
    }
    val (links, tLink) = timed {
      val d = graft.pipeline.Link.linkCutouts(spectra, images).cache(); d.count(); d
    }
    val (mlRows, tMl) = timed {
      graft.pipeline.MlCube.build(spectra, links, images).count()
    }
    val (vizRows, tViz) = timed {
      graft.pipeline.VizCube.build(spectra, links, images).count()
    }
    val linkCount = links.count()
    println(f"{'targets': $nTargets, 'spectra': ${nTargets * perTarget}, " +
      f"'frames': ${nTargets * 5}, " +
      f"'ingest_spec_sec': $tSpec%.1f, 'ingest_img_sec': $tImg%.1f, " +
      f"'link_sec': $tLink%.1f, 'ml_sec': $tMl%.1f, 'viz_sec': $tViz%.1f, " +
      f"'links': $linkCount, 'ml_rows': $mlRows, 'viz_rows': $vizRows}")
    // sanity: every target stacks all its repeats with 5 bands at 5 zooms
    require(mlRows == nTargets * 5L, s"ml rows $mlRows")
    require(linkCount == nTargets.toLong * perTarget * 25, s"links $linkCount")
    spark.stop()
  }
}
