package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiling harness for the viz-cube build regression (VERDICT r6 #1):
  * builds the SAME fixture Bench.buildMetrics uses (400 spectra / 100
  * frames), then times `VizCube.build(...).count()` in REPEATS, split
  * into the V1 (spectrum fan-out) and V2 (cutout pixel fan-out) legs so
  * a regression names its leg. Pass `--dirty` to first simulate bench
  * suite residue (many completed jobs + dead broadcasts, no GC) to test
  * the suite-state hypothesis.
  */
object ProfViz {
  def main(args: Array[String]): Unit = {
    val dirty = args.contains("--dirty")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.Files

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profviz] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    if (dirty) {
      // simulate the ~133-query suite's residue: repeated shuffles +
      // broadcasts left for the ContextCleaner, heap churn
      import org.apache.spark.sql.functions._
      val df = spark.range(0, 2000000).withColumn("k", col("id") % 1000)
      (1 to 60).foreach { _ =>
        df.groupBy("k").count().count()
        spark.range(0, 1000).join(
          org.apache.spark.sql.functions.broadcast(spark.range(0, 100)), "id").count()
      }
      println("[profviz] dirty residue built (120 jobs, 60 broadcasts)")
    }

    val nTargets = 20
    val perTarget = 20
    val dir = Files.createTempDirectory("graft-profviz")
    val specDir = dir.resolve("spectra"); Files.createDirectories(specDir)
    val imgDir = dir.resolve("images"); Files.createDirectories(imgDir)
    val (loglam, flux, ivar) = graft.pipeline.FitsFixtures.specGrid()
    var run = 5000
    (0 until nTargets).foreach { tt =>
      val (ra, dec) = (30.0 + tt * 2.0, -20.0 + tt * 1.5)
      for (band <- Seq("u", "g", "r", "i", "z")) {
        graft.pipeline.FitsFixtures.writeFrame(
          imgDir.resolve(f"frame-$band-$run%06d-3-0001.fits").toString,
          band, run, 3, 1, 512, 372, ra, dec)
        run += 1
      }
      (0 until perTarget).foreach { k =>
        graft.pipeline.FitsFixtures.writeSpectrum(
          specDir.resolve(f"spec-${4000 + tt}%04d-${52000 + k}-${k + 1}%04d.fits").toString,
          ra, dec, 4000 + tt, 52000 + k, k + 1, loglam, flux, ivar)
      }
    }

    val spectra = t("ingest spectra") {
      val d = graft.pipeline.Ingest.spectra(spark, specDir.toString).cache(); d.count(); d
    }
    val images = t("ingest images") {
      val d = graft.pipeline.Ingest.images(spark, imgDir.toString,
        sys.env.getOrElse("SPARK_GRAFT_REF_CONFIG", "/root/reference/config")).cache()
      d.count(); d
    }
    val links = t("link") {
      val d = graft.pipeline.Link.linkCutouts(spectra, images).cache(); d.count(); d
    }

    (1 to 3).foreach { rep =>
      val v1 = t(s"rep$rep V1 spectrumRows") {
        graft.pipeline.VizCube.spectrumRows(spectra).count()
      }
      val v2 = t(s"rep$rep V2 cutoutRows") {
        graft.pipeline.VizCube.cutoutRows(links, images).count()
      }
      val all = t(s"rep$rep full build") {
        graft.pipeline.VizCube.build(spectra, links, images).count()
      }
      println(s"[profviz] rep$rep rows: v1=$v1 v2=$v2 all=$all")
    }

    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete(); ()
    }
    rm(dir.toFile)
    spark.stop()
  }
}
