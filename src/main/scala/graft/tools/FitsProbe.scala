package graft.tools
import java.nio.file.{Files, Paths}
import graft.sources.{Fits, SdssFits}

object FitsProbe {
  def main(args: Array[String]): Unit = {
    val specPath = "/root/reference/data/raw/spectra/spec-4500-55543-0331.fits"
    val sp = SdssFits.loadSpectrum(Files.readAllBytes(Paths.get(specPath)), specPath, 4)
    println(s"spec ra=${sp.ra} dec=${sp.dec} time=${sp.time} plate=${sp.plateid} mjd=${sp.mjd} fiber=${sp.fiberid}")
    println(s"spec pyramid lens=${sp.pyramid.map(_._1.length)}")
    val z0 = sp.pyramid.head
    val finite = z0._2.count(v => !v.isNaN)
    println(s"zoom0 finite flux=$finite/${z0._2.length} wl0=${z0._1.head} wlN=${z0._1.last} fluxMid=${z0._2(2000)} sigmaMid=${z0._3(2000)}")

    val framePath = "/root/reference/data/raw/images_medium_ds/frame-u-004948-3-0199.fits.bz2"
    val gains = SdssFits.readCcdTsv("/root/reference/config/ccd_gain.tsv")
    val dvs = SdssFits.readCcdTsv("/root/reference/config/ccd_dark_variance.tsv")
    val t0 = System.nanoTime()
    val fr = SdssFits.loadFrame(Files.readAllBytes(Paths.get(framePath)), framePath, gains, dvs, 4)
    println(s"frame band=${fr.band} run=${fr.run} camcol=${fr.camcol} field=${fr.field} time=${fr.timeMjd}")
    println(s"frame shapes=${fr.pyramid.map { case (f, _) => (f(0).length, f.length) }} in ${(System.nanoTime()-t0)/1e9}s")
    val (f0, s0) = fr.pyramid.head
    println(s"flux[744][1024]=${f0(744)(1024)} sigma[744][1024]=${s0(744)(1024)}")
    val sflat = s0.flatten
    println(s"sigma range=${sflat.min}..${sflat.max} nan=${sflat.count(_.isNaN)}")
    println(s"wcs=${fr.wcs}")
    val (cra, cdec) = fr.wcs.pix2world(1024, 744.5)
    println(s"center sky=($cra,$cdec) crval=(${fr.wcs.crval1},${fr.wcs.crval2})")
  }
}
