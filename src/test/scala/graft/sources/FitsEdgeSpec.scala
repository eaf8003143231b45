package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Healpix

class FitsEdgeSpec extends AnyFunSuite {

  test("DATE-OBS formats: ISO with/without time, and dd/mm/yy (io.py:426-432)") {
    def mk(v: String) = Fits.Header(Vector("DATE-OBS" -> v))
    // 2004-11-10 is MJD 53319
    assert(SdssFits.imageTimeMjd(mk("2004-11-10")) == 53319.0)
    assert(math.abs(SdssFits.imageTimeMjd(mk("2004-11-10T12:00:00")) - 53319.5) < 1e-9)
    // legacy %d/%m/%y
    assert(SdssFits.imageTimeMjd(mk("10/11/04")) == 53319.0)
  }

  test("toMjd agrees with known anchors") {
    assert(SdssFits.toMjd(1858, 11, 17) == 0.0) // MJD epoch
    assert(SdssFits.toMjd(2000, 1, 1) == 51544.0)
  }

  test("image HDU with BSCALE/BZERO applies scaling") {
    // synthesize a tiny 2x2 int16 image with scaling
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    def card(k: String, v: String) =
      d.write((k.padTo(8, ' ') + "= " + v.reverse.padTo(20, ' ').reverse)
        .padTo(80, ' ').take(80).getBytes("US-ASCII"))
    card("SIMPLE", "T"); card("BITPIX", "16"); card("NAXIS", "2")
    card("NAXIS1", "2"); card("NAXIS2", "2")
    card("BSCALE", "0.5"); card("BZERO", "100.0")
    d.write("END".padTo(80, ' ').getBytes("US-ASCII"))
    d.write(new Array[Byte](2880 - 8 * 80)) // 7 cards + END
    Seq(2, 4, 6, 8).foreach(v => d.writeShort(v))
    d.write(new Array[Byte](2880 - 8))
    val bytes = out.toByteArray
    val hdus = Fits.readHdus(bytes)
    val img = Fits.readImage(bytes, hdus(0))
    assert(img(0)(0) == 101.0f && img(1)(1) == 104.0f)
  }

  test("BINTABLE logical 'L' columns read as 1/0 (one ASCII byte T/F)") {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    def card(k: String, v: String) =
      d.write((k.padTo(8, ' ') + "= " + v.reverse.padTo(20, ' ').reverse)
        .padTo(80, ' ').take(80).getBytes("US-ASCII"))
    def end(cards: Int): Unit = {
      d.write("END".padTo(80, ' ').getBytes("US-ASCII"))
      d.write(new Array[Byte](2880 - (cards + 1) * 80))
    }
    card("SIMPLE", "T"); card("BITPIX", "8"); card("NAXIS", "0"); end(3)
    card("XTENSION", "'BINTABLE'"); card("BITPIX", "8"); card("NAXIS", "2")
    card("NAXIS1", "9"); card("NAXIS2", "2")
    card("PCOUNT", "0"); card("GCOUNT", "1"); card("TFIELDS", "2")
    card("TTYPE1", "'FLAG'"); card("TFORM1", "'L'")
    card("TTYPE2", "'VAL'"); card("TFORM2", "'D'")
    end(12)
    d.writeByte('T'); d.writeDouble(1.5)
    d.writeByte('F'); d.writeDouble(2.5)
    d.write(new Array[Byte](2880 - 18))
    val bytes = out.toByteArray
    val t = Fits.readBinTable(bytes, Fits.readHdus(bytes)(1))
    assert(Fits.readDoubles(bytes, t, t.column("FLAG"), 0).sameElements(Array(1.0)))
    assert(Fits.readDoubles(bytes, t, t.column("FLAG"), 1).sameElements(Array(0.0)))
    assert(Fits.readDoubles(bytes, t, t.column("VAL"), 1).sameElements(Array(2.5)))
  }

  test("queryDisc stays correct near the poles and the RA wrap") {
    for ((ra, dec) <- Seq((0.5, 89.5), (359.9, -89.2), (0.01, 0.0), (180.0, 66.6))) {
      val radius = 8.0 / 60 * math.Pi / 180
      val cover = Healpix.queryDiscLonLat(10, ra, dec, radius).toSet
      // the center pixel itself must be covered
      assert(cover.contains(Healpix.ang2pixLonLat(10, ra, dec)), s"($ra,$dec)")
      assert(cover.size < 3000, s"($ra,$dec): ${cover.size}")
    }
  }
}
