package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Healpix

/** The `spark.sql.extensions` injection path: a session built with
  * [[GraftExtensions]] exposes the native expressions to plain SQL with
  * no programmatic registration. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=GraftExtensions exposes the native functions to SQL") {
    // force a NEW session: extensions only apply at session creation
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()

    val cell = spark.sql("SELECT healpix_cell(45.0D, 0.0D, 11) AS c").head().getLong(0)
    assert(cell == Healpix.ang2pixLonLat(11, 45.0, 0.0))

    val disc = spark.sql(
      "SELECT size(healpix_disc(45.0D, 0.0D, 10, 0.0023)) AS n").head().getInt(0)
    assert(disc > 0)

    val fc = spark.sql("SELECT float_compress(CAST(1.2345678 AS FLOAT)) AS v")
      .head().getFloat(0)
    assert((java.lang.Float.floatToIntBits(fc) & 0x1fff) == 0)
    assert(math.abs(fc / 1.2345678f - 1) < 0.001)

    val sh = spark.sql("SELECT simhash64('a b c') AS s, simhash64('a b c') AS t").head()
    assert(sh.getLong(0) == sh.getLong(1))
    assert(sh.getLong(0) != 0L)
  }
}
