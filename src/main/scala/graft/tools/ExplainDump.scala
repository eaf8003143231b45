// Dump `.explain("formatted")` for named SparkEntry queries into files —
// the plans/r16/<query>_{before,after}.txt deliverable of the
// optimization rounds. Scratch tool, bench-equivalent session config.
// Run: sbt "runMain graft.tools.ExplainDump <outDir> <suffix> q1,q2,..."
package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxMetadataStringLength", "500")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // build the frame (gates may run setup jobs eagerly); explain the
      // result the bench counts
      val df = fn(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val path = Paths.get(outDir, s"${name}_$suffix.txt")
      Files.write(path, formatted.getBytes(StandardCharsets.UTF_8))
      println(s"[explaindump] wrote $path (${formatted.length} chars)")
    }
    spark.stop()
  }
}
