package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SCALE.md's streaming-dedup numbers:
  * per-batch wall time of the store machinery and the writer-open cost
  * of candidate store layouts (directories-per-bucket vs sorted
  * in-file buckets). Run: `sbt "runMain graft.tools.ProfDedup <sfDir>"`. */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextOps
    import graft.streaming.DocumentStream
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("warm signatureFrame")(TextOps.signatureFrame(docs).count())
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    t("batch0 total (fresh store)")(
      DocumentStream.nearDupDedupBatch(b0, s"$tmp/s1", 0.8, Some("b0")).count())
    t("batch1 total (probe store)")(
      DocumentStream.nearDupDedupBatch(b1, s"$tmp/s1", 0.8, Some("b1")).count())
    t("pruned store scan")(
      spark.read.parquet(s"$tmp/s1/bands")
        .filter(col("band") === 0 && col("pbucket") === 1).count())
    // layout comparison: writer-open cost ∝ dirs × files
    val sigs = TextOps.signatureFrame(b0).localCheckpoint()
    val bands = DocumentStream.bucketedBands(sigs)
      .withColumn("rep", col("doc_id"))
    t("bands write 256 dirs")(
      bands.repartition(col("band"), col("pbucket"))
        .write.partitionBy("band", "pbucket")
        .mode("overwrite").parquet(s"$tmp/w-dirs/btag=x"))
    t("bands write band dirs + sorted")(
      bands.repartitionByRange(col("band"), col("pbucket"))
        .sortWithinPartitions(col("pbucket"))
        .write.partitionBy("band")
        .mode("overwrite").parquet(s"$tmp/w-sorted/btag=x"))
    TextOps.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
