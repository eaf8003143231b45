// Driver-side latency probe for the probe-batch path: times the pure
// DRIVER phases (signature-plan construction, store listing/read
// setup, candidate-plan construction) separately from cluster jobs, so
// the per-batch "no job running" gap names its owner. Scratch tool.
// Run: sbt "runMain graft.tools.ProfBatchDriver [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfBatchDriver {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
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
      println(f"[profbd] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-profbd").toString
    val store = s"$tmp/sigs"
    DocumentStream.nearDupDedupBatch(docs.filter(col("doc_id") % 2 === 0),
      store, 0.8, Some("b0"), allowLossy = true).count()
    (1 to 2).foreach { rep =>
      println(s"[profbd] --- rep $rep ---")
      val batch = docs.filter(col("doc_id") % 2 === 1)
      val sigsPlan = t("signatureFrame build (analysis only)")(
        TextOps.signatureFrame(batch))
      t("  optimizedPlan")(sigsPlan.queryExecution.optimizedPlan)
      t("  executedPlan")(sigsPlan.queryExecution.executedPlan)
      t("  toRdd")(sigsPlan.queryExecution.toRdd)
      val newSigs = t("localCheckpoint(false) (physical plan+rdd)")(
        sigsPlan.localCheckpoint(false))
      val newBands = DocumentStream.bucketedBands(newSigs)
      val storeDf = t("spark.read.parquet(bands) (listing+infer)")(
        spark.read.parquet(s"$store/bands"))
      val sigsDf = t("spark.read.parquet(sigs) (listing+infer)")(
        spark.read.parquet(s"$store/sigs"))
      val buckets = t("bucket distinct collect (job)")(
        newBands.select(col("band"), col("pbucket")).distinct()
          .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq)
      val pruned = t("prunedStoreBands plan")(
        DocumentStream.prunedStoreBands(Some(storeDf), buckets).get)
      t("pruned count (job)")(pruned.count())
      ()
    }
    graft.operators.TextOps.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
