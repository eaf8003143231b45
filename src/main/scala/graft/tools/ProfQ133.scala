// Per-phase wall-time + job-count + executor-task-time breakdown of
// q133 under Bench-equivalent constraints (local[32], sf0.1, two
// reps) — the harness behind the SCALE.md driver-vs-builder delta
// note. Wall >> task-time/32 means the phase is job-ladder latency
// (scheduler + filesystem round-trips), not compute.
// Run: sbt "runMain graft.tools.ProfQ133 [sfDir]"
package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfQ133 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
        ()
      }
    })
    import graft.streaming.DocumentStream
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count()
    def t[A](label: String)(f: => A): A = {
      val (j0, m0) = (jobs.get(), taskMs.get())
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain async; close enough for a profile
      Thread.sleep(200)
      val (dj, dm) = (jobs.get() - j0, (taskMs.get() - m0) / 1e3)
      println(f"[prof-q133] $label%-28s wall $wall%6.2f s  jobs $dj%3d  task-sec $dm%7.1f  (task/32 ${dm / 32}%5.2f)")
      r
    }
    (1 to 2).foreach { rep =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-prof133-$rep")
      val store = s"$tmp/sigs"
      println(s"[prof-q133] --- rep $rep ---")
      t("TOTAL") {
        t("batch 0a (%4==0, fresh)")(DocumentStream.nearDupDedupBatch(
          docs.filter(col("doc_id") % 4 === 0), store, 0.8,
          Some("batch_0a"), allowLossy = true).count())
        t("batch 0b (%4==2, probe)")(DocumentStream.nearDupDedupBatch(
          docs.filter(col("doc_id") % 4 === 2), store, 0.8,
          Some("batch_0b"), allowLossy = true).count())
        t("compactSigStore")(DocumentStream.compactSigStore(spark, store))
        t("batch 1 (odds, probe)")(DocumentStream.nearDupDedupBatch(
          docs.filter(col("doc_id") % 2 === 1), store, 0.8,
          Some("batch_1"), allowLossy = true).count())
      }
      graft.operators.TextOps.deleteRecursively(tmp)
    }
    spark.stop()
  }
}
