// Multi-query wall/jobs/task-time profiler: for each named SparkEntry
// query, runs `reps` and prints the LAST rep's wall clock, job count and
// summed executor task-time — wall >> task/cpus means job-ladder
// latency, task-sec ~ wall*cpus means compute-bound. Scratch tool.
// Run: sbt "runMain graft.tools.ProfMany q1,q2,... [reps]"
package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object ProfMany {
  def main(args: Array[String]): Unit = {
    val names = args.head.split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("PROF_MIN_PARTITION_SIZE", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxMetadataStringLength", "500")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
        }
        ()
      }
    })
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      var line = ""
      (1 to reps).foreach { rep =>
        System.gc()
        val (j0, m0, g0) = (jobs.get(), taskMs.get(), gcMs.get())
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(250)
        val (dj, dm, dg) =
          (jobs.get() - j0, (taskMs.get() - m0) / 1e3, (gcMs.get() - g0) / 1e3)
        line = f"[profmany] $name%-36s rep$rep wall $wall%6.2f s  jobs $dj%3d  task-sec $dm%7.1f (t/32 ${dm / 32}%5.2f)  tgc $dg%5.1f  rows $n%d"
        println(line)
      }
    }
    spark.stop()
  }
}
