// Per-JOB attribution for one store-present nearDupDedupBatch call:
// prints every cluster job the batch launches (duration, stage count,
// task count, task-time) so the 40-job probe-batch ladder names its
// rungs. Scratch tool.
// Run: sbt "runMain graft.tools.ProfBatchJobs [sfDir]"
package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfBatchJobs {
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
    import graft.streaming.DocumentStream
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count()
    case class J(start: Long, var end: Long = 0L, var stages: Int = 0,
      var tasks: Int = 0, var taskMs: Long = 0L, desc: String = "")
    val byJob = mutable.LinkedHashMap.empty[Int, J]
    val active = new java.util.concurrent.ConcurrentHashMap[Int, Int]() // stage->job
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        byJob.synchronized {
          byJob(e.jobId) = J(e.time, desc = d.takeRight(60))
        }
        e.stageIds.foreach(s => active.put(s, e.jobId))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        byJob.synchronized { byJob.get(e.jobId).foreach(_.end = e.time) }
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = active.getOrDefault(e.stageInfo.stageId, -1)
        byJob.synchronized {
          byJob.get(j).foreach { x =>
            x.stages += 1; x.tasks += e.stageInfo.numTasks
            x.taskMs += e.stageInfo.taskMetrics.executorRunTime
          }
        }
        ()
      }
    })
    val tmp = java.nio.file.Files.createTempDirectory("graft-profbj").toString
    val store = s"$tmp/sigs"
    // build a store first (untimed)
    DocumentStream.nearDupDedupBatch(docs.filter(col("doc_id") % 2 === 0),
      store, 0.8, Some("b0"), allowLossy = true).count()
    Thread.sleep(400)
    byJob.synchronized(byJob.clear())
    val t0 = System.nanoTime()
    DocumentStream.nearDupDedupBatch(docs.filter(col("doc_id") % 2 === 1),
      store, 0.8, Some("b1"), allowLossy = true).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(400)
    byJob.synchronized {
      println(f"[profbj] probe batch wall $wall%.2f s, ${byJob.size} jobs")
      var prevEnd = 0L
      byJob.foreach { case (id, j) =>
        val gap = if (prevEnd == 0) 0 else j.start - prevEnd
        prevEnd = j.end
        println(f"[profbj] job $id%3d  ${(j.end - j.start) / 1e3}%6.2f s  gap ${gap / 1e3}%5.2f  stages ${j.stages}%2d tasks ${j.tasks}%3d task-s ${j.taskMs / 1e3}%6.2f  ${j.desc}")
      }
    }
    graft.operators.TextOps.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
