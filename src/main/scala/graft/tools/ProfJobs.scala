package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-job profiler for any SparkEntry query: registers a listener that
  * names every job (callsite + duration), runs the query `reps` times,
  * and prints the job table of the LAST rep — so a fixed-latency
  * regression names the exact action that pays it. Scratch tool. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = mutable.Map.empty[Int, (Long, String)]
    val rows = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          .linesIterator.next().take(90)
        starts(j.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          rows += ((j.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
    })
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    (1 to reps).foreach { i =>
      rows.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"[profjobs] rep $i: $total%.2f s total, $n rows, ${rows.size} jobs")
      if (i == reps) rows.sortBy(_._1).foreach { case (id, sec, site) =>
        println(f"[profjobs]   job $id%3d  $sec%6.2f s  $site")
      }
      println(f"[profjobs] rep $i job-time sum: ${rows.map(_._2).sum}%.2f s")
    }
    spark.stop()
  }
}
