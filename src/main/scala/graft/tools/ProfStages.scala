// Stage-level profile of one SparkEntry query: per stage, task count,
// summed task time, GC time, input/shuffle records — names the stage
// (and thus the operator span) a compute-bound query pays. Scratch.
// Run: sbt "runMain graft.tools.ProfStages <query> [reps]"
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

object ProfStages {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = mutable.ArrayBuffer.empty[(Int, Int, Double, Double, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        rows += ((si.stageId, si.numTasks,
          m.executorRunTime / 1e3, m.jvmGCTime / 1e3,
          m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten,
          si.name.linesIterator.next().take(70)))
        ()
      }
    })
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      rows.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[profstages] rep $rep: $wall%.2f s, $n rows, ${rows.size} stages, task-sec ${rows.map(_._3).sum}%.1f")
      if (rep == reps) rows.sortBy(-_._3).take(25).foreach {
        case (id, nt, sec, gc, in, out, nm) =>
          println(f"[profstages]   stage $id%4d  $sec%7.2f s (gc $gc%5.1f)  tasks $nt%3d  in $in%9d  out $out%9d  $nm")
      }
    }
    spark.stop()
  }
}
