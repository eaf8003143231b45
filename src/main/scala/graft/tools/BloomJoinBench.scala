// Measures the bloom semi/anti join's shuffle-volume claim: the same
// semi join plain vs through SketchOps.bloomSemiJoin, with broadcast
// DISABLED so the big-big shapes actually differ (with broadcast on,
// a small right side makes both paths broadcast joins and there is
// nothing to measure — the bloom path exists for the right side that
// does NOT fit a broadcast).
// Run: sbt "runMain graft.tools.BloomJoinBench [sfDir]"
package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

object BloomJoinBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the operator's own broadcast() hints still apply — the POINT is
      // that only the tiny bloom/key frames are hinted, never the fact side
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .filter($"c_nationkey" < 5)

    def measure(tag: String)(mk: => org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      Thread.sleep(1000) // drain listener events (bus is private API)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = mk.count()
      val ms = (System.nanoTime() - t0) / 1000000
      Thread.sleep(1000) // drain listener events before reading
      (n, shuffleBytes.get(), ms)
    }

    val (nPlainS, bPlainS, msPlainS) = measure("plain_semi") {
      orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left_semi")
    }
    val (nBloomS, bBloomS, msBloomS) = measure("bloom_semi") {
      SketchOps.bloomSemiJoin(orders, $"o_custkey", cust, $"c_custkey")
    }
    val (nPlainA, bPlainA, msPlainA) = measure("plain_anti") {
      orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left_anti")
    }
    val (nBloomA, bBloomA, msBloomA) = measure("bloom_anti") {
      SketchOps.bloomAntiJoin(orders, $"o_custkey", cust, $"c_custkey")
    }
    require(nPlainS == nBloomS, s"semi mismatch: $nPlainS != $nBloomS")
    require(nPlainA == nBloomA, s"anti mismatch: $nPlainA != $nBloomA")

    println(
      s"""{"bench":"bloom_join","sf":"$dir","broadcast":"disabled",""" +
      s""""semi":{"rows":$nPlainS,"plain_shuffle_bytes":$bPlainS,""" +
      s""""bloom_shuffle_bytes":$bBloomS,"plain_ms":$msPlainS,"bloom_ms":$msBloomS},""" +
      s""""anti":{"rows":$nPlainA,"plain_shuffle_bytes":$bPlainA,""" +
      s""""bloom_shuffle_bytes":$bBloomA,"plain_ms":$msPlainA,"bloom_ms":$msBloomA}}""")
    spark.stop()
  }
}
