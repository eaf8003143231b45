package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.syntax._
import graft.operators.TextOps

object Probe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val exploded = graft.Tables.load(s, dir, "documents")
      .select($"doc_id", explode(TextOps.shingles($"text")).as("sh"))
    time("exploded.count")(exploded.count())
    time("exploded.count2")(exploded.count())
    val mins = exploded.groupBy($"doc_id").agg(
      (0 until 16).map(kk => min(xxhash64($"sh", lit(kk))).as(s"m$kk")).head,
      (1 until 16).map(kk => min(xxhash64($"sh", lit(kk))).as(s"m$kk")): _*)
    time("mins.count")(mins.count())
    val aggsW = collect_set($"sh").as("ss") +: (0 until 16).map(kk => min(xxhash64($"sh", lit(kk))).as(s"m$kk"))
    val withSet = exploded.groupBy($"doc_id").agg(aggsW.head, aggsW.tail: _*)
    time("withSet.count")(withSet.count())
    time("q23.full")(TextOps.q23MinHash(s, dir).collect().foreach(println))
    time("q23.full2")(TextOps.q23MinHash(s, dir).collect().foreach(println))
    s.stop()
  }
}
