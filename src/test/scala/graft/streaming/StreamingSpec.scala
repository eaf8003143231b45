package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalOps

/** Streaming results must agree with their batch twins — the
  * batch-as-bounded-stream identity. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("stateful sessionize (flatMapGroupsWithState) equals the batch window query") {
    val streaming = EventStream.sessionize(spark, dir).collect()
      .map(s => (s.user_id, s.n_sessions.toLong, s.n_events)).sorted
    val batch = RelationalOps.q21Sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streaming.toSeq == batch.toSeq)
  }

  test("windowed stream aggregation covers every event exactly once") {
    val win = EventStream.windowedCounts(spark, dir)
    val total = win.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total == graft.Tables.load(spark, dir, "events").count())
  }
}
