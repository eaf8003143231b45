package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics (union + window carry-forward) and simhash
  * Hamming-ball recall. */
class AsofSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asofJoin picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // key 1: right rows at 5 and 10 → sees t=10 (<= inclusive)
      (2L, 100L, 7L),  //        between rights → sees t=5
      (3L, 100L, 4L),  //        before all rights → null
      (4L, 200L, 50L)  // key 2: no right rows at all → null
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 5L, 1.0),
      (100L, 10L, 2.0),
      (100L, 12L, 3.0), // after every left → never picked
      (100L, 5L, 0.5)   // duplicate (k, t): max payload struct wins → 1.0
    ).toDF("k", "t", "v")
    val out = AsofOps.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out == Map(
      1L -> Some(2.0), // t=10 right row visible at left t=10
      2L -> Some(1.0), // dedup kept max(struct(v)) = 1.0 at t=5
      3L -> None,
      4L -> None), out.toString)
  }

  test("q62 as-of columns: every purchase appears exactly once") {
    val out = AsofOps.q62AsofJoin(spark, "/root/testdata/sf0.001")
    val n = out.count()
    val distinct = out.select("event_id").distinct().count()
    assert(n == distinct, s"$n rows / $distinct distinct purchases")
    // carried views never come from the future
    import spark.implicits._
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_sec", unix_timestamp($"ts"))
      .select($"event_id".as("view_event_id"), $"ts_sec".as("view_ts"))
    val bad = out.join(ev, "view_event_id").filter($"view_ts" > $"ts_sec").count()
    assert(bad == 0)
  }

  test("simhash banding finds planted near-identical docs (pigeonhole recall)") {
    import spark.implicits._
    val base = (0 until 300).map(i => s"tok$i").mkString(" ")
    val docs = ((0 until 30).map(i =>
      (i.toLong, s"completely different content $i " + s"z${i * 5} q${i * 11} " * 12)) ++
      Seq((500L, base), (501L, base.replace("tok150", "edited"))))
      .toDF("doc_id", "text")
    val sh = docs.select($"doc_id", TextOps.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one token of 300 changed: fingerprints land deep in near-dup
    // territory (random pairs sit at ~32 of 64 bits)
    val hamming = java.lang.Long.bitCount(sh(500L) ^ sh(501L))
    assert(hamming <= 8, s"hamming=$hamming")
    // pigeonhole guarantee of the 4×16 banding: ANY pair within Hamming
    // 3 shares at least one exact band — adversarial bit placements
    def bands(x: Long) = (0 until 4).map(b => (x >>> (16 * b)) & 0xFFFFL)
    val fp = 0x5A5A5A5A5A5A5A5AL
    for (flips <- Seq(Seq(0), Seq(0, 17), Seq(0, 17, 34), Seq(15, 16, 63), Seq(5, 6, 7))) {
      val other = flips.foldLeft(fp)((acc, b) => acc ^ (1L << b))
      assert(bands(fp).zip(bands(other)).exists { case (a, b) => a == b },
        s"flips=$flips")
    }
  }
}
