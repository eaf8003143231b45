package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bucketing claim from SCALE.md, proven on the physical plan: two
  * tables bucketed on the same key join with ZERO shuffle exchanges —
  * the co-location contract the 100 TB link/ML joins rely on. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("same-key bucketed tables join with no shuffle exchange") {
    import spark.implicits._
    // the suite may inherit another spec's session, so pin the runtime
    // confs explicitly (a tiny dim would otherwise broadcast) and write
    // the bucketed tables to an explicit temp path, not the warehouse
    val tmp = graft.TempDirs.create("bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.Tables.load(spark, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val lineitem = graft.Tables.load(spark, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity")

      graft.pipeline.Ingest.writeBucketed(orders, "orders_b", 8,
        Seq("o_orderkey"), path = Some(s"$tmp/orders_b"))
      graft.pipeline.Ingest.writeBucketed(lineitem, "lineitem_b", 8,
        Seq("l_orderkey"), path = Some(s"$tmp/lineitem_b"))

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
      val n = joined.count()
      assert(n == lineitem.count()) // every lineitem matches one order

      val p = joined.queryExecution.executedPlan.toString
      // the point of bucketing: the join-time shuffle is GONE — both
      // sides read already-co-partitioned files
      assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + p)
      assert(p.contains("SortMergeJoin"), p)
      // and the bucket scan advertises the layout
      assert(p.contains("Bucketed: true"), p)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
