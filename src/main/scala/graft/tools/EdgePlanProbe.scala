// Final-AQE-plan probe for the co-engagement edge derivation: builds
// the coEdges-equivalent frame in BOTH the r16 shape (bare distinct +
// defaultParallelism REPARTITION_BY_NUM) and the r17 shape (single
// keyed corpus exchange whose sized width the dedup aggregate reuses),
// executes both, and writes the FINAL adaptive plans — names which
// exchange the pair-generation join actually ran on and at what
// parallelism. Scratch tool; also the generator of
// plans/r17/coedges_{before,after}.txt.
// Run: sbt "runMain graft.tools.EdgePlanProbe [outDir]"
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object EdgePlanProbe {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")

    def capped(bu: DataFrame): DataFrame = {
      val occ = bu.groupBy($"b").agg(count(lit(1)).as("occ"))
      val ranked = occ.select($"b", $"occ",
        row_number().over(Window.orderBy($"occ", $"b")).as("rn"),
        count(lit(1)).over(Window.partitionBy()).as("n"))
      val cap = ranked
        .filter($"rn" === expr("(n * 9 + 9) div 10"))
        .select($"occ".as("cap"))
      occ.crossJoin(broadcast(cap)).filter($"occ" <= $"cap").select($"b")
    }
    def pairAgg(ku: DataFrame): DataFrame =
      ku.as("l").join(ku.as("r"),
          col("l.b") === col("r.b") && col("l.user_id") < col("r.user_id"))
        .groupBy(col("l.user_id").as("u"), col("r.user_id").as("v"))
        .agg(count(lit(1)).as("w"))
        .filter($"w" >= 3L)
        .select($"u", $"v")
    val bExpr = concat_ws("|", $"event_type",
      expr("unix_timestamp(ts) div 3600").cast("string")).as("b")

    // r16 shape: distinct (shuffles on (b, user)) + checkpoint +
    // defaultParallelism REPARTITION_BY_NUM before the pair join
    val bu16 = ev.select(bExpr, $"user_id").distinct().localCheckpoint(false)
    val ku16 = bu16.join(capped(bu16), "b")
      .localCheckpoint(false)
      .repartition(spark.sparkContext.defaultParallelism, $"b")
    val before = pairAgg(ku16)

    // r17 shape: ONE keyed corpus exchange at a size-aware width; the
    // (b, user) dedup reuses it, and the pair join rides the same
    // width via the re-pinned ku
    val width = graft.operators.Spread.sizedWidthFromBytes(spark,
      ev.queryExecution.optimizedPlan.stats.sizeInBytes, 256L << 10)
    println(s"[edgeplanprobe] width=$width")
    val bu17 = ev.select(bExpr, $"user_id")
      .repartition(width, $"b")
      .dropDuplicates("b", "user_id")
      .localCheckpoint(false)
    val ku17 = bu17.join(broadcast(capped(bu17)), "b")
      .localCheckpoint(false)
      .repartition(width, $"b")
    val after = pairAgg(ku17)
    println("[edgeplanprobe] ku17 optimized: " +
      ku17.queryExecution.optimizedPlan.toString.take(400))
    println("[edgeplanprobe] after optimized: " +
      after.queryExecution.optimizedPlan.toString.take(1200))

    def report(tag: String, edges: DataFrame): Unit = {
      println(s"$tag edges = " + edges.count())
      val plan = edges.queryExecution.executedPlan.toString
      println(plan.take(4000))
      outDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"coedges_$tag.txt"),
          (s"// final AQE plan of the co-engagement edge derivation " +
            s"($tag shape), executed at sf0.1 on local[32]\n" + plan)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    report("before", before)
    report("after", after)
    spark.stop()
  }
}
