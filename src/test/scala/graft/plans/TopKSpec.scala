package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom grouped-top-k operator: rewrite firing conditions, plan
  * shape, and exact parity with the window form it replaces. */
class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    TopKPerKey.install(s)
    s
  }

  import spark.implicits._

  private def data = {
    // 4 keys × 50 rows, spread over 8 partitions so every key straddles
    // partitions (exercises the partial-stage bound + final merge)
    (0 until 200).map(i => (s"k${i % 4}", i.toLong, (i * 37 % 100).toLong))
      .toDF("key", "id", "score").repartition(8)
  }

  private def windowed(k: Int) = {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    data.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }

  test("rewrite fires when rank is dropped: plan has TopKPerKey, no Window sort") {
    val df = windowed(5).select($"key", $"id", $"score")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "rewrite did not fire:\n" + p)
    assert(!p.contains("Window"), "window survived the rewrite:\n" + p)
    assert(!p.contains("Sort"), "sort in a heap-based plan:\n" + p)
    // both stages present: partial (pre-shuffle) + final
    assert(p.contains("TopKPerKeyPartial"), p)
  }

  test("rewrite does NOT fire when the rank column is kept") {
    val df = windowed(5) // rk still in output
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKey"), p)
    assert(p.contains("Window"), p)
  }

  test("native top-k returns exactly the window-form rows") {
    val native = windowed(5).select($"key", $"id", $"score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // reference: keep rk in output (rewrite blocked), then drop it
    val ref = windowed(5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == ref)
    assert(native.size == 20) // 4 keys × 5 (total order → unique answer)
  }

  test("k larger than the group returns whole groups; k=1 via rank=1 works") {
    val whole = windowed(1000).select($"key", $"id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(whole.size == 200)
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val top1 = data.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).select($"key", $"id", $"score")
    top1.collect()
    assert(top1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(top1.count() == 4)
  }

  test("null keys and null order values match the window form exactly") {
    // row_number's NULLS ordering and null-key grouping must survive the
    // heap rewrite: nulls in the order column (DESC → NULLS LAST) and a
    // null group key (its own group under ClusteredDistribution)
    val rows = Seq[(java.lang.String, java.lang.Long, java.lang.Long)](
      ("a", 1L, 10L), ("a", 2L, null), ("a", 3L, 30L), ("a", 4L, null),
      (null, 5L, 50L), (null, 6L, 5L), (null, 7L, null),
      ("b", 8L, 8L))
    val df = rows.toDF("key", "id", "score").repartition(4)
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
    val native = q.select($"key", $"id", $"score")
    native.collect()
    assert(native.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    def s(r: org.apache.spark.sql.Row) =
      (Option(r.getString(0)), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
    // reference keeps rk in its output, which blocks the rewrite
    assert(native.collect().map(s).toSet == q.collect().map(s).toSet)
    assert(native.count() == 5) // a:2, null-key:2, b:1 (whole group)
  }

  private def tied = {
    // score = i % 7 → heavy ties in every key, so rank/dense_rank keep
    // MORE than k rows per key and the tie-bucket path is exercised
    (0 until 280).map(i => (s"k${i % 4}", i.toLong, (i % 7).toLong))
      .toDF("key", "id", "score").repartition(8)
  }

  test("rank rewrite: ties at the k-th value all survive, plan is native") {
    val w = Window.partitionBy($"key").orderBy($"score".desc)
    val q = tied.withColumn("rk", rank().over(w)).filter($"rk" <= 3)
    val native = q.select($"key", $"id", $"score")
    native.collect()
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "rank rewrite did not fire:\n" + p)
    assert(!p.contains("Window"), p)
    val got = native.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // reference keeps rk (rewrite blocked) — the window engine's answer
    val ref = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == ref)
    // rank ≤ 3 over 7 tied levels of 10 rows each: ranks 1,11,21 →
    // only rank 1's ties qualify... (280/4=70 rows per key, 10 per level)
    assert(got.size == ref.size && got.nonEmpty)
  }

  test("dense_rank rewrite: k distinct levels survive with all their ties") {
    val w = Window.partitionBy($"key").orderBy($"score".desc)
    val q = tied.withColumn("rk", dense_rank().over(w)).filter($"rk" <= 3)
    val native = q.select($"key", $"id", $"score")
    native.collect()
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "dense_rank rewrite did not fire:\n" + p)
    assert(!p.contains("Window"), p)
    val got = native.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val ref = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == ref)
    // 3 distinct score levels × 10 ties × 4 keys
    assert(got.size == 120)
  }

  test("rank/dense_rank with nulls in the order column match the window form") {
    val rows = Seq[(java.lang.String, java.lang.Long, java.lang.Long)](
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, null), ("a", 4L, 5L),
      ("a", 5L, null), ("b", 6L, 1L), ("b", 7L, 1L))
    val df = rows.toDF("key", "id", "score").repartition(4)
    val w = Window.partitionBy($"key").orderBy($"score".desc)
    for (fn <- Seq(rank(), dense_rank())) {
      val q = df.withColumn("rk", fn.over(w)).filter($"rk" <= 2)
      val native = q.select($"key", $"id")
      native.collect()
      assert(native.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(native.collect().map(_.getLong(1)).toSet ==
        q.collect().map(_.getLong(1)).toSet, s"mismatch for $fn")
    }
  }

  test("q79 oracle query takes the native path and matches its window twin") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.operators.TextOps.q79TopDocsNative(spark, dir)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val native = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"source").orderBy($"n_chars".desc, $"doc_id")
    val twin = graft.Tables.load(spark, dir, "documents")
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == twin)
  }
}
