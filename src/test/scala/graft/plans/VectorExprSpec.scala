package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector kernels: bit-identical to the HOF folds they replaced,
  * null/mismatch semantics preserved, and running inside codegen. */
class VectorExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0D, (acc, v) -> acc + v)")
  private def hofL1 = expr(
    "aggregate(zip_with(a, b, (x, y) -> abs(double(x) - double(y))), 0.0D, (acc, v) -> acc + v)")

  test("native dot/L1/cosine are bit-identical to the interpreted HOF folds") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      VectorExpressions.vec_dot($"a", $"b").as("nd"), hofDot.as("hd"),
      VectorExpressions.vec_l1($"a", $"b").as("nl"), hofL1.as("hl"),
      VectorExpressions.vec_cos($"a", $"b").as("nc"),
      (hofDot / (sqrt(expr(
        "aggregate(zip_with(a, a, (x, y) -> double(x) * double(y)), 0.0D, (acc, v) -> acc + v)")) *
        sqrt(expr(
          "aggregate(zip_with(b, b, (x, y) -> double(x) * double(y)), 0.0D, (acc, v) -> acc + v)"))))
        .as("hc")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"dot: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"l1: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(5)), s"cos: $r")
    }
  }

  test("nanl1 skips NaN pairs exactly like the HOF nansum fold") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { i =>
      def arr = Array.fill(32)(
        if (rnd.nextInt(5) == 0) Float.NaN else rnd.nextFloat() * 2 - 1)
      (i.toLong, arr, arr)
    }
    val df = rows.toDF("id", "a", "b")
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> abs(double(x) - double(y))), 0.0D, " +
        "(acc, v) -> acc + (CASE WHEN isnan(v) THEN 0.0D ELSE v END))")
    val out = df.select(
      VectorExpressions.vec_nanl1($"a", $"b").as("n"), hof.as("h")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("null array and length mismatch yield null (zip_with parity)") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),
      (2L, null.asInstanceOf[Array[Float]], Array(3f, 4f)),
      (3L, Array(1f, 2f, 5f), Array(3f, 4f))) // length mismatch
      .toDF("id", "a", "b")
    val out = df.select($"id", VectorExpressions.vec_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
  }

  test("the kernels run inside whole-stage codegen") {
    // local relations fold away before execution, so drive the kernel
    // from a parquet scan (FileSourceScanExec is codegen-backed)
    VectorExpressions.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VectorExpressions.vec_cos(col("embedding"), col("embedding")).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), "kernel fell out of whole-stage codegen:\n" + p)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted sets") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    // random word sets (incl. empty and disjoint) — dedup + sort inside
    // the query so both operands go through the same production shape
    val rows = (0 until 300).map { i =>
      val a = Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(40)}").distinct
      val b = Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(40)}").distinct
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .select($"id", sort_array($"a").as("a"), sort_array($"b").as("b"))
    val bad = df.select(
        VectorExpressions.sorted_intersect_count($"a", $"b").as("walk"),
        size(array_intersect($"a", $"b")).as("hash"))
      .filter($"walk" =!= $"hash").count()
    assert(bad == 0L)
    // null array → null (either side)
    val nulls = Seq((Seq("x"), null: Seq[String])).toDF("a", "b")
      .select(VectorExpressions.sorted_intersect_count($"a", $"b").as("c"),
        VectorExpressions.sorted_intersect_count($"b", $"a").as("d"))
      .collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("the LSH verify jaccard is unchanged by the merge-walk rewrite") {
    import spark.implicits._
    // |A∩B|/(|A|+|B|−|A∩B|) over sorted sets ≡ intersect/union over raw
    // sets — the algebraic identity the verify stage now relies on
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      val a = Seq.fill(5 + rnd.nextInt(20))(s"s${rnd.nextInt(25)}").distinct
      val b = Seq.fill(5 + rnd.nextInt(20))(s"s${rnd.nextInt(25)}").distinct
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val walk = df.select($"id", sort_array($"a").as("a"), sort_array($"b").as("b"))
      .select($"id",
        (VectorExpressions.sorted_intersect_count($"a", $"b").cast("double") /
          (size($"a") + size($"b") -
            VectorExpressions.sorted_intersect_count($"a", $"b"))).as("jac"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val classic = df.select($"id",
        (size(array_intersect($"a", $"b")).cast("double") /
          size(array_union($"a", $"b"))).as("jac"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(walk == classic)
  }
}
