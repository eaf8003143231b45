package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.load

/** Text-curation operator semantics not covered by the oracle gate. */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("approx token percentiles hit the exact rank on testdata groups") {
    import spark.implicits._
    // the sketch guarantee is on RANK, not value: at accuracy 10⁴ the
    // returned (observed) value's rank is within n/10⁴ ≈ 0 of the
    // target rank p·(n−1); exact `percentile` interpolates BETWEEN
    // ranks, so compare by rank neighborhood, not value distance
    val docs = load(spark, dir, "documents")
    val tokens = docs
      .select($"source", size(split($"text", " ")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = TextOps.tokenPercentilesApprox(docs)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == tokens.keySet)
    for ((src, ps) <- approx; (v, p) <- ps.zip(Seq(0.5, 0.9, 0.99))) {
      val sorted = tokens(src)
      val target = p * (sorted.length - 1)
      val lo = sorted.count(_ < v) // smallest rank v can hold
      val hi = sorted.count(_ <= v) - 1 // largest rank v can hold
      assert(target >= lo - 1 && target <= hi + 1,
        s"$src p$p: value $v holds ranks [$lo,$hi], target $target")
      // and v must be an actually-observed value (no interpolation)
      assert(sorted.contains(v.toInt) && v == v.toInt, s"$src p$p: $v not observed")
    }
  }

  test("approx percentile aggregates partially (map-side combine, no value buffering)") {
    val df = TextOps.tokenPercentilesApprox(load(spark, dir, "documents"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // partial + final pair: the sketch, not the value list, crosses the wire
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2
      || "HashAggregate".r.findAllIn(p).size >= 2, p)
  }
}
