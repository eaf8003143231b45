package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.syntax._

/** Operators Spark's built-in join set lacks, composed Spark-first:
  * the AS-OF JOIN (attach to each left row the latest right row at or
  * before its time, per key) and SimHash Hamming-ball near-dup pairs.
  */
object AsofOps {

  /** As-of join via the union + window carry-forward plan — ONE shuffle
    * on the key, no per-key row explosion, no range-join blowup:
    *
    *  1. tag both sides and union on (key, time) with right rows
    *     ordering BEFORE left rows at equal time (so a right row at
    *     exactly the left time is visible — `<=` semantics);
    *  2. per key, running `last(payload, ignoreNulls)` over the
    *     time-ordered window carries the latest right payload forward;
    *  3. keep the left rows.
    *
    * Right rows are first collapsed to one per (key, time) by the MAX of
    * the payload struct (deterministic ties, and a map-side partial
    * aggregate at scale). The window is key-local: no global sort. */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    // one right row per (key, time): max payload struct wins
    val rUnique = right
      .groupBy((keyCols :+ timeCol).map(col): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as("__p"))
      .select((keyCols :+ timeCol).map(col) :+ col("__p"): _*)

    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val lPrep = left.select(
      keys ++ Seq(col(timeCol), lit(1).as("__side"),
        leftStruct.as("__l"), lit(null).cast(rUnique.schema("__p").dataType).as("__p")): _*)
    val rPrep = rUnique.select(
      keys ++ Seq(col(timeCol), lit(0).as("__side"),
        lit(null).cast(lPrep.schema("__l").dataType).as("__l"), col("__p")): _*)

    val w = Window.partitionBy(keys: _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lPrep.unionByName(rPrep)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter($"__side" === 1)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val payload = payloadCols.map(c => col(s"__asof.$c").as(c))
    carried.select((leftCols ++ payload).toIndexedSeq: _*)
  }

  /** Driver-gated as-of query: each purchase event joined to the user's
    * most recent view event at or before it (second granularity, so the
    * engine-side micro vs oracle-side nano timestamp precision cannot
    * flip a comparison). DuckDB's native ASOF LEFT JOIN is the oracle —
    * an exact independent implementation of the same semantics. */
  def q62AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .withColumn("ts_sec", unix_timestamp($"ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_sec")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts_sec",
        $"event_id".as("view_event_id"), $"value".as("view_value"))
    asofJoin(purchases, views, Seq("user_id"), "ts_sec",
      Seq("view_event_id", "view_value"))
      .select($"event_id", $"user_id", $"ts_sec".cast("long").as("ts_sec"),
        $"view_event_id", $"view_value")
  }

  /** SimHash near-dup pairs by Hamming-ball LSH: split the 64-bit
    * fingerprint into 4 × 16-bit bands — by pigeonhole, any pair within
    * Hamming distance 3 agrees exactly on ≥ 1 band — bucket-join on
    * (band, bits), then exact popcount verify (`bit_count(a^b) ≤ 3`).
    * The candidate join shuffles on band keys, never all-pairs — the
    * same scale shape as MinHash banding, over a 16× smaller record
    * (one long per doc). xxhash64-based simhash has no SQL twin, so the
    * oracle pins the deterministic corpus profile (q27 precedent). */
  def q63SimhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val sh = load(s, dir, "documents")
      .select($"doc_id", TextOps.simhash($"text").as("sh"))
    // repartition on the bucket key: ONE simhash+explode pass feeds an
    // exchange that ReuseExchange shares across both self-join sides —
    // without it each side recomputes every fingerprint
    val banded = sh.select(
      $"doc_id", $"sh",
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned($"sh", 16 * b).bitwiseAND(0xFFFFL).as("bits"))
      }: _*)).as("bb"))
      .select($"doc_id", $"sh", col("bb.band").as("band"), col("bb.bits").as("bits"))
      .repartition($"band", $"bits")
    // same adversarial guard as the MinHash pipeline: per-doc candidate
    // degree is capped (key-local windows, deterministic order) so an
    // all-duplicates corpus can't quadratically bloat the verify stage;
    // drops are surfaced (the oracle pins them to 0 on this corpus)
    val wA = Window.partitionBy($"id_a").orderBy($"id_b")
    val wB = Window.partitionBy($"id_b").orderBy($"id_a")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("rn", greatest(row_number().over(wA), row_number().over(wB)))
    cand
      .select($"id_a", $"id_b", $"rn",
        bit_count($"sh_a".bitwiseXOR($"sh_b")).as("hamming"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_candidate_pairs"),
        sum(when($"hamming" <= 3 && $"rn" <= TextOps.MaxCandidatesPerDoc, 1L)
          .otherwise(0L)).as("n_neardup_pairs"),
        sum(when($"rn" > TextOps.MaxCandidatesPerDoc, 1L).otherwise(0L))
          .as("n_capped_pairs"))
  }

  val oracles: Map[String, String] = Map(
    "q62_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |p AS (SELECT event_id, user_id, ts_sec FROM e WHERE event_type = 'purchase'),
        |v0 AS (SELECT user_id, ts_sec, event_id AS view_event_id, value AS view_value
        |  FROM e WHERE event_type = 'view'),
        |v AS (SELECT user_id, ts_sec,
        |  arg_max(view_event_id, view_event_id) AS view_event_id,
        |  arg_max(view_value, view_event_id) AS view_value
        |  FROM v0 GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts_sec, v.view_event_id, v.view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.ts_sec <= p.ts_sec""".stripMargin,
    // xxhash64-based simhash has no SQL twin; the profile is fully
    // deterministic for the committed sf0.01 corpus → regression literal
    // (q27 precedent — re-pin if the driver regenerates testdata)
    "q63_simhash_neardup" ->
      """SELECT CAST(2502 AS BIGINT) AS n_candidate_pairs,
        |CAST(20 AS BIGINT) AS n_neardup_pairs,
        |CAST(0 AS BIGINT) AS n_capped_pairs
        |FROM (SELECT 1) one""".stripMargin,
  )
}
