package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.syntax._

/** Retrieval/layout index ARTIFACTS — operators whose output is the
  * index itself, not a per-row score: the inverted (postings) index
  * behind q59/q85's tf·idf/BM25 scoring, and the Z-order layout key
  * that makes one physical sort serve range predicates on two
  * dimensions at once (reference analogue: the dense [heal, time, ds]
  * index HiSS-Cube keeps sorted for region queries,
  * `hisscube/processors/metadata_strategy.py` — generalized to any
  * bounded integer dimension pair).
  */
object IndexOps {

  // --------------------------------------------------------------- q149

  /** Inverted index over whitespace tokens: one row per token with its
    * exact document frequency and the first `cap` postings (doc_ids,
    * ascending). The postings CAP is the scale discipline — at 100 TB a
    * stop-word's full postings list is corpus-sized and no consumer
    * wants it materialized in the index row; `df` stays EXACT (it comes
    * from count, not from the capped list) and `truncated` marks every
    * capped row, so nothing is silently dropped (the q64
    * refuse-or-account rule applied to an artifact). One
    * map-side-combinable shuffle on token; postings are joined to a
    * comma string so the artifact is hash-comparable across engines.
    *
    * Per-doc token DEDUP happens before the explode (array_distinct on
    * the token array), so df counts documents, not occurrences — the
    * postings-list invariant.
    */
  def invertedIndex(docs: DataFrame, cap: Int = 32): DataFrame =
    docs
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("token"))
      .groupBy($"token")
      .agg(
        count(lit(1)).as("df"),
        concat_ws(",", slice(sort_array(collect_list($"doc_id")), 1, cap)
          .cast("array<string>")).as("postings"))
      .select($"token", $"df", $"postings", ($"df" > cap).as("truncated"))

  def q149InvertedIndex(s: SparkSession, dir: String): DataFrame =
    invertedIndex(load(s, dir, "documents"))

  // --------------------------------------------------------------- q151

  /** The two layout dimensions for the events table: user and
    * hour-of-epoch, each reduced to the 16-bit z-grid. Integer floor
    * seconds (unix_timestamp ≡ DuckDB floor(epoch())) so both engines
    * bucket identically. */
  private def dims(ev: DataFrame): DataFrame =
    ev.select(
      ($"user_id" % 65536L).as("x"),
      (expr("unix_timestamp(ts) div 3600") % 65536L).as("y"))

  /** Z-order layout profile of the events table at tile scale s=8
    * (256×256 cells per tile): per z-tile, the exact event count,
    * distinct users, and the min/max of both dimensions — the numbers
    * that PROVE the clustering claim, because a z-sorted write makes
    * each tile a contiguous key range (tile = zkey >>> 16, a prefix),
    * so the per-tile min/max here are exactly the row-group statistics
    * a reader would prune on for user ranges AND time ranges after one
    * `repartitionByRange(zorder_key)` write. The native
    * [[graft.plans.ZOrderKeyExpr]] keeps the key inside whole-stage
    * codegen on that full-corpus sort path.
    */
  def zorderProfile(ev: DataFrame): DataFrame = {
    val d = dims(ev)
    d.select($"x", $"y", expr("zorder_key(x, y)").as("zkey"))
      .groupBy(expr("zkey div 65536").as("ztile"))
      .agg(
        count(lit(1)).as("n_events"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .select($"ztile", $"n_events", $"min_x", $"max_x", $"min_y", $"max_y")
  }

  def q151ZorderLayout(s: SparkSession, dir: String): DataFrame =
    zorderProfile(load(s, dir, "events"))

  // -------------------------------------------------------------- oracles

  /** The morton interleave as plain SQL: Σ ((x>>i)&1)<<2i for the x
    * bits, the same shifted one left for y — bit-identical to
    * [[graft.functions.ZOrder.encode]]'s mask-spread form. Generated
    * here so the 32 terms stay literal in oracle_sql.json. */
  private def mortonSql(x: String, y: String): String = {
    val xs = (0 until 16).map(i => s"((($x >> $i) & 1) << ${2 * i})")
    val ys = (0 until 16).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})")
    (xs ++ ys).mkString(" + ")
  }

  val oracles: Map[String, String] = Map(
    "q149_inverted_index" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS token
        |  FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS df,
        |  array_to_string(list_transform(
        |      list_slice(list_sort(list(doc_id)), 1, 32),
        |      d -> CAST(d AS VARCHAR)), ',') AS postings,
        |  count(*) > 32 AS truncated
        |FROM t GROUP BY 1""".stripMargin,
    "q151_zorder_layout" ->
      s"""WITH d AS (SELECT user_id % 65536 AS x,
         |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 65536 AS y
         |  FROM events),
         |z AS (SELECT x, y, ${mortonSql("x", "y")} AS zkey FROM d)
         |SELECT zkey // 65536 AS ztile, CAST(count(*) AS BIGINT) AS n_events,
         |  min(x) AS min_x, max(x) AS max_x,
         |  min(y) AS min_y, max(y) AS max_y
         |FROM z GROUP BY 1""".stripMargin,
  )
}
