package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.syntax._

/** Approximate-string matching + exact-integer statistics operators:
  * entity-resolution fuzzy join (the blocking/canonical-string
  * discipline that keeps edit-distance joins off the quadratic path),
  * integer-exact OLS regression aggregates (corpus drift lines), and
  * the Gini concentration index over token frequencies (vocabulary
  * concentration next to q115's Zipf head coverage).
  *
  * The synthetic tables carry no real dirty strings, so q150 derives
  * its planted typos DETERMINISTICALLY in-query from the LCG hash (the
  * HygieneOps q112/q113 precedent): the oracle replays the derivation
  * and the gate pins the RESOLVER's semantics — including the planted
  * confusion where deleting the 'c' of "cold" lands exactly on the
  * clean adjective "old" — not the fixture.
  */
object MatchOps {

  // --------------------------------------------------------------- q150

  /** Entity-resolution fuzzy match with planted truth. Derivation: for
    * parts where LCG(p_partkey) % 4 == 0, delete one LCG-chosen char
    * from the adjective (first word of p_name). Resolution: match each
    * DISTINCT dirty adjective against the DISTINCT clean adjective
    * vocabulary with levenshtein ≤ 1; unique minimum-distance candidate
    * wins, ties are AMBIGUOUS (refuse, count — never an arbitrary
    * pick). Output per true adjective: dirty rows, resolved-correct,
    * resolved-wrong, ambiguous — the exact confusion profile of the
    * resolver.
    *
    * The scale discipline is WHERE the quadratic step runs: both sides
    * of the levenshtein cross join are DISTINCT STRINGS (vocabulary-
    * sized, broadcast-trivial), never rows — the canonical-string trick
    * that makes edit-distance ER viable on a corpus of any size; rows
    * only ever take one hash join back to their resolved string.
    * levenshtein is unit-cost edit distance on BOTH engines.
    */
  def fuzzyEr(parts: DataFrame): DataFrame = {
    val base = parts.select(
      $"p_partkey",
      split($"p_name", " ").getItem(0).as("adj"),
      ((($"p_partkey" % 1000003L) * 2654435761L) % 1000003L).as("h"))
    val vocab = base.select($"adj".as("clean_adj")).distinct()
    val dirtyRows = base.filter($"h" % 4 === 0)
      .withColumn("pos", (expr("h div 4") % length($"adj") + 1L).cast("int"))
      .withColumn("dirty_adj", concat(
        expr("substring(adj, 1, pos - 1)"),
        expr("substring(adj, pos + 1, 100)")))
    // vocabulary × vocabulary candidate table — the ONLY quadratic step
    val cand = dirtyRows.select($"dirty_adj").distinct()
      .crossJoin(vocab)
      .withColumn("d", levenshtein($"dirty_adj", $"clean_adj"))
      .filter($"d" <= 1)
    val byDirty = Window.partitionBy($"dirty_adj")
    val resolved = cand
      .withColumn("dmin", min($"d").over(byDirty))
      .filter($"d" === $"dmin")
      .groupBy($"dirty_adj")
      .agg(count(lit(1)).as("n_best"), min($"clean_adj").as("best"))
      .select($"dirty_adj",
        when($"n_best" === 1, $"best").as("resolved"),
        ($"n_best" > 1).as("ambiguous"))
    dirtyRows.join(resolved, Seq("dirty_adj"), "left")
      .groupBy($"adj".as("true_adj"))
      .agg(
        count(lit(1)).as("n_dirty"),
        sum(when($"resolved" === $"adj", 1L).otherwise(0L)).as("n_correct"),
        sum(when($"resolved".isNotNull && $"resolved" =!= $"adj", 1L)
          .otherwise(0L)).as("n_wrong"),
        sum(when($"ambiguous", 1L).otherwise(0L)).as("n_ambiguous"))
  }

  def q150FuzzyEr(s: SparkSession, dir: String): DataFrame =
    fuzzyEr(load(s, dir, "part"))

  // --------------------------------------------------------------- q152

  /** Integer-exact OLS regression aggregates per source: y = tok_n on
    * x = n_chars, emitted as the five raw sums plus the slope as an
    * exact integer fraction (num = n·Σxy − Σx·Σy, den = n·Σxx − Σx²) —
    * no division performed, so both engines carry identical integers
    * (the q152 form of the q84 no-floats rule). One map-side-combinable
    * pass; at 100 TB this is the cheapest possible shape (five longs
    * per group). Intermediates stay < 2^63 for corpora up to ~10⁹ docs
    * of ~10⁴ chars; beyond that the sums shard by time/source first —
    * the same granularity note as epochOrder's key domain.
    */
  def olsDrift(docs: DataFrame): DataFrame =
    docs
      .select($"source", $"n_chars".as("x"),
        size(split($"text", " ")).cast("long").as("y"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n"),
        sum($"x").as("sum_x"), sum($"y").as("sum_y"),
        sum($"x" * $"x").as("sum_xx"), sum($"x" * $"y").as("sum_xy"))
      .select($"source", $"n", $"sum_x", $"sum_y", $"sum_xx", $"sum_xy",
        ($"n" * $"sum_xy" - $"sum_x" * $"sum_y").as("slope_num"),
        ($"n" * $"sum_xx" - $"sum_x" * $"sum_x").as("slope_den"))

  def q152OlsDrift(s: SparkSession, dir: String): DataFrame =
    olsDrift(load(s, dir, "documents"))

  // --------------------------------------------------------------- q153

  /** Gini concentration of the per-source token-frequency distribution,
    * as an exact integer fraction: with counts c₁ ≤ … ≤ cₙ (ties broken
    * by token string so the rank is deterministic on both engines),
    * gini = Σ(2i − n − 1)·cᵢ / (n·Σc). 0 = perfectly uniform vocabulary,
    * → 1 = all mass on one token — the concentration axis q115's Zipf
    * head coverage reads pointwise. The rank window runs over the
    * (source, token) count table — vocabulary-sized, never the corpus
    * (the q146 histogram-first discipline).
    */
  def tokenGini(docs: DataFrame): DataFrame = {
    val counts = docs
      .select($"source", explode(split($"text", " ")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
    val bySrc = Window.partitionBy($"source")
    counts
      .withColumn("i", row_number().over(bySrc.orderBy($"c", $"w")).cast("long"))
      .withColumn("n", count(lit(1)).over(bySrc))
      .groupBy($"source")
      .agg(
        max($"n").as("n_tokens"),
        sum($"c").as("total_tok"),
        sum((lit(2L) * $"i" - $"n" - 1L) * $"c").as("gini_num"))
      .select($"source", $"n_tokens", $"total_tok",
        $"gini_num", ($"n_tokens" * $"total_tok").as("gini_den"))
  }

  def q153TokenGini(s: SparkSession, dir: String): DataFrame =
    tokenGini(load(s, dir, "documents"))

  // -------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q150_fuzzy_er" ->
      """WITH base AS (SELECT p_partkey, string_split(p_name, ' ')[1] AS adj,
        |    (p_partkey % 1000003) * 2654435761 % 1000003 AS h
        |  FROM part),
        |vocab AS (SELECT DISTINCT adj AS clean_adj FROM base),
        |dirty AS (SELECT p_partkey, adj,
        |    CAST((h // 4) % length(adj) + 1 AS INT) AS pos
        |  FROM base WHERE h % 4 = 0),
        |drows AS (SELECT p_partkey, adj,
        |    substring(adj, 1, pos - 1) || substring(adj, pos + 1, 100)
        |      AS dirty_adj
        |  FROM dirty),
        |cand AS (SELECT dirty_adj, clean_adj,
        |    levenshtein(dirty_adj, clean_adj) AS d
        |  FROM (SELECT DISTINCT dirty_adj FROM drows), vocab
        |  WHERE levenshtein(dirty_adj, clean_adj) <= 1),
        |best AS (SELECT dirty_adj, clean_adj, d,
        |    min(d) OVER (PARTITION BY dirty_adj) AS dmin FROM cand),
        |res AS (SELECT dirty_adj,
        |    CASE WHEN count(*) = 1 THEN min(clean_adj) END AS resolved,
        |    count(*) > 1 AS ambiguous
        |  FROM best WHERE d = dmin GROUP BY 1)
        |SELECT adj AS true_adj, CAST(count(*) AS BIGINT) AS n_dirty,
        |  CAST(sum(CASE WHEN resolved = adj THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  CAST(sum(CASE WHEN resolved IS NOT NULL AND resolved <> adj
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong,
        |  CAST(sum(CASE WHEN ambiguous THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ambiguous
        |FROM drows LEFT JOIN res USING (dirty_adj)
        |GROUP BY 1""".stripMargin,
    "q152_ols_drift" ->
      """WITH d AS (SELECT source, n_chars AS x,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
        |  FROM documents),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |    CAST(sum(x * x) AS BIGINT) AS sum_xx,
        |    CAST(sum(x * y) AS BIGINT) AS sum_xy
        |  FROM d GROUP BY 1)
        |SELECT source, n, sum_x, sum_y, sum_xx, sum_xy,
        |  CAST(n * sum_xy - sum_x * sum_y AS BIGINT) AS slope_num,
        |  CAST(n * sum_xx - sum_x * sum_x AS BIGINT) AS slope_den
        |FROM s""".stripMargin,
    "q153_token_gini" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |rk AS (SELECT source, c,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY c, w)
        |      AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM cnt)
        |SELECT source, max(n) AS n_tokens,
        |  CAST(sum(c) AS BIGINT) AS total_tok,
        |  CAST(sum((2 * i - n - 1) * c) AS BIGINT) AS gini_num,
        |  CAST(max(n) * sum(c) AS BIGINT) AS gini_den
        |FROM rk GROUP BY 1""".stripMargin,
  )
}
