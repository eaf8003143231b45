package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.syntax._

/** Remaining SURVEY §2 operator families over the testdata: positional
  * zip join (J4), unique+range groups (I8), path/string functions (§2.8),
  * the photometric unit-conversion formulas as column math (P3-P5), regex
  * tokenization, and IVF-bucketed ANN.
  */
object MiscOps {

  /** J4 — positional 1:1 zip of two equal-length sorted tables (the SFR
    * gal_info ⧺ gal_fibsfr concat shape).
    *
    * SMALL-DIM CONTRACT: positional zip is a CATALOG operation here (the
    * SFR tables are ≤ ~1M rows), so the index is minted in ONE explicit
    * single-partition task — `coalesce(1)` + partition-local sort +
    * `monotonically_increasing_id` (which enumerates 0..n-1 on a single
    * partition). This stays inside whole-stage codegen with no RDD
    * roundtrip and no extra jobs (the round-2 `zipWithIndex` form cost
    * 3.7 s of fixed overhead on 25 rows); a silent partition-less window
    * is exactly what it replaces. For corpus-scale inputs use
    * [[graft.pipeline.Sfr.concatColumns]]'s distributed `zipWithIndex`. */
  def q43ZipJoin(s: SparkSession, dir: String): DataFrame = {
    def zipIdx(df: DataFrame, order: org.apache.spark.sql.Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(order: _*)
        .withColumn("idx", monotonically_increasing_id() + 1)
    val a = zipIdx(load(s, dir, "nation").select($"n_name", $"n_nationkey"),
      $"n_nationkey").drop("n_nationkey")
    val b = zipIdx(load(s, dir, "region").select($"r_name", $"r_regionkey"),
      $"r_regionkey".desc).drop("r_regionkey")
    a.join(b, "idx").select($"idx", $"n_name", $"r_name")
  }

  /** I8 — unique keys + per-key dense ranges (np.unique + bisect ranges
    * over the sorted index, metadata_strategy_cube_ml.py:598-602). */
  def q44UniqueRanges(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .groupBy($"l_suppkey")
      .agg(
        count(lit(1)).as("n"),
        min($"l_orderkey").as("min_key"),
        max($"l_orderkey").as("max_key"))
      .select($"l_suppkey".cast("long").as("l_suppkey"), $"n",
        $"min_key", $"max_key")

  /** §2.8 string ops — basename extraction (split + element_at, the
    * Path(...).name pattern) and regexp capture over synthetic paths. */
  def q45StringOps(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select($"doc_id",
        concat(lit("/data/"), $"source", lit("/doc-"), $"doc_id", lit(".txt")).as("path"))
      .select(
        $"doc_id",
        element_at(split($"path", "/"), -1).as("basename"),
        regexp_extract($"path", "doc-([0-9]+)", 1).cast("long").as("extracted_id"))
      .withColumn("id_roundtrip", ($"extracted_id" === $"doc_id").cast("long"))

  /** P3-P5 — the photometric conversions as pure column math:
    * mag_to_flux (3.631e-6 * c / midpoint²), flux-density area ratio,
    * sigma = sqrt(1/ivar)-style derivation, on testdata columns.
    *
    * Output is scaled into exact integer space (`floor(x*1e6 + 0.5)` as
    * BIGINT) instead of `round(x, 6)`: Spark rounds DOUBLE through
    * BigDecimal (decimal-string HALF_UP) while DuckDB rounds in binary, so
    * values within 1 ULP of a ….5 tie flip differently between engines.
    * floor(+0.5) is pure IEEE arithmetic — bit-identical on both engines
    * given the identical expression tree (the round-1 q46 hash mismatch). */
  def q46PhotometryMath(s: SparkSession, dir: String): DataFrame = {
    val midpoint = lit(4686.0) // g band
    val magToFlux = $"l_extendedprice".cast("double") * 3.631e-6 * 2.99792458e-5 / (midpoint * midpoint)
    val areaRatio = lit(math.Pi) * 4.0 / 0.16
    val sigma = sqrt(lit(1.0) / ($"l_quantity".cast("double") + 1.0)) * 1e-17
    def scaled(c: org.apache.spark.sql.Column) =
      floor(c * 1e20 * 1e6 + 0.5).cast("long")
    load(s, dir, "lineitem")
      .filter($"l_orderkey" <= 1000)
      .select(
        $"l_orderkey".cast("long").as("l_orderkey"),
        $"l_linenumber".cast("long").as("l_linenumber"),
        scaled(magToFlux).as("flux_scaled"),
        scaled(magToFlux * areaRatio).as("flux_density_scaled"),
        scaled(sigma).as("sigma_scaled"))
  }

  /** Regex tokenization (BPE-ish word/number/punct classes) — token
    * counting for the text pipeline. */
  def q47RegexTokens(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select($"doc_id",
        size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+"), lit(0))).cast("long")
          .as("n_word_tokens"),
        size(regexp_extract_all($"text", lit("[0-9]+"), lit(0))).cast("long")
          .as("n_number_tokens"))

  /** IVF-bucketed ANN: deterministic coarse centroids (the first 16
    * vectors by vec_id), nearest-centroid assignment (broadcast argmin),
    * then exact search inside the probe's bucket only. The scale path:
    * the inverted-file join shuffles each vector once on its centroid id
    * instead of scanning all pairs. Oracle-gated: assignment is
    * deterministic L1-argmin with (distance, cent_id) tie-break, which the
    * DuckDB oracle reproduces via an unnest join + row_number. */
  def q48AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings")
    val cents = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"embedding".as("cent"))
    // assign: argmin over centroid distances — min_by aggregation (partial
    // agg + no per-vector sort; deterministic tie-break via struct order)
    val assigned = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"cent_id",
        VectorOps.l1Distance($"embedding", $"cent").as("d"))
      .groupBy($"vec_id")
      .agg(min_by($"cent_id", struct($"d", $"cent_id")).as("cent_id"))
    assigned.groupBy($"cent_id")
      .agg(count(lit(1)).as("bucket_size"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_buckets"),
        max($"bucket_size").as("max_bucket"),
        min($"bucket_size").as("min_bucket"))
  }

  val oracles: Map[String, String] = Map(
    "q43_zip_join" ->
      """WITH a AS (SELECT n_name, row_number() OVER (ORDER BY n_nationkey) AS idx FROM nation),
        |b AS (SELECT r_name, row_number() OVER (ORDER BY r_regionkey DESC) AS idx FROM region)
        |SELECT CAST(a.idx AS BIGINT) AS idx, n_name, r_name FROM a JOIN b ON a.idx = b.idx""".stripMargin,
    "q44_unique_ranges" ->
      """SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey, CAST(count(*) AS BIGINT) AS n,
        |CAST(min(l_orderkey) AS BIGINT) AS min_key, CAST(max(l_orderkey) AS BIGINT) AS max_key
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q45_string_ops" ->
      """WITH p AS (SELECT doc_id, '/data/' || source || '/doc-' || doc_id || '.txt' AS path FROM documents)
        |SELECT doc_id, list_extract(string_split(path, '/'), -1) AS basename,
        |CAST(regexp_extract(path, 'doc-([0-9]+)', 1) AS BIGINT) AS extracted_id,
        |CAST(CASE WHEN CAST(regexp_extract(path, 'doc-([0-9]+)', 1) AS BIGINT) = doc_id
        |  THEN 1 ELSE 0 END AS BIGINT) AS id_roundtrip FROM p""".stripMargin,
    "q46_photometry_math" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |CAST(floor(CAST(l_extendedprice AS DOUBLE) * 3.631e-6 * 2.99792458e-5 / (4686.0*4686.0) * 1e20 * 1e6 + 0.5) AS BIGINT) AS flux_scaled,
        |CAST(floor(CAST(l_extendedprice AS DOUBLE) * 3.631e-6 * 2.99792458e-5 / (4686.0*4686.0) * (pi() * 4.0 / 0.16) * 1e20 * 1e6 + 0.5) AS BIGINT) AS flux_density_scaled,
        |CAST(floor(sqrt(1.0/(CAST(l_quantity AS DOUBLE) + 1.0)) * 1e-17 * 1e20 * 1e6 + 0.5) AS BIGINT) AS sigma_scaled
        |FROM lineitem WHERE l_orderkey <= 1000""".stripMargin,
    "q48_ann_ivf" ->
      """WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |  generate_subscripts(embedding,1) AS i FROM embeddings),
        |d AS (SELECT a.vec_id, c.vec_id AS cent_id, sum(abs(a.v - c.v)) AS dist
        |  FROM u a JOIN u c ON a.i = c.i AND c.vec_id < 16 GROUP BY 1,2),
        |assigned AS (SELECT vec_id, cent_id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cent_id) AS rn FROM d),
        |b AS (SELECT cent_id, count(*) AS bucket_size FROM assigned WHERE rn = 1 GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        |CAST(max(bucket_size) AS BIGINT) AS max_bucket,
        |CAST(min(bucket_size) AS BIGINT) AS min_bucket FROM b""".stripMargin,
    "q47_regex_tokens" ->
      """SELECT doc_id,
        |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_word_tokens,
        |CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_tokens
        |FROM documents""".stripMargin,
  )
}
