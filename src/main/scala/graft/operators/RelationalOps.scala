package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.syntax._

/** Relational operator catalog over the driver testdata, one query per
  * operator family in SURVEY.md §2. Each has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  *
  * Conventions shared with the oracles (the driver hash-compares):
  *  - integer outputs CAST to BIGINT on both sides,
  *  - floating outputs computed in DOUBLE and `round`-ed on both sides,
  *  - no raw timestamp/date outputs — always formatted to strings or
  *    converted to numeric (MJD) first.
  */
object RelationalOps {

  /** S9/A1-lite pushdown aggregate — TPC-H Q1 flavored (SURVEY §2.6).
    * Group-by on two low-cardinality keys: map-side partial aggregation
    * makes the shuffle tiny at any scale.
    */
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))

  /** S1 scan + filter + projection; predicate and column pruning reach the
    * parquet reader (PushedFilters in .explain). (SURVEY §2.1 S1, I7)
    */
  def q02ScanFilter(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .filter($"l_quantity" < 5 && $"l_shipdate" < to_timestamp(lit("1997-01-01")))
      .select(
        $"l_orderkey".cast("long").as("l_orderkey"),
        $"l_linenumber".cast("long").as("l_linenumber"),
        $"l_quantity".cast("double").as("l_quantity"))

  /** J1-style multi-way equi-join + aggregate (orders→customer→nation→
    * region). nation/region are broadcast (tiny dims); only the
    * orders⨝customer join shuffles, on the join key. (SURVEY §2.5 J1)
    */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val orders = load(s, dir, "orders")
    val cust = load(s, dir, "customer")
    val nation = load(s, dir, "nation")
    val region = load(s, dir, "region")
    orders
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total_price"))
  }

  /** J5 left-outer join preserving unmatched left rows (SFR-merge shape:
    * spectra metadata ⟕ star-formation-rate catalog). (SURVEY §2.5 J5)
    */
  def q04LeftJoin(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .join(load(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"c_custkey").as("n_customers"),
        count($"o_orderkey").as("n_orders"),
        countDistinct(when($"o_orderkey".isNull, $"c_custkey")).as("n_no_orders"))

  /** P2/J3 theta-join: equi key + non-equi residual predicate, small side
    * broadcast (the reference's camcol+run-predicate gain lookup).
    * (SURVEY §2.5 J3)
    */
  def q05ThetaJoin(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .join(
        broadcast(load(s, dir, "part")),
        $"l_partkey" === $"p_partkey" && $"l_quantity" > $"p_size")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))

  /** I4-style ranking within partitions (sorted secondary index / top-k
    * per group); deterministic tie-break on the key. (SURVEY §2.4)
    */
  def q06WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    load(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select(
        $"c_custkey".cast("long").as("c_custkey"),
        $"c_nationkey".cast("long").as("c_nationkey"),
        $"rn".cast("long").as("rn"))
  }

  /** P6-style set op: union + distinct (transmission-curve merge shape).
    * (SURVEY §2.8)
    */
  def q07SetOps(s: SparkSession, dir: String): DataFrame = {
    val ck = load(s, dir, "customer").select($"c_nationkey".as("k"))
    val sk = load(s, dir, "supplier").select($"s_nationkey".as("k"))
    ck.union(sk).distinct()
      .join(broadcast(load(s, dir, "nation")), $"k" === $"n_nationkey")
      .select($"n_name").distinct()
  }

  /** X1/X2 zoom-pyramid fan-out as a generator: each row explodes to 5
    * zoom levels with the reference's resolution law floor(4620/2^z)
    * (matches [4620,2310,1155,577,288], test_cube_utils.py:14-21).
    * (SURVEY §2.3)
    */
  def q08PyramidExplode(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "part")
      .select($"p_partkey", explode(sequence(lit(0), lit(4))).as("zoom"))
      .select(
        $"p_partkey".cast("long").as("p_partkey"),
        $"zoom".cast("long").as("zoom"),
        floor(lit(4620) / pow(lit(2), $"zoom")).as("res"))

  /** P16 JSON header parse: schemaless JSON string column → typed field
    * (from_json, the engine's FITS-header access path). (SURVEY §2.2 P16)
    */
  def q09Json(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .select($"event_type",
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").cast("long").as("sum_k"))

  /** P17 time normalization: civil timestamp → MJD day number
    * (mjd = unix_days + 40587), the reference's DATE-OBS→MJD conversion.
    * (SURVEY §2.2 P17)
    */
  def q10Mjd(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .select((floor(unix_timestamp($"o_orderdate") / 86400) + 40587).as("mjd"))
      .groupBy($"mjd")
      .agg(count(lit(1)).as("n"))

  /** A1 inverse-variance-weighted mean, scalar form:
    * mu = sum(f/s^2)/sum(1/s^2), sigma' = sqrt(1/sum(1/s^2)) — the ML-cube
    * stacking math (metadata_strategy_cube_ml.py:26-37) over a generic
    * (value, sigma) pair. Decomposes into two partial sums → map-side
    * combine, single shuffle on the group key. (SURVEY §2.6 A1)
    */
  def q11Ivw(s: SparkSession, dir: String): DataFrame = {
    val sig = $"l_tax" + lit(0.05)
    val w = lit(1.0) / (sig * sig)
    load(s, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(
        round(sum($"l_extendedprice" * w) / sum(w), 4).as("ivw_mean"),
        round(sqrt(lit(1.0) / sum(w)), 6).as("ivw_sigma"),
        count(lit(1)).as("n"))
      .select(
        $"l_partkey".cast("long").as("l_partkey"),
        $"ivw_mean", $"ivw_sigma", $"n")
  }

  /** A2 group-filter (HAVING): keep groups meeting a distinct-count
    * condition — the "target has all 5 bands" rule
    * (metadata_strategy_cube_ml.py:261-262). (SURVEY §2.6 A2)
    */
  def q12Having(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"o_orderpriority").as("n_prio"))
      .filter($"n_prio" >= 3)
      .select($"o_custkey".cast("long").as("o_custkey"), $"n_orders", $"n_prio")

  /** A3 distinct-count of targets per group. (SURVEY §2.6 A3) */
  def q13CountDistinct(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "supplier")
      .join(broadcast(load(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        countDistinct($"s_suppkey").as("n_suppliers"),
        round(sum($"s_acctbal"), 2).as("total_bal"))

  /** Event sessionization (gap > 30 min ⇒ new session) via lag + running
    * sum — the window/stateful-shape op a training-data pipeline needs;
    * batch twin of the Structured Streaming path in graft.streaming.
    */
  def q21Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    load(s, dir, "events")
      .withColumn("ts_sec", unix_timestamp($"ts"))
      .withColumn("gap", $"ts_sec" - lag($"ts_sec", 1).over(byUser))
      .withColumn("new_sess", when($"gap".isNull || $"gap" > 1800, 1).otherwise(0))
      .withColumn("sess_id", sum($"new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id")
      .agg(
        max($"sess_id").cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .select($"user_id".cast("long").as("user_id"), $"n_sessions", $"n_events")
  }

  /** Hourly tumbling-window aggregate over the event stream (batch form;
    * streaming form in graft.streaming.EventStream).
    */
  def q22HourlyEvents(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .groupBy(
        date_format($"ts", "yyyy-MM-dd HH:00:00").as("hour"),
        $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))

  /** ROLLUP over (returnflag, linestatus) — multi-level aggregation the
    * engine gets from Catalyst for free (SURVEY §2.6 note). */
  def q33Rollup(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))

  /** CUBE over (orderpriority, orderstatus). */
  def q34Cube(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))

  /** approx_count_distinct (HLL) vs exact — sketch aggregation. The raw
    * HLL estimate is engine-specific, so the gated output is the exact
    * count plus the relative-error bound flag (which must be 1): the
    * oracle checks both without depending on the sketch's exact value. */
  def q35ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .groupBy()
      .agg(
        countDistinct($"l_orderkey").as("exact"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx"))
      .select($"exact",
        (abs($"approx" - $"exact") / $"exact" < 0.1).cast("long").as("rel_err_ok"))

  /** S2: CSV-driven scan — the reference's run/camcol/field image list
    * (`metadata.py:132-160`); aggregate per camcol. */
  def q36CsvScan(s: SparkSession, dir: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true")
      .csv("/root/reference/data/test_images.csv")
      .groupBy($"camcol")
      .agg(count(lit(1)).as("n"), countDistinct($"run").as("n_runs"))
      .select($"camcol".cast("long").as("camcol"), $"n", $"n_runs")

  // --------------------------------------------------------------- q209

  /** Salted equi-join — the skew mitigation [[SketchOps.joinAdvisor]]
    * (q190) RECOMMENDS, shipped as the operator that executes it: the
    * probe side's rows scatter across `factor` salt classes by a
    * deterministic row-local hash, the build side replicates `factor`×
    * (a map-side explode — `factor` is small, single digits), and the
    * join runs on (key, salt) so a hot key's probe rows land on
    * `factor` DIFFERENT reducers instead of one straggler. Result ≡
    * the plain equi-join row-for-row (every probe row meets exactly
    * one replica of each matching build row — the salt classes
    * partition the probe side), which is exactly what the q209 gate
    * pins: the oracle is the UNSALTED SQL join.
    *
    * `saltExpr` must be row-deterministic (replays identically) but
    * need not relate to the key — a row id is ideal. Catalyst stays
    * free to broadcast a small build side (salting is then harmless:
    * replicas ride the same broadcast); the operator matters precisely
    * when neither side broadcasts and one key carries a constant
    * fraction of the probe side — the case where an unsalted
    * shuffle join cannot finish at 100 TB no matter the cluster. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltExpr: Column, factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor $factor must be >= 1")
    val salted = probe
      .withColumn("__salt", pmod(saltExpr.cast("long"), lit(factor.toLong)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** q209 gate — a genuinely skew-shaped join: every event against its
    * user's activity profile (user event totals — the classic
    * fact⋈aggregated-dim shape where one power user is the hot key),
    * salted by event_id at factor 8. The gated aggregate carries an
    * LCG pair fold over (event_id, user total) so row-level pairing is
    * pinned, not just counts; the oracle joins UNSALTED. */
  def q209SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.load(s, dir, "events")
    val dim = ev.groupBy($"user_id").agg(count(lit(1)).as("n_user_events"))
    saltedJoin(ev.select($"event_id", $"user_id", $"event_type"),
        dim, "user_id", $"event_id", factor = 8)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"n_user_events").as("sum_user_events"),
        sum((($"event_id" * 31L + $"n_user_events") % 1000003L) *
          2654435761L % 1000003L).as("pair_fold"))
  }

  // --------------------------------------------------------------- q237

  /** q237 — the canonical STAR JOIN (the TPC-H Q5/Q10 family shape):
    * the fact table against three dimension hops (customer → nation →
    * region), revenue per (region, order priority). Money stays exact
    * as integer CENTS — floor(price·100 + ½) — because summing doubles
    * is summation-order nondeterministic and a revenue report that
    * drifts by a cent per run is wrong on both engines differently.
    *
    * SCALE: the plan this SHOULD be — and is plan-gated to be — is
    * three BroadcastHashJoins (every dimension chain is
    * driver-small: customer rows ≪ fact rows, nation/region are
    * constants-sized) feeding ONE shuffle, the final aggregate. At
    * 100 TB the fact side never shuffles for the joins; if customer
    * outgrows the broadcast threshold, AQE downgrades that hop to a
    * shuffled hash join and the aggregate shuffle is unchanged — the
    * declarative plan is the knob. */
  def q237StarJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.load(s, dir, "orders")
    val cust = graft.Tables.load(s, dir, "customer")
    val nation = graft.Tables.load(s, dir, "nation")
    val region = graft.Tables.load(s, dir, "region")
    orders
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor($"o_totalprice" * 100 + 0.5).cast("long"))
          .as("revenue_cents"))
  }

  // --------------------------------------------------------------- q249

  /** q249 — contribution analysis ("share of total") done EXACTLY: each
    * region's revenue share in ppm, allocated by q226's
    * largest-remainder apportionment so the shares SUM TO 10⁶ exactly
    * — the property every BI pie chart silently violates when it
    * rounds percentages independently (99.9998% or 100.0002% totals).
    * Composition gate: q237's star revenue (integer cents) feeds
    * q226's Hamilton allocation with budget 10⁶. */
  def q249RevenueShare(s: SparkSession, dir: String): DataFrame = {
    val rev = q237StarJoin(s, dir)
      .groupBy($"r_name")
      .agg(sum($"revenue_cents").as("w"))
    CurationOps.apportion(
        rev.select($"r_name".as("source"), $"w"), budget = 1000000L)
      .select($"source".as("region"), $"w".as("revenue_cents"),
        $"alloc".as("share_ppm"))
  }

  // Shared oracle SQL (DuckDB dialect) for the queries above.
  val oracles: Map[String, String] = Map(
    // q249: star revenue per region + the Hamilton replay at 10^6
    "q249_revenue_share" ->
      """WITH rev AS (SELECT r_name,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS w
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1),
        |t AS (SELECT r_name, w, (SELECT sum(w) FROM rev) AS tot FROM rev),
        |b AS (SELECT r_name, w, (w * 1000000) // tot AS base,
        |    (w * 1000000) % tot AS rem FROM t),
        |r AS (SELECT r_name, w, base,
        |    CAST(row_number() OVER (ORDER BY rem DESC, r_name) AS BIGINT)
        |      AS rk,
        |    1000000 - (SELECT sum(base) FROM b) AS shortfall FROM b)
        |SELECT r_name AS region, w AS revenue_cents,
        |  CAST(base + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END
        |    AS BIGINT) AS share_ppm
        |FROM r""".stripMargin,
    // q237: the same three-hop star with money in integer cents
    "q237_star_join" ->
      """SELECT r_name, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    // q209's oracle is the UNSALTED join — hash equality proves the
    // salt scatter/replicate transform is invisible to the result
    "q209_salted_join" ->
      """WITH dim AS (SELECT user_id, CAST(count(*) AS BIGINT)
        |    AS n_user_events FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_user_events) AS BIGINT) AS sum_user_events,
        |  CAST(sum(((e.event_id * 31 + n_user_events) % 1000003)
        |    * 2654435761 % 1000003) AS BIGINT) AS pair_fold
        |FROM events e JOIN dim USING (user_id)
        |GROUP BY 1""".stripMargin,
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_price, round(avg(l_discount),6) AS avg_disc,
        |CAST(count(*) AS BIGINT) AS n_rows FROM lineitem GROUP BY 1,2""".stripMargin,
    "q02_scan_filter" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |CAST(l_quantity AS DOUBLE) AS l_quantity FROM lineitem
        |WHERE l_quantity < 5 AND l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin,
    "q03_join_agg" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
        |round(sum(o_totalprice),2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey GROUP BY 1,2""".stripMargin,
    "q04_left_join" ->
      """SELECT c_mktsegment, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
        |CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |CAST(count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS BIGINT) AS n_no_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1""".stripMargin,
    "q05_theta_join" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
        |GROUP BY 1""".stripMargin,
    "q06_window_rank" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT c_custkey, c_nationkey,
        |  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t WHERE rn <= 3""".stripMargin,
    "q07_set_ops" ->
      """SELECT DISTINCT n_name FROM nation JOIN (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION SELECT s_nationkey FROM supplier) u ON n_nationkey = u.k""".stripMargin,
    "q08_pyramid_explode" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, CAST(zoom AS BIGINT) AS zoom,
        |CAST(floor(4620/pow(2,zoom)) AS BIGINT) AS res
        |FROM part CROSS JOIN (SELECT unnest(generate_series(0,4)) AS zoom) z""".stripMargin,
    "q09_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CAST(regexp_extract(props,'[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1""".stripMargin,
    "q10_mjd" ->
      """SELECT CAST(floor(epoch(o_orderdate)/86400) + 40587 AS BIGINT) AS mjd,
        |CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1""".stripMargin,
    "q11_ivw" ->
      """SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
        |round(sum(l_extendedprice/((l_tax+0.05)*(l_tax+0.05)))/sum(1.0/((l_tax+0.05)*(l_tax+0.05))),4) AS ivw_mean,
        |round(sqrt(1.0/sum(1.0/((l_tax+0.05)*(l_tax+0.05)))),6) AS ivw_sigma,
        |CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1""".stripMargin,
    "q12_having" ->
      """SELECT CAST(o_custkey AS BIGINT) AS o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio
        |FROM orders GROUP BY 1 HAVING count(DISTINCT o_orderpriority) >= 3""".stripMargin,
    "q13_count_distinct" ->
      """SELECT n_name, CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
        |round(sum(s_acctbal),2) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY 1""".stripMargin,
    "q33_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |round(sum(l_quantity),2) AS qty FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q34_cube" ->
      """SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |round(sum(o_totalprice),2) AS total FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,
    "q35_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact,
        |CAST(1 AS BIGINT) AS rel_err_ok FROM lineitem""".stripMargin,
    "q36_csv_scan" ->
      """SELECT CAST(camcol AS BIGINT) AS camcol, CAST(count(*) AS BIGINT) AS n,
        |CAST(count(DISTINCT run) AS BIGINT) AS n_runs
        |FROM read_csv_auto('/root/reference/data/test_images.csv') GROUP BY 1""".stripMargin,
    "q21_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |g AS (
        |  SELECT user_id, ts_sec - lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS gap
        |  FROM e),
        |f AS (
        |  SELECT user_id, CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_sess FROM g)
        |SELECT CAST(user_id AS BIGINT) AS user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
        |CAST(count(*) AS BIGINT) AS n_events FROM f GROUP BY 1""".stripMargin,
    "q22_hourly_events" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, event_type,
        |CAST(count(*) AS BIGINT) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1,2""".stripMargin,
  )
}
