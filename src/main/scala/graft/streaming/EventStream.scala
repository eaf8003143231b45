package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingest path (SURVEY §7 extension): the same
  * event analytics as the batch queries, expressed as streams —
  * watermarked tumbling-window aggregation and custom session state via
  * `flatMapGroupsWithState`. Batch parquet drives the stream through the
  * memory sink for deterministic verification (spark_guide.md pattern).
  */
object EventStream {

  /** Streaming-typed event (ts kept as epoch seconds for state logic). */
  final case class Event(event_id: Long, ts_sec: Long, user_id: Long,
      event_type: String, value: Double)

  final case class SessionOut(user_id: Long, n_sessions: Int, n_events: Long)

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // schema must match the on-disk layout (int64 nanos or TIMESTAMP_NTZ
    // micros depending on the testdata generation — see Tables.normalizeEventTs)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  /** Watermark + 10-minute tumbling windows; complete mode so the final
    * answer is deterministic when the batch source drains. The stream's
    * state partitioning is scoped down (8) around the query start — a
    * one-batch verification stream gains nothing from 32 state stores;
    * the session's batch setting is restored afterwards. */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val name = "win_" + UUID.randomUUID().toString.replace("-", "")
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Custom state machine: per-user sessionization with a 30-minute gap
    * rule via flatMapGroupsWithState (the KeyValueGroupedDataset stateful
    * path). Emits one row per user at event-time completion. */
  def sessionize(spark: SparkSession, dir: String): Dataset[SessionOut] = {
    import spark.implicits._
    val name = "sess_" + UUID.randomUUID().toString.replace("-", "")
    val events = eventStream(spark, dir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_sec"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]

    val out = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Int, Long, Long), SessionOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[(Int, Long, Long)]) =>
          // state = (nSessions, lastTs, nEvents)
          var (nSess, lastTs, nEv) = state.getOption.getOrElse((0, Long.MinValue, 0L))
          it.toSeq.sortBy(e => (e.ts_sec, e.event_id)).foreach { e =>
            if (lastTs == Long.MinValue || e.ts_sec - lastTs > 1800) nSess += 1
            lastTs = e.ts_sec
            nEv += 1
          }
          state.update((nSess, lastTs, nEv))
          Iterator(SessionOut(user, nSess, nEv))
      }

    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // last update per user is the final state
    spark.table(name)
      .groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      .select(col("user_id"), col("n_sessions").cast("int"),
        col("n_events").cast("long"))
      .as[SessionOut]
  }

  /** q212 — stream-static enrichment: the streaming events joined to a
    * STATIC dimension (customer → market segment) before the windowed
    * aggregate — the canonical streaming-ETL shape (enrich at ingest,
    * aggregate enriched). The static side is broadcast: a stream-static
    * join keeps NO join state (the dimension is re-resolvable every
    * micro-batch), so unlike q90's stream-stream join there is no
    * watermark bookkeeping on the dimension and state stays bounded by
    * the window aggregation alone. The LEFT join + 'UNKNOWN' fill is
    * the refuse-or-account rule at the enrichment boundary: an event
    * whose user has no dimension row aggregates under a visible label
    * instead of vanishing into an inner join.
    *
    * SCALE: at 100 TB of stream the dimension broadcast is per-
    * executor-once per batch; a dimension too big to broadcast flips
    * to a shuffled stream-static join with the SAME semantics — the
    * declarative plan is the knob, not the code. */
  def streamStaticEnrich(spark: SparkSession, dir: String): DataFrame = {
    val name = "enr_" + UUID.randomUUID().toString.replace("-", "")
    val dim = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "30 minutes")
      .join(broadcast(dim), Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("UNKNOWN")))
      .groupBy(window(col("ts"), "10 minutes"), col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_event_id"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("segment"), col("n"), col("sum_event_id"))
  }

  def q212StreamEnrich(spark: SparkSession, dir: String): DataFrame =
    streamStaticEnrich(spark, dir)

  /** q230 — NATIVE session windows: `session_window(ts, gap)` is the
    * engine's own merging-window state machine, the declarative twin
    * of the hand-rolled `flatMapGroupsWithState` sessionizer above —
    * windows merge as late members arrive and state is the engine's
    * session store, not custom tuples. Complete mode (no watermark
    * needed for a drained verification stream) so the final merged
    * sessions are deterministic. The oracle replays the gap rule
    * relationally: a session's end is its last event + gap, a new one
    * starts when the gap to the previous event exceeds 30 min —
    * proving the native operator's merge semantics equal the lag-rule
    * definition. At 100 TB the same query runs Append mode with a
    * watermark so session state expires; Complete is the
    * deterministic-verification harness, not the production mode. */
  def sessionWindowCounts(spark: SparkSession, dir: String): DataFrame = {
    val name = "sw_" + UUID.randomUUID().toString.replace("-", "")
    val agg = eventStream(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("sess_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("sess_end"),
        col("user_id"), col("n"))
  }

  def q230StreamSessionWindow(spark: SparkSession, dir: String): DataFrame =
    sessionWindowCounts(spark, dir)

  /** Stream-stream interval join — the streaming twin of the batch
    * attribution join (q81): click and purchase streams joined on
    * user_id with a 60-minute trailing event-time range. Watermarks on
    * BOTH sides let Spark expire join state (a click older than the
    * watermark minus the range can never match a future purchase, so
    * its buffer entry is dropped) — unbounded streams run in bounded
    * state, which is the whole point of the native stream-stream join
    * over a batch re-join per trigger. INNER join: outer-side emission
    * waits on watermark advancement past the range, which a one-shot
    * drained file source never guarantees deterministically; the
    * attributed-pairs inner result is deterministic on drain. The final
    * per-purchase count is a batch aggregate over the drained sink. */
  def intervalJoinPairs(spark: SparkSession, dir: String): DataFrame = {
    val name = "ij_" + UUID.randomUUID().toString.replace("-", "")
    val purchases = eventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = eventStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val joined = purchases.join(clicks,
      expr("""p_user = c_user AND
              c_ts <= p_ts AND c_ts > p_ts - INTERVAL 1 HOUR"""))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try joined.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Driver-gated form: attributed purchases with their click counts
    * (inner-join semantics — only purchases with ≥ 1 trailing click). */
  def q90StreamIntervalJoin(spark: SparkSession, dir: String): DataFrame =
    intervalJoinPairs(spark, dir)
      .groupBy(col("p_event_id").as("event_id"))
      .agg(count(lit(1)).as("n_clicks"))

  /** Driver-gated streaming query (oracle shares the batch semantics). */
  def q41StreamWindows(spark: SparkSession, dir: String): DataFrame =
    windowedCounts(spark, dir)
      .select(col("win_start"), col("event_type"),
        col("n").cast("long").as("n"), col("sum_value"))

  /** Watermark-BOUNDED streaming dedup — the state-TTL form exact
    * dedup takes on an unbounded stream when the full seen-set cannot
    * be held: at most one event per (user_id, event_type, 10-minute
    * bucket) survives, and a key's dedup state is DROPPED once the
    * watermark passes it (`dropDuplicatesWithinWatermark`), so state
    * is bounded by keys-per-watermark-window instead of stream history
    * — the practical unbounded-scale shape of q17's exact dedup, and
    * the complement of [[graft.streaming.DocumentStream]]'s
    * persistent-store dedup (which KEEPS history by design; this
    * operator is for keys whose duplicates arrive close in event
    * time). WHICH arrival survives depends on batch order, but
    * one-per-key does not — the gate aggregates surviving counts. */
  def dedupWithinWatermark(spark: SparkSession, dir: String): DataFrame = {
    val name = "dd_" + UUID.randomUUID().toString.replace("-", "")
    val dd = eventStream(spark, dir)
      .withColumn("bucket", expr("unix_micros(ts) div 600000000"))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "bucket")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try dd.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    spark.table(name).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
  }

  def q144StreamDedupTtl(spark: SparkSession, dir: String): DataFrame =
    dedupWithinWatermark(spark, dir)

  /** Streaming windowed distinct-user SKETCHES: per (hour, event_type),
    * the 64-register HLL maintained by the typed
    * [[graft.functions.HllSketchAggregator]] — the state store holds
    * exactly 64 longs per group regardless of how many users a group
    * ever sees, which is the only shape a distinct-count can take on an
    * unbounded stream (`countDistinct` is disallowed in streaming
    * precisely because its state is member-set-sized; the TTL dedup
    * q144 bounds state by TIME, this bounds it by SKETCH — the two
    * complementary answers). Registers come out of the drained sink,
    * the integer estimate reuses the batch
    * [[graft.operators.SketchOps.hllEstimate]] verbatim, and the exact
    * count joins from a batch pass for the q147 error-in-the-gate
    * convention. Streaming registers ≡ batch registers byte-for-byte
    * (same LCG, same max merge), so the oracle is the per-group integer
    * HLL replay.
    *
    * Complete mode is the bounded-drain gate shape (deterministic final
    * answer when the file source drains, the q41 pattern); a production
    * unbounded stream would run Update mode with a foreachBatch upsert
    * of changed groups' registers into a store — state stays 64
    * longs/group either way, only the EMISSION policy differs. */
  def hllWindowed(spark: SparkSession, dir: String): DataFrame = {
    val name = "hll_" + UUID.randomUUID().toString.replace("-", "")
    val sketch = udaf(new graft.functions.HllSketchAggregator())
    val agg = eventStream(spark, dir)
      .select(expr("unix_timestamp(ts) div 3600").as("hour"),
        col("event_type"), col("user_id"))
      .groupBy(col("hour"), col("event_type"))
      .agg(sketch(col("user_id")).as("regs"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    val regRows = spark.table(name)
      .select(concat_ws("|", col("hour"), col("event_type")).as("k"),
        posexplode(col("regs")).as(Seq("bucket", "m")))
      .select(col("k"), col("bucket").cast("long").as("bucket"), col("m"))
    val est = graft.operators.SketchOps.hllEstimate(regRows)
      .select(split(col("k"), "\\|").getItem(0).cast("long").as("hour"),
        split(col("k"), "\\|").getItem(1).as("event_type"),
        col("hll_est"), col("hll_raw"), col("v_empty"), col("max_rank"))
    val exact = graft.Tables.load(spark, dir, "events")
      .select(expr("unix_timestamp(ts) div 3600").as("hour"),
        col("event_type"), col("user_id"))
      .groupBy(col("hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    est.join(exact, Seq("hour", "event_type"))
      .select(col("hour"), col("event_type"), col("n_exact"),
        col("hll_est"), col("hll_raw"), col("v_empty"), col("max_rank"))
  }

  def q165StreamHllWindows(spark: SparkSession, dir: String): DataFrame =
    hllWindowed(spark, dir)

  /** q210 — LATE-DATA ACCOUNTING: the q179 flag-never-drop discipline
    * applied to the one place streaming MUST drop — watermark-expired
    * rows in a windowed aggregation — by making the engine's own drop
    * counter part of the gated result. Two deterministic micro-batches
    * (staged files with pinned mod-times, `maxFilesPerTrigger = 1`):
    * batch 0 is the on-time slice (its max event time advances the
    * watermark), batch 1 replays the straggler slice at original event
    * times, so stragglers whose 10-minute window closed before
    * watermark − 30 min are dropped BY SPARK; the oracle reproduces the
    * engine's drop rule from the data alone (a straggler survives iff
    * its window END is after the LAGGED watermark — the late-events
    * watermark trails eviction by one batch), and the gated
    * `n_dropped_total` comes from CONSERVATION over the staged frames
    * and the drained sink (stragglers − accepted), so nothing can be
    * silently lost: accepted + dropped = straggler slice by
    * construction, and the per-window counts pin WHICH rows the engine
    * accepted. The progress counter `numRowsDroppedByWatermark` is
    * deliberately NOT the gate: it under-reports when the map-side
    * partial aggregate pre-filters late rows (observed 1993 vs 1998
    * true drops at sf0.01), so it is a diagnostic, not an account.
    *
    * Update mode + memory sink: every state revision lands in the
    * sink; counts are monotone per key, so max-per-key IS the final
    * state (the drained-stream determinism recipe, q41's family).
    * State is bounded by the watermark horizon exactly as in q144. */
  def lateDataAccounting(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val name = "late_" + UUID.randomUUID().toString.replace("-", "")
    val tmp = graft.TempDirs.create("q210").toString
    val sdir = s"$tmp/stream"
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("event_id"))
    val fs = new Path(tmp).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(sdir))
    // stage three batches as single files with pinned mod-times so the
    // file source's (modTime, path) order is deterministic. THREE, not
    // two: Spark filters late rows with the watermark as of the
    // PREVIOUS batch's start (eviction uses the current one — the
    // two-watermark design of SPARK-24634), so the straggler batch must
    // be the third for the on-time slice's watermark to gate it; the
    // middle "tick" batch exists only to cycle the watermark forward.
    Seq(("b0", col("event_id") % 5 === 1L || col("event_id") % 5 === 2L ||
          col("event_id") % 5 === 3L, 1000000L),
        ("b1", col("event_id") % 5 === 4L, 2000000L),
        ("b2", col("event_id") % 5 === 0L, 3000000L)).foreach {
      case (tag, pred, mtime) =>
        val stage = s"$tmp/stage-$tag"
        ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
        val part = fs.listStatus(new Path(stage))
          .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
        val dst = new Path(s"$sdir/batch-$tag.parquet")
        if (!fs.rename(part, dst))
          throw new IllegalStateException(s"q210 staging rename failed: $dst")
        fs.setTimes(dst, mtime, -1)
    }
    val schema = spark.read.parquet(sdir).schema
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(sdir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    val finalState = spark.table(name)
      .groupBy(col("window"), col("event_type"))
      .agg(max(col("n")).as("n")) // monotone updates: max = final state
    // conservation accounting: accepted stragglers = sink total − on-time
    // rows; dropped = stragglers − accepted (three bounded scalar aggs)
    val nOnTime = ev.filter(col("event_id") % 5 =!= 0L).count()
    val nStraggler = ev.filter(col("event_id") % 5 === 0L).count()
    val nFinal = finalState.agg(sum(col("n"))).head.getLong(0)
    val dropped = nStraggler - (nFinal - nOnTime)
    finalState
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"),
        lit(dropped).as("n_dropped_total"))
  }

  def q210LateData(spark: SparkSession, dir: String): DataFrame =
    lateDataAccounting(spark, dir)

  val oracles: Map[String, String] = Map(
    // q210: batch replay of the watermark drop rule — W = max ts of
    // the FIRST on-time batch − 30 min (the late-events watermark the
    // straggler batch is filtered with, one batch behind eviction); a
    // straggler survives iff its 10-min window END is after W; the
    // engine-reported drop counter must equal the rule's complement
    // (accepted + dropped = stragglers)
    "q210_stream_late_data" ->
      """WITH e AS (SELECT ts, event_type, event_id FROM events),
        |a AS (SELECT * FROM e WHERE event_id % 5 != 0),
        |b AS (SELECT * FROM e WHERE event_id % 5 = 0),
        |wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM e
        |  WHERE event_id % 5 IN (1, 2, 3)),
        |keepb AS (SELECT * FROM b WHERE
        |  to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 + 600)
        |    > (SELECT w FROM wm)),
        |drops AS (SELECT CAST(count(*) AS BIGINT) AS d FROM b WHERE
        |  to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 + 600)
        |    <= (SELECT w FROM wm)),
        |acc AS (SELECT * FROM a UNION ALL SELECT * FROM keepb)
        |SELECT strftime(to_timestamp(
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600),
        |    '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  (SELECT d FROM drops) AS n_dropped_total
        |FROM acc GROUP BY 1, 2""".stripMargin,
    // integer HLL replay per (hour, event_type) — streaming registers
    // are byte-identical to batch registers, so the estimate gates
    "q165_stream_hll_windows" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
        |    event_type, user_id FROM events),
        |h AS (SELECT hour, event_type,
        |    ((user_id % 1000003) * 2654435761 % 1000003) * 999983
        |      + (user_id % 999983) * 1103515245 % 999983 AS h FROM e),
        |r AS (SELECT hour, event_type, h % 64 AS bucket,
        |    CASE WHEN h // 64 = 0 THEN 35
        |      ELSE 35 - (length(format('{:b}', h // 64)) - 1) END AS rk
        |  FROM h),
        |regs AS (SELECT hour, event_type, bucket, max(rk) AS m
        |  FROM r GROUP BY 1, 2, 3),
        |spine AS (SELECT hour, event_type, bucket
        |  FROM (SELECT DISTINCT hour, event_type FROM e),
        |       (SELECT unnest(generate_series(0, 63)) AS bucket)),
        |fullr AS (SELECT spine.hour, spine.event_type, spine.bucket,
        |    coalesce(m, 0) AS m
        |  FROM spine LEFT JOIN regs ON spine.hour = regs.hour
        |    AND spine.event_type = regs.event_type
        |    AND spine.bucket = regs.bucket),
        |agg AS (SELECT hour, event_type,
        |    CAST(sum(1::BIGINT << CAST(40 - m AS INT)) AS BIGINT) AS sum_term,
        |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty,
        |    CAST(max(m) AS BIGINT) AS max_rank
        |  FROM fullr GROUP BY 1, 2),
        |est AS (SELECT hour, event_type, v_empty, max_rank,
        |    (2904064::BIGINT * (1::BIGINT << 40)) // (1000 * sum_term)
        |      AS hll_raw
        |  FROM agg),
        |ex AS (SELECT hour, event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM e GROUP BY 1, 2)
        |SELECT est.hour, est.event_type, n_exact,
        |  CAST(CASE WHEN hll_raw <= 160 AND v_empty > 0
        |    THEN (LCTABLE)[CAST(v_empty AS INT)] ELSE hll_raw END AS BIGINT)
        |    AS hll_est,
        |  hll_raw, v_empty, max_rank
        |FROM est JOIN ex ON est.hour = ex.hour
        |  AND est.event_type = ex.event_type"""
        .stripMargin.replace("LCTABLE", graft.operators.SketchOps.lcArraySql),
    // one survivor per (user_id, event_type, 10-min bucket) ⇒ the
    // surviving count IS the distinct key count
    "q144_stream_dedup_ttl" ->
      """WITH k AS (SELECT DISTINCT event_type, user_id,
        |  epoch_us(ts) // 600000000 AS bucket FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_unique
        |FROM k GROUP BY 1""".stripMargin,
    "q41_stream_windows" ->
      """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1,2""".stripMargin,
    // q230: native session_window ≡ the relational gap rule — session
    // id by lag boundary, start = first event, end = last event + gap
    "q230_stream_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    |b AS (SELECT user_id, us, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS nb
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sgrp AS (SELECT user_id, us, sum(nb) OVER (PARTITION BY user_id
        |    ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM b)
        |SELECT strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S')
        |    AS sess_start,
        |  strftime(make_timestamp(max(us) + 1800000000),
        |    '%Y-%m-%d %H:%M:%S') AS sess_end,
        |  user_id, CAST(count(*) AS BIGINT) AS n
        |FROM sgrp GROUP BY user_id, sid""".stripMargin,
    // q212: the drained stream-static enrichment ≡ the batch left join
    "q212_stream_enrich" ->
      """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |  coalesce(c_mktsegment, 'UNKNOWN') AS segment,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_event_id
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    // inner-join twin of q81: purchases WITH at least one trailing click
    "q90_stream_interval_join" ->
      """SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_clicks
        |FROM events p JOIN events k
        |  ON p.user_id = k.user_id AND k.event_type = 'click'
        |  AND k.ts <= p.ts AND k.ts > p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1""".stripMargin,
  )
}
