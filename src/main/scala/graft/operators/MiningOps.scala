package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.syntax._

/** Third curation/analytics batch: winnowing document fingerprints, the
  * event conversion funnel, trailing event-time range windows, and a
  * skew-salted join. Same discipline as TextOps/CurationOps: codegen'd
  * built-ins over key-partitioned shuffles, no UDFs, and every
  * cross-engine-gated value computed in exact integer / string space so
  * the DuckDB oracle matches bit-for-bit.
  */
object MiningOps {

  // ---------------------------------------------------------------- q91

  /** Positional word-3-gram shingles: array of (pos, shingle) structs,
    * pos 0-based. Token array bound ONCE via the single-element-array
    * wrap (TextOps.shingles' HOF rule: plain argument expressions
    * re-evaluate per element inside lambda bodies). */
  private def posShingles(c: Column): Column =
    element_at(
      transform(array(split(c, " ")), t =>
        transform(sequence(lit(1), greatest(size(t) - 2, lit(1))),
          i => struct(
            (i - 1).cast("long").as("pos"),
            concat_ws(" ",
              element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))
              .as("sh")))),
      1)

  /** Winnowing fingerprint selection (Schleimer et al., the MOSS scheme):
    * hash every word-3-gram, then in every window of `w` consecutive
    * hashes keep the minimum — any shared substring of length ≥ w+2
    * tokens is GUARANTEED to share a selected fingerprint, at ~2/(w+1)
    * of the shingle storage. The plan is one explode + one doc-local
    * window (shuffles once on doc_id, frames are O(w)) + one per-source
    * aggregate — no pair joins, so it scales as a linear scan. Reported
    * per source: window count, selected-fingerprint mass (the index
    * size), distinct fingerprints (the dup signal), and the selection
    * ratio in ppm. */
  /** The winnowing selection itself, shared by [[q91Winnowing]] and
    * [[substringDupProfileWinnowed]]: `rows` = (doc_id, pos, h, …any
    * pass-through columns); every complete w-window contributes the
    * minimum hash in `fp`. One doc-local window, frames are O(w). */
  private def winnowSelected(rows: DataFrame, w: Int): DataFrame = {
    val byDoc = Window.partitionBy($"doc_id")
    val frame = byDoc.orderBy($"pos").rowsBetween(Window.currentRow, w - 1)
    rows
      .withColumn("fp", min($"h").over(frame))
      .withColumn("n_sh", count(lit(1)).over(byDoc))
      // a window is complete only while all w hashes exist
      .filter($"pos" <= $"n_sh" - w)
  }

  def q91Winnowing(s: SparkSession, dir: String, w: Int = 4): DataFrame = {
    val sel = winnowSelected(
      load(s, dir, "documents")
        .select($"doc_id", $"source", explode(posShingles($"text")).as("g"))
        .select($"doc_id", $"source", $"g.pos".as("pos"),
          substring(md5($"g.sh"), 1, 8).as("h")),
      w)
    sel.groupBy($"source")
      .agg(
        countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_windows"),
        countDistinct($"doc_id", $"fp").as("n_selected"),
        countDistinct($"fp").as("n_distinct_fp"))
      .withColumn("keep_ppm", expr("(n_selected * 1000000) div n_windows"))
  }

  /** [[graft.operators.TextOps.q69SubstringDup]]'s output contract over
    * the WINNOWING index instead of the full window index — the
    * profile a dedup pipeline runs when it already maintains winnowed
    * fingerprints (SCALE.md: the selected set is ~2/(w+1) of the
    * shingle mass, so the index shuffle shrinks ~60-70% at w=4):
    * same four columns, computed over selected fingerprints. By the
    * winnowing guarantee any verbatim run of ≥ w+k−1 tokens (k=3
    * shingles) shares a selected fingerprint in BOTH documents, so
    * `n_shared_windows ≥ 1` whenever q69 would flag a run that long —
    * shorter overlaps may drop out (that is the storage trade; the law
    * is pinned in MiningSpec). Plan: one explode + one doc-local window
    * + one fingerprint groupBy — the q91 scan shape, never doc-pairs;
    * fingerprints shuffle as 8-byte xxhash64 keys (the
    * substringDupProfileHashed wire discipline). */
  def substringDupProfileWinnowed(docs: DataFrame, w: Int = 4): DataFrame =
    TextOps.dupProfileFromIndex(
      winnowSelected(
        docs.select($"doc_id", explode(posShingles($"text")).as("g"))
          .select($"doc_id", $"g.pos".as("pos"), xxhash64($"g.sh").as("h")),
        w)
        .select($"doc_id", $"fp".as("g")).distinct()) // the winnowed index

  // ---------------------------------------------------------------- q92

  /** Conversion funnel: per user, the first view, the first click
    * STRICTLY AFTER that view, and the first purchase strictly after
    * that click — the sequential-stage semantics a flat groupBy can't
    * express. Three conditional min-aggregates chained by equi-joins,
    * all partitioned on user_id, so every stage reuses the same hash
    * partitioning (one logical shuffle key end to end) and no window
    * buffers whole user histories. Exact-µs timestamps. */
  def q92EventFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("v_us"))
    val c = ev.filter($"event_type" === "click")
      .join(v, "user_id").filter($"us" > $"v_us")
      .groupBy($"user_id").agg(min($"us").as("c_us"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"us" > $"c_us")
      .groupBy($"user_id").agg(min($"us").as("p_us"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select($"user_id", $"v_us", $"c_us", $"p_us")
  }

  // ---------------------------------------------------------------- q93

  /** Trailing 24 h activity count at each purchase: a RANGE frame over
    * event-time µs, partitioned by user — the feature-engineering shape
    * for "how active was this user when they bought". Value-based frames
    * make the result tie-insensitive (peers at the boundary are in or
    * out by VALUE, not row order), so the gate is exact on both engines.
    * One shuffle on user_id; frames never buffer more than the 24 h
    * slice. */
  def q93TrailingActivity(s: SparkSession, dir: String): DataFrame = {
    val W = 86400000000L // 24 h in µs
    val w = Window.partitionBy($"user_id").orderBy($"us").rangeBetween(-W, 0)
    load(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"n_24h")
  }

  // --------------------------------------------------------------- q216

  /** Integer-exact EWMA activity score at each user's last active
    * hour: score = Σ_{d=0..31} c_{last−d} · 2^(31−d) over hourly event
    * counts — exponential smoothing with α = 1/2 carried entirely in
    * scaled integers (a float EWMA recursion is summation-order
    * fragile; weights that are powers of two make the smoothed value
    * ONE exact integer on both engines). The recency-weighted activity
    * feature every engagement model wants, with q93's trailing-window
    * semantics upgraded from flat counts to exponential decay.
    *
    * SCALE: histogram-first (the q146 discipline applied to time) —
    * the corpus collapses to (user, hour) counts in one map-side-
    * combinable shuffle, and the weighting runs on the HOURLY table
    * with a ≤ 32-row window per user (equi-join on user + bounded hour
    * band), never on events. Long bound: c · 2^31 per term, 32 terms —
    * safe below ~2^27 events per user-hour. */
  def ewmaLastHour(events: DataFrame): DataFrame = {
    val hc = events
      .select($"user_id", expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy($"user_id", $"h").agg(count(lit(1)).as("c"))
    val lh = hc.groupBy($"user_id").agg(max($"h").as("lh"))
    hc.join(lh, "user_id")
      .filter($"h" >= $"lh" - 31 && $"h" <= $"lh")
      .groupBy($"user_id", $"lh")
      .agg(sum($"c" *
        expr("shiftleft(cast(1 as bigint), cast(31 - (lh - h) as int))"))
        .as("ewma_scaled"))
      .select($"user_id", $"lh".as("last_hour"), $"ewma_scaled")
  }

  def q216Ewma(s: SparkSession, dir: String): DataFrame =
    ewmaLastHour(load(s, dir, "events"))

  // --------------------------------------------------------------- q229

  /** Event debouncing — collapse bursts of the same (user, type) into
    * their first event when successive occurrences arrive within
    * `gapSec`: the instrumentation-noise cleaner (double-clicks, retry
    * storms, duplicated beacons) every event pipeline runs before
    * counting anything. Burst boundaries are the q213 run rule applied
    * to TIME: a new burst starts when the gap to the previous event
    * exceeds the threshold (lag + running sum of boundary flags), and
    * the survivor is the burst's first event ((us, event_id) order, so
    * ties are engine-deterministic). Conservation is part of the gated
    * row: kept + collapsed = total per type, and an event_id fold pins
    * WHICH events survived, not just how many.
    *
    * SCALE: one shuffle on (user_id, event_type); both windows (the
    * lag and the burst-id running sum) share that sort. Output is one
    * accounting row per event type. */
  def debounce(events: DataFrame, gapSec: Long): DataFrame = {
    val byKey = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"us", $"event_id")
    events
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("us"))
      .withColumn("new_burst",
        when(lag($"us", 1).over(byKey).isNull ||
          $"us" - lag($"us", 1).over(byKey) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"new_burst").as("n_kept"),
        (count(lit(1)) - sum($"new_burst")).as("n_collapsed"),
        sum(when($"new_burst" === 1L, $"event_id").otherwise(0L))
          .as("kept_id_fold"))
  }

  def q229Debounce(s: SparkSession, dir: String): DataFrame =
    debounce(load(s, dir, "events"), gapSec = 600L)

  // --------------------------------------------------------------- q246

  /** q246 — A/B-test readout with an EXACT two-proportion z-test:
    * variants split users by id parity, conversion = the user ever
    * purchased, and the 2σ significance test is cleared of every
    * division — (c₁n₂ − c₂n₁)²·N > 4·C·(N−C)·n₁·n₂ with C = c₁+c₂,
    * N = n₁+n₂ is algebraically z² > 4 under the pooled-variance
    * two-proportion test, compared as two exact integers (the q106
    * discipline applied to experimentation: a float z that flips at
    * the 15th digit is a shipped/not-shipped decision made by
    * summation order). Output: both arms' counts and the two cleared
    * sides, so dashboards can re-derive z² to any precision they want.
    *
    * SCALE: two aggregates over user-level reductions (distinct users
    * per arm, converted users per arm) — the corpus collapses to four
    * longs. Long bound: (c·n)²·N — safe to ~10⁵ users per arm at
    * BIGINT; widen to decimal(38,0) beyond (exact on both engines). */
  def q246AbTest(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val users = ev.select($"user_id").distinct()
      .select($"user_id", ($"user_id" % 2).as("arm"))
    val conv = ev.filter($"event_type" === "purchase")
      .select($"user_id").distinct().withColumn("converted", lit(1L))
    val arms = users.join(conv, Seq("user_id"), "left")
      .na.fill(0L, Seq("converted"))
      .groupBy($"arm")
      .agg(count(lit(1)).as("n"), sum($"converted").as("c"))
    val a0 = arms.filter($"arm" === 0L)
      .select($"n".as("n1"), $"c".as("c1"))
    val a1 = arms.filter($"arm" === 1L)
      .select($"n".as("n2"), $"c".as("c2"))
    a0.crossJoin(a1)
      .select($"n1", $"c1", $"n2", $"c2",
        (($"c1" * $"n2" - $"c2" * $"n1") * ($"c1" * $"n2" - $"c2" * $"n1") *
          ($"n1" + $"n2")).as("lhs"),
        (lit(4L) * ($"c1" + $"c2") *
          ($"n1" + $"n2" - $"c1" - $"c2") * $"n1" * $"n2").as("rhs"))
      .withColumn("significant_2sigma", $"lhs" > $"rhs")
  }

  // --------------------------------------------------------------- q225

  /** q225 — frequent token TRIPLES with Apriori pruning (Agrawal &
    * Srikant, VLDB 1994), extending q109's pairs one level: a triple
    * can only be frequent if every item in it is (the downward-closure
    * property), so each document's item list is pruned to the
    * FREQUENT vocabulary before any combination is generated — the
    * step that turns an O(|doc|³) explosion into O(m³) where m is the
    * per-doc frequent-item count (support ≥ 10% caps the frequent
    * vocabulary hard by Zipf: ~30 items on this corpus).
    *
    * SCALE: the df aggregate is map-combinable; the per-doc frequent
    * list is bounded by the frequent vocabulary (the collect_list
    * buffer is ≤ |frequent items| by construction — this is the
    * q149 lesson honored: prune BEFORE the buffer, not after); triple
    * generation runs in-row (the q204 discipline) with its fan-out
    * map-side combined into a key space ≤ C(|frequent|, 3); top-k is
    * a TakeOrdered, never a global sort. */
  def itemsetTriples(docs: DataFrame, topK: Int): DataFrame = {
    val nDocs = docs.count()
    val dt = docs
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("t"))
      .filter(length($"t") >= 1)
    val freq = dt.groupBy($"t").agg(count(lit(1)).as("df"))
      .filter($"df" * 10 >= nDocs)
    // dictionary-encode the frequent vocabulary (Zipf-capped — 30 items
    // here) so the hot path never touches a string: the first cut of
    // this operator generated 10M 3-string structs and spent 12 s
    // hashing them; packed-long triples aggregate in ~1/6 of that.
    // Ids are assigned in token order, so sorting ids ≡ sorting tokens
    // and i<j<k enumerates the same canonical triples. 20-bit fields
    // bound the dictionary at 2^20 — refused loudly, never truncated.
    val dict = freq.select($"t",
      row_number().over(Window.orderBy($"t")).cast("long").as("tid"))
    val nFreq = dict.count()
    require(nFreq < (1L << 20),
      s"itemsetTriples: frequent vocabulary $nFreq exceeds the 20-bit " +
        "dictionary — raise the support threshold")
    val fl = dt.join(broadcast(dict), "t")
      .groupBy($"doc_id").agg(array_sort(collect_list($"tid")).as("ids"))
      .filter(size($"ids") >= 3) // also guards the ascending sequences
      // AQE coalesces this byte-tiny (doc, ids) frame to ONE partition
      // and the C(m,3) in-row explosion below then runs SERIALLY
      // (measured: 4.6 s on a single task at sf0.1, 90% of the query).
      // The explosion's cost is in rows OUT, which size-based
      // coalescing cannot see — pin the fan-out stage's parallelism to
      // the session's, scale-adaptively (at real scale the frame is
      // big enough that AQE keeps it wide and this exchange of the
      // compact per-doc rows is noise next to the explosion).
      // Round-robin, NOT hash-by-doc_id: the aggregate above already
      // hash-partitions by doc_id, so a same-key repartition is elided
      // as redundant by EnsureRequirements and the coalesced read
      // comes back; a REPARTITION_BY_NUM shuffle is never coalesced.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    // native codegen triple packer: the nested-HOF form (flatten ∘
    // transform ∘ transform ∘ transform with element_at) evaluated a
    // lambda and boxed a Long PER TRIPLE off the codegen path, plus two
    // flatten copy levels and one array allocation per (i, j) prefix —
    // at sf0.1 that single stage burned 17 task-sec + GC to emit the
    // ~16M triples. PackedTriplesExpr fills one primitive long[] with
    // three tight loops (same multiset, same order, proven by law in
    // MiningOpsSpec)
    val packed = fl.select(explode(
        graft.plans.VectorExpressions.packed_triples($"ids")).as("p"))
      .groupBy($"p").agg(count(lit(1)).as("support"))
    def tok(idCol: Column, alias: String) =
      broadcast(dict.select($"tid".as(s"${alias}_id"), $"t".as(alias)))
    packed
      .select(expr("p div 1099511627776").as("a_id"),
        expr("p div 1048576 % 1048576").as("b_id"),
        ($"p" % 1048576L).as("c_id"), $"support")
      .join(tok($"tid", "a"), "a_id").join(tok($"tid", "b"), "b_id")
      .join(tok($"tid", "c"), "c_id")
      .select($"a", $"b", $"c", $"support")
      .orderBy($"support".desc, $"a", $"b", $"c").limit(topK)
  }

  def q225ItemsetTriples(s: SparkSession, dir: String,
      topK: Int = 50): DataFrame =
    itemsetTriples(load(s, dir, "documents"), topK)

  // --------------------------------------------------------------- q240

  /** q240 — funnel latency quantiles: exact p50/p90/p99 of the
    * view→click conversion delay (q92's first-view/first-click
    * semantics), computed histogram-first (the q146 rule) over
    * whole-second deltas — time-to-convert is THE funnel health metric
    * and a mean would be owned by the stragglers. The quantile window
    * runs over the delay histogram — a global window, allowed because
    * the histogram is bounded by the distinct-delay domain
    * (sweep-listed with that bound). */
  def q240FunnelLatency(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("v_us"))
    val c = ev.filter($"event_type" === "click")
      .join(v, "user_id").filter($"us" > $"v_us")
      .groupBy($"user_id").agg(min($"us").as("c_us"))
    val hist = v.join(c, "user_id")
      .select(expr("(c_us - v_us) div 1000000").as("d"))
      .groupBy($"d").agg(count(lit(1)).as("n"))
    hist
      .select($"d", $"n",
        sum($"n").over(Window.orderBy($"d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
        sum($"n").over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).as("tot"))
      .crossJoin(broadcast(
        s.range(0, 3).select(
          element_at(typedLit(Seq(50L, 90L, 99L)), ($"id" + 1).cast("int"))
            .as("p"))))
      .filter($"cum" * 100 >= $"tot" * $"p")
      .groupBy($"p")
      .agg(max($"tot").as("n_users"), min($"d").as("q_sec"))
  }

  // ---------------------------------------------------------------- q94

  /** Skew-salted equi-join: the fact side gets a deterministic salt in
    * [0, nSalts), the dim side is replicated once per salt value, and
    * the join key becomes (key, salt) — a hot key's probe rows now land
    * on nSalts partitions instead of one straggler. The salt derives
    * from a non-key fact column (same-key rows MUST fan out) and never
    * reaches the output, so the result is identical to the plain join.
    * This is the manual fallback for skew AQE can't fix (e.g. when the
    * hot key is hot on BOTH the probe and a downstream agg). */
  def saltedJoin(
      fact: DataFrame, saltExpr: Column,
      dim: DataFrame, key: String, nSalts: Int): DataFrame = {
    val f = fact.withColumn("__salt", pmod(saltExpr, lit(nSalts)).cast("int"))
    val d = dim.withColumn("__salt", explode(
      sequence(lit(0), lit(nSalts - 1)).cast("array<int>")))
    // merge hint: the whole point is the shuffled-join partitioning —
    // broadcasting the replicated dim would erase what we're load-balancing
    f.join(d.hint("merge"), Seq(key, "__salt")).drop("__salt")
  }

  /** Per-event-type audience mass via the salted join: every event joined
    * to its user's total event count (user_id is the canonical skewed
    * key — power users are exactly the rows that straggle), then
    * aggregated. Oracle is the UNsalted join: salting must not change a
    * single row. */
  def q94SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val fact = ev.select($"event_id", $"user_id", $"event_type")
    val dim = ev.groupBy($"user_id").agg(count(lit(1)).as("user_events"))
    saltedJoin(fact, xxhash64($"event_id"), dim, "user_id", 8)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"user_events").as("sum_user_events"))
  }

  // --------------------------------------------------------------- q160

  /** Per-key skew profile — the diagnostic that decides WHEN [[saltedJoin]]
    * is needed and sizes its `nSalts`: the top-`topK` heaviest keys with
    * their exact row count, corpus share in ppm, and the recommended salt
    * factor ceil(c · n_keys / n_rows) — how many times heavier than the
    * mean key this key is, i.e. how many partitions its rows should fan
    * out over so the hottest salted partition carries ~mean load. All
    * integer math (ppm + ceil-div), identical on both engines.
    *
    * SCALE: the counts table is key-cardinality (map-side combinable),
    * the totals are three longs broadcast back over it, and the top-k is
    * TakeOrderedAndProject (per-partition heaps + driver merge of topK
    * rows) — never a global sort. The profile touches the corpus through
    * exactly one aggregate; nothing in the plan scales with row count
    * beyond that first combine. */
  def skewProfile(df: DataFrame, keyCol: Column, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("c"))
    val tot = counts.agg(
      sum($"c").as("n_rows"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select($"key", $"c",
        expr("c * 1000000 div n_rows").as("share_ppm"),
        expr("(c * n_keys + n_rows - 1) div n_rows").as("salt_factor"),
        $"n_rows", $"n_keys")
      .orderBy($"c".desc, $"key")
      .limit(topK)
  }

  def q160SkewProfile(s: SparkSession, dir: String): DataFrame =
    skewProfile(load(s, dir, "events"), $"user_id")

  // ---------------------------------------------------------------- q95

  /** Prefix-filtered set-similarity join (the AllPairs/PPJoin family,
    * Bayardo et al. / Xiao et al.): for Jaccard ≥ t it is EXACT — under
    * any global token order, two sets with J ≥ t must collide within
    * their first |d| − ⌈t·|d|⌉ + 1 tokens — so only prefix tokens enter
    * the inverted-index join. Ordering rare-first (ascending document
    * frequency) makes those prefixes the least-shared tokens, which is
    * what collapses the candidate set: the full index joins EVERY
    * co-occurring pair (O(Σ df²) at 100 TB), the prefix index only
    * near-dup suspects. A length filter (5·min ≥ 3·max ⇔ t = 0.6 on
    * sizes) prunes candidates the sizes alone rule out, and the exact
    * intersection is computed ONLY for surviving pairs. Every score is
    * integer-exact (8·∩ ≥ 3·(n_a+n_b) ⇔ J ≥ 0.6), so the gate — whose
    * oracle is the brute-force all-pairs twin — proves the filter
    * dropped nothing. */
  def q95PrefixFilterJoin(s: SparkSession, dir: String): DataFrame = {
    // one shingle pass, hash-distributed on the shingle key so the df
    // aggregate and the prefix self-join reuse the exchange (q23's rule)
    val sh = load(s, dir, "documents")
      .select($"doc_id", explode(TextOps.shingles($"text")).as("g"))
      .repartition($"g")
    val df = sh.groupBy($"g").agg(count(lit(1)).as("df"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val ranked = sh.join(df, "g")
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"g")))
      .join(sizes, "doc_id")
      // prefix length for t = 0.6: n - ceil(3n/5) + 1
      .filter($"rnk" <= $"n" - expr("(3 * n + 4) div 5") + 1)
      .select($"doc_id", $"g", $"n")
    val cand = ranked.as("a").join(ranked.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          lit(5) * least(col("a.n"), col("b.n")) >=
          lit(3) * greatest(col("a.n"), col("b.n")))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    // exact verify via per-doc shingle SETS (the q23 verify shape): the
    // sets frame joins the candidate pairs twice and ∩ is a single
    // codegen MERGE WALK per pair over per-doc-sorted sets
    // (sorted_intersect_count — array_intersect built a hash set per
    // invocation; the sort is paid once per doc, the walk once per
    // candidate pair, which is the side that explodes at corpus scale).
    // This replaced the double postings re-join, which re-shuffled the
    // full posting list on doc_id per probe side.
    val sets = sh.groupBy($"doc_id").agg(sort_array(collect_set($"g")).as("gs"))
    val inter = cand
      .join(sets.select($"doc_id".as("da"), $"gs".as("gs_a")), "da")
      .join(sets.select($"doc_id".as("db"), $"gs".as("gs_b")), "db")
      .select($"da", $"db", $"na", $"nb",
        graft.plans.VectorExpressions.sorted_intersect_count($"gs_a", $"gs_b")
          .cast("long").as("inter"))
    inter.filter(lit(8) * $"inter" >= lit(3) * ($"na" + $"nb"))
      .select($"da".as("doc_a"), $"db".as("doc_b"), $"inter",
        expr("(inter * 1000000) div (na + nb - inter)").as("jac_ppm"))
  }

  // ---------------------------------------------------------------- q97

  private val EventTypes = Seq("view", "click", "purchase", "signup", "error")

  /** Pivot: per-user event counts spread into one column per event type —
    * the wide-table reshape. The type list is EXPLICIT (`pivot(col,
    * values)`): with it the pivot is a single groupBy with conditional
    * aggregates (one shuffle, map-side combinable); without it Spark
    * first runs a distinct-values job and the pipeline gains a blocking
    * pass over the input — never acceptable at 100 TB. */
  def q97PivotEvents(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select($"user_id" +: EventTypes.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  // ---------------------------------------------------------------- q98

  /** Session-transition (Markov) matrix: for each consecutive event pair
    * in a user's timeline, count from→to transitions and each row's
    * share of its from-state mass. `lead` over the (user, time) window
    * — unique event_id tie-break makes the sequence engine-deterministic
    * — then a 25-row aggregate; the share is computed with a window over
    * the AGGREGATED matrix (25 rows), never the raw events. */
  def q98SessionTransitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val m = load(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("next", lead($"event_type", 1).over(byUser))
      .filter($"next".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next".as("to_type"))
      .agg(count(lit(1)).as("n"))
    m.withColumn("from_total", sum($"n").over(Window.partitionBy($"from_type")))
      .select($"from_type", $"to_type", $"n",
        expr("(n * 1000000) div from_total").as("share_ppm"))
  }

  // ---------------------------------------------------------------- q99

  /** Retention cohorts: users grouped by first-seen day, counted on each
    * later active day — the engagement matrix behind every "day-N
    * retention" metric. Two aggregates on user_id (first-seen reuses the
    * distinct-activity exchange) + one date-offset aggregate; everything
    * is dates and day arithmetic, so the gate is exact. */
  def q99RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val act = load(s, dir, "events")
      .select($"user_id", to_date($"ts").as("d"))
      .distinct()
    val first = act.groupBy($"user_id").agg(min($"d").as("cohort"))
    act.join(first, "user_id")
      .groupBy(
        $"cohort".cast("string").as("cohort_day"),
        datediff($"d", $"cohort").cast("long").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
  }

  // ---------------------------------------------------------------- q100

  /** Rank-based per-source length trim: drop each source's bottom and
    * top decile by token count — the outlier trim of a curation funnel,
    * expressed ORDINALLY (row_number vs n div 10 cutoffs, doc_id
    * tie-break) so both engines cut exactly the same rows; value-based
    * percentile cuts are float-fragile at ties. One key-local window +
    * one aggregate. */
  def q100QualityTrim(s: SparkSession, dir: String): DataFrame = {
    val bySource = Window.partitionBy($"source")
    val w = bySource.orderBy($"n_tok", $"doc_id")
    load(s, dir, "documents")
      .select($"doc_id", $"source", size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(bySource))
      .withColumn("keep", $"rk" > expr("n div 10") && $"rk" <= $"n" - expr("n div 10"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_in"),
        count(when($"keep", 1)).as("n_kept"),
        min(when($"keep", $"n_tok")).as("min_kept_tok"),
        max(when($"keep", $"n_tok")).as("max_kept_tok"),
        coalesce(sum(when($"keep", $"n_tok")), lit(0L)).as("tokens_kept"))
  }

  // ---------------------------------------------------------------- q101

  /** Unpivot (melt): the wide per-user event matrix back to long form —
    * the reshape that turns column-per-metric exports into the
    * row-per-fact layout the rest of the engine joins on. Spark's
    * native `unpivot` is a Generate-style fan-out (pure map side, no
    * shuffle beyond q97's aggregate); zero rows are dropped so the long
    * form carries exactly the observed mass. */
  def q101UnpivotEvents(s: SparkSession, dir: String): DataFrame =
    q97PivotEvents(s, dir)
      .unpivot(
        Array($"user_id"),
        EventTypes.map(t => col(s"n_$t")).toArray,
        "event_type", "n")
      .filter($"n" > 0)

  // ---------------------------------------------------------------- q102

  /** Relational set ops on behavior segments: users who viewed but never
    * purchased (EXCEPT) vs users who did both (INTERSECT) — the audience
    * segmentation shape. Both are distinct set operators; Spark plans
    * them as key-partitioned aggregates/joins, so at 100 TB they shuffle
    * once on user_id like any groupBy. */
  def q102AudienceSetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    def users(t: String) = ev.filter($"event_type" === t).select($"user_id")
    val viewers = users("view")
    val buyers = users("purchase")
    viewers.intersect(buyers).withColumn("segment", lit("view_and_buy"))
      .unionByName(
        viewers.except(buyers).withColumn("segment", lit("view_no_buy")))
      .select($"segment", $"user_id")
  }

  // ---------------------------------------------------------------- q103

  /** Time-series gap-fill: per-user daily event counts with missing days
    * zero-filled across each user's [first, last] activity span — the
    * resample step before any rolling/trend computation (a gap is DATA,
    * not absence, once windows slide over it). `sequence(d0, d1)`
    * generates the calendar key-locally (no calendar-table cross join),
    * and the left join back to observed counts rides the same user
    * partitioning. */
  def q103GapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "events")
      .select($"user_id", to_date($"ts").as("d"))
      .groupBy($"user_id", $"d").agg(count(lit(1)).as("n"))
    val days = daily.groupBy($"user_id")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("d"))
    days.join(daily, Seq("user_id", "d"), "left")
      .select($"user_id", $"d".cast("string").as("day"),
        coalesce($"n", lit(0L)).as("n_events"))
  }

  // ---------------------------------------------------------------- q104

  /** Keyless trailing-window join, written NAIVELY: clicks by ANY user
    * in the hour before each purchase (global campaign attribution).
    * There is no equi conjunct, so vanilla Spark plans this as a
    * BroadcastNestedLoopJoin — one side broadcast whole, re-scanned per
    * row. The engine's [[graft.plans.RangeJoinRewriteRule]] rewrites it
    * to the bucket-expansion equi-join automatically (RangeJoinSpec +
    * PlanSpec gate the plan), so the declarative theta form is also the
    * scalable form — the whole point of doing this in the optimizer
    * rather than asking users to call intervalCount. */
  def q104RangeJoinNative(s: SparkSession, dir: String): DataFrame = {
    val W = 3600000000L // 60 min in µs
    val ev = load(s, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", unix_micros($"ts").as("pus"))
    val k = ev.filter($"event_type" === "click")
      .select(unix_micros($"ts").as("cus"))
    p.join(k, $"cus" <= $"pus" && $"cus" > $"pus" - W)
      .groupBy($"event_id").agg(count(lit(1)).as("n_clicks"))
  }

  // ---------------------------------------------------------------- q122

  /** The LEFT OUTER attribution form, written naively: every purchase
    * with its preceding-hour click count, ZERO-click purchases kept —
    * the report shape q104's inner join drops. The preserved side is
    * the anchor, so [[graft.plans.RangeJoinRewriteRule]] rewrites this
    * off the nested-loop path too; `count(cus)` counts non-null rows,
    * so the null-extended row contributes 0. */
  def q122LeftRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val W = 3600000000L // 60 min in µs
    val ev = load(s, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", unix_micros($"ts").as("pus"))
    val k = ev.filter($"event_type" === "click")
      .select(unix_micros($"ts").as("cus"))
    p.join(k, $"cus" <= $"pus" && $"cus" > $"pus" - W, "left")
      .groupBy($"event_id").agg(count($"cus").as("n_clicks"))
  }

  // ---------------------------------------------------------------- q121

  /** Keyless SYMMETRIC proximity join, written naively: clicks by ANY
    * user within ±5 minutes of each error event (incident blast-radius
    * attribution). `abs(a − r) <= W` has no equi conjunct either, and
    * the same optimizer rule rewrites it to the 3-bucket expansion
    * equi-join — the symmetric-band shape of the q104 rewrite. */
  def q121ProximityJoin(s: SparkSession, dir: String): DataFrame = {
    val W = 300000000L // 5 min in µs
    val ev = load(s, dir, "events")
    val e = ev.filter($"event_type" === "error")
      .select($"event_id", unix_micros($"ts").as("eus"))
    val k = ev.filter($"event_type" === "click")
      .select(unix_micros($"ts").as("cus"))
    e.join(k, abs($"eus" - $"cus") <= W)
      .groupBy($"event_id").agg(count(lit(1)).as("n_nearby_clicks"))
  }

  // ------------------------------------------------------------ oracles

  // ---------------------------------------------------------------- q199

  /** q199 — position-based (U-shaped) multi-touch attribution: every
    * purchase's value is split across the click/view touches of the
    * SAME user in the trailing 7 days — 40% to the first touch, 40% to
    * the last, 20% spread over the middles — and credit rolls up per
    * touch type. The split is INTEGER-EXACT in basis points: first and
    * last get 4000 each, middles get 2000 div (n−2) with the remainder
    * assigned to the EARLIEST middle (deterministic, no float, and the
    * per-conversion credits sum to exactly 10000 — the conservation
    * law MiningOpsSpec pins); single-touch takes 10000, two-touch
    * 5000/5000. Credit is reported scaled: value-micros × bps (Σ per
    * conversion = 10⁴ × value-micros exactly).
    *
    * SCALE: the touch join has an equi conjunct on user_id — it
    * shuffles both sides on the user and evaluates the 7-day band
    * inside the key (key-local fan-out bounded by a user's weekly
    * touch count, never corpus²). Position/count run in ONE window
    * partitioned by the conversion id — conversion-local state, same
    * bound. Purchases with zero touches are kept through the left join
    * and accounted in the `untouched` row (value retained, not
    * attributed — the refuse-or-account rule for attribution). */
  def q199Attribution(s: SparkSession, dir: String): DataFrame = {
    val W = 604800000000L // 7 days in µs
    val ev = load(s, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id",
        unix_micros($"ts").as("pus"),
        floor($"value" * 1e6 + 0.5).cast("long").as("vmicros"))
    val t = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"event_id".as("tid"),
        $"event_type".as("touch_type"), unix_micros($"ts").as("tus"))
    val joined = p.join(t,
      p("user_id") === t("user_id") &&
        $"tus" <= $"pus" && $"tus" > $"pus" - W, "left")
    val byConv = Window.partitionBy($"pid")
    val pos = joined
      .withColumn("n", count($"tid").over(byConv))
      .withColumn("rn", row_number().over(byConv.orderBy($"tus", $"tid")))
    val bps = when($"n" === 1, 10000L)
      .when($"n" === 2, 5000L)
      .when($"rn" === 1 || $"rn" === $"n", 4000L)
      .otherwise(expr("2000 div (n - 2)") +
        when($"rn" === 2, lit(2000L) - expr("(2000 div (n - 2)) * (n - 2)"))
          .otherwise(0L))
    pos.select(
        coalesce($"touch_type", lit("untouched")).as("touch_type"),
        when($"tid".isNotNull, bps).otherwise(10000L).as("bps"),
        $"vmicros")
      .groupBy($"touch_type")
      .agg(count(lit(1)).as("n_touches"),
        sum($"vmicros" * $"bps").as("credit_scaled"))
  }

  val oracles: Map[String, String] = Map(
    "q199_attribution" ->
      """WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pus,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vmicros
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS tid, event_type AS touch_type,
        |    epoch_us(ts) AS tus
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (SELECT p.pid, p.vmicros, t.tid, t.touch_type, t.tus
        |  FROM p LEFT JOIN t ON p.user_id = t.user_id
        |    AND t.tus <= p.pus AND t.tus > p.pus - 604800000000),
        |w AS (SELECT pid, vmicros, tid, touch_type,
        |    count(tid) OVER (PARTITION BY pid) AS n,
        |    row_number() OVER (PARTITION BY pid ORDER BY tus, tid) AS rn
        |  FROM j),
        |b AS (SELECT
        |    CASE WHEN tid IS NULL THEN 'untouched' ELSE touch_type END
        |      AS touch_type,
        |    CASE WHEN tid IS NULL THEN 10000
        |         WHEN n = 1 THEN 10000
        |         WHEN n = 2 THEN 5000
        |         WHEN rn = 1 OR rn = n THEN 4000
        |         ELSE 2000 // (n - 2) + CASE WHEN rn = 2
        |           THEN 2000 - (2000 // (n - 2)) * (n - 2) ELSE 0 END
        |    END AS bps, vmicros
        |  FROM w)
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(vmicros * bps) AS BIGINT) AS credit_scaled
        |FROM b GROUP BY 1""".stripMargin,
    "q160_skew_profile" ->
      """WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys FROM c)
        |SELECT key, c, c * 1000000 // n_rows AS share_ppm,
        |  (c * n_keys + n_rows - 1) // n_rows AS salt_factor,
        |  n_rows, n_keys
        |FROM c, t ORDER BY c DESC, key LIMIT 20""".stripMargin,
    "q91_winnowing" ->
      """WITH t AS (SELECT doc_id, source, string_split(text,' ') AS ts FROM documents),
        |ix AS (SELECT doc_id, source, ts,
        |  unnest(list_transform(ts, (x,i) -> i)) AS i FROM t),
        |sh AS (SELECT doc_id, source, CAST(i - 1 AS BIGINT) AS pos,
        |  substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 8) AS h,
        |  len(ts) - 2 AS n_sh
        |  FROM ix WHERE i <= len(ts) - 2),
        |fp AS (SELECT doc_id, source, pos, n_sh,
        |  min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM sh),
        |sel AS (SELECT * FROM fp WHERE pos <= n_sh - 4)
        |SELECT source,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(count(DISTINCT (doc_id, fp)) AS BIGINT) AS n_selected,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
        |  CAST((count(DISTINCT (doc_id, fp)) * 1000000) // count(*) AS BIGINT) AS keep_ppm
        |FROM sel GROUP BY 1""".stripMargin,
    "q92_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT user_id, min(us) AS c_us FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > v_us GROUP BY 1),
        |p AS (SELECT user_id, min(us) AS p_us FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us > c_us GROUP BY 1)
        |SELECT v.user_id, v_us, c_us, p_us
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,
    "q93_trailing_activity" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |w AS (SELECT event_id, user_id, event_type,
        |  count(*) OVER (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS n_24h FROM e)
        |SELECT event_id, user_id, CAST(n_24h AS BIGINT) AS n_24h
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    // q246: user-level reduction to four longs, then the cleared
    // two-proportion inequality
    "q246_ab_test" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |cv AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase'),
        |arms AS (SELECT u.user_id % 2 AS arm,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM u LEFT JOIN cv ON u.user_id = cv.user_id GROUP BY 1),
        |w AS (SELECT
        |  (SELECT n FROM arms WHERE arm = 0) AS n1,
        |  (SELECT c FROM arms WHERE arm = 0) AS c1,
        |  (SELECT n FROM arms WHERE arm = 1) AS n2,
        |  (SELECT c FROM arms WHERE arm = 1) AS c2)
        |SELECT n1, c1, n2, c2,
        |  (c1*n2 - c2*n1) * (c1*n2 - c2*n1) * (n1 + n2) AS lhs,
        |  4 * (c1 + c2) * (n1 + n2 - c1 - c2) * n1 * n2 AS rhs,
        |  (c1*n2 - c2*n1) * (c1*n2 - c2*n1) * (n1 + n2)
        |    > 4 * (c1 + c2) * (n1 + n2 - c1 - c2) * n1 * n2
        |    AS significant_2sigma
        |FROM w""".stripMargin,
    // q240: q92's first-view/first-click chain, whole-second deltas,
    // the q146 rank rule over the delay histogram
    "q240_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(us) AS c_us FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > v_us GROUP BY 1),
        |d AS (SELECT (c_us - v_us) // 1000000 AS d FROM v JOIN c USING (user_id)),
        |h AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |w AS (SELECT d, n,
        |    sum(n) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER () AS tot FROM h),
        |p AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p)
        |SELECT p, CAST(max(tot) AS BIGINT) AS n_users, min(d) AS q_sec
        |FROM w, p WHERE cum * 100 >= tot * p
        |GROUP BY 1""".stripMargin,
    // q225: prune to >= 10% items, in-row i<j<k generation replayed as
    // three chained lateral series, top-50 by (support, lexicographic)
    "q225_itemset_triples" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |dt AS (SELECT doc_id, t
        |  FROM (SELECT doc_id,
        |      unnest(list_distinct(string_split(text, ' '))) AS t
        |    FROM documents)
        |  WHERE len(t) >= 1),
        |f AS (SELECT t FROM (SELECT t, count(*) AS df FROM dt GROUP BY 1)
        |  WHERE df * 10 >= (SELECT n FROM n)),
        |fl AS (SELECT doc_id, list_sort(list(t)) AS items
        |  FROM dt JOIN f USING (t) GROUP BY 1),
        |tr AS (SELECT items[i] AS a, items[j] AS b, items[k] AS c
        |  FROM fl,
        |    unnest(generate_series(1, len(items))) AS u(i),
        |    unnest(generate_series(i + 1, len(items))) AS v(j),
        |    unnest(generate_series(j + 1, len(items))) AS w2(k))
        |SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
        |FROM tr GROUP BY 1, 2, 3
        |ORDER BY support DESC, a, b, c LIMIT 50""".stripMargin,
    // q229: the burst-boundary lag rule replayed; survivors pinned by
    // the id fold, conservation by construction
    "q229_debounce" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS us FROM events),
        |b AS (SELECT event_type, event_id,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 600000000 THEN 1 ELSE 0 END AS nb
        |  FROM e WINDOW w AS (PARTITION BY user_id, event_type
        |    ORDER BY us, event_id))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(nb) AS BIGINT) AS n_kept,
        |  CAST(count(*) - sum(nb) AS BIGINT) AS n_collapsed,
        |  CAST(sum(CASE WHEN nb = 1 THEN event_id ELSE 0 END) AS BIGINT)
        |    AS kept_id_fold
        |FROM b GROUP BY 1""".stripMargin,
    // q216: hourly histogram → last hour per user → 32-term power-of-2
    // weighted sum, all in BIGINTs (floor-epoch div ≡ unix_timestamp div)
    "q216_ewma" ->
      """WITH hc AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |lh AS (SELECT user_id, max(h) AS lh FROM hc GROUP BY 1)
        |SELECT hc.user_id, lh AS last_hour,
        |  CAST(sum(c * (1::BIGINT << CAST(31 - (lh - h) AS INT))) AS BIGINT)
        |    AS ewma_scaled
        |FROM hc JOIN lh ON hc.user_id = lh.user_id
        |WHERE h >= lh - 31 AND h <= lh
        |GROUP BY 1, 2""".stripMargin,
    // the salt never reaches the output: the oracle is the PLAIN join
    "q94_salted_join" ->
      """WITH d AS (SELECT user_id, count(*) AS user_events FROM events GROUP BY 1)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(user_events) AS BIGINT) AS sum_user_events
        |FROM events JOIN d USING (user_id)
        |GROUP BY 1""".stripMargin,
    // prefix filtering is exact for J >= t, so the oracle is the
    // brute-force all-pairs twin — hash equality proves zero false drops
    "q95_prefix_filter_join" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |ix AS (SELECT doc_id, ts, unnest(list_transform(ts, (x,i) -> i)) AS i FROM t),
        |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
        |  FROM ix WHERE i <= len(ts) - 2),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b, CAST(inter AS BIGINT) AS inter,
        |  CAST((inter * 1000000) // (sa.n + sb.n - inter) AS BIGINT) AS jac_ppm
        |FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
        |WHERE 8 * inter >= 3 * (sa.n + sb.n)""".stripMargin,
    "q97_pivot_events" ->
      """SELECT user_id,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error
        |FROM events GROUP BY 1""".stripMargin,
    "q98_session_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |nx AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
        |  FROM e),
        |m AS (SELECT from_type, to_type, count(*) AS n FROM nx
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS share_ppm
        |FROM m""".stripMargin,
    "q99_retention_cohorts" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |first AS (SELECT user_id, min(d) AS cohort FROM act GROUP BY 1)
        |SELECT CAST(cohort AS VARCHAR) AS cohort_day,
        |  CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM act JOIN first USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q100_quality_trim" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(string_split(text, ' ')) AS n_tok FROM documents),
        |r AS (SELECT doc_id, source, n_tok,
        |  row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rk,
        |  count(*) OVER (PARTITION BY source) AS n FROM d),
        |k AS (SELECT source, n_tok,
        |  (rk > n // 10 AND rk <= n - n // 10) AS keep FROM r)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_in,
        |  CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept,
        |  CAST(min(CASE WHEN keep THEN n_tok END) AS BIGINT) AS min_kept_tok,
        |  CAST(max(CASE WHEN keep THEN n_tok END) AS BIGINT) AS max_kept_tok,
        |  CAST(coalesce(sum(CASE WHEN keep THEN n_tok END), 0) AS BIGINT) AS tokens_kept
        |FROM k GROUP BY 1""".stripMargin,
    "q101_unpivot_events" ->
      """WITH w AS (SELECT user_id, event_type AS t, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, 'n_' || t AS event_type, CAST(n AS BIGINT) AS n
        |FROM w WHERE n > 0""".stripMargin,
    "q102_audience_set_ops" ->
      """SELECT 'view_and_buy' AS segment, user_id FROM
        |  (SELECT user_id FROM events WHERE event_type = 'view'
        |   INTERSECT
        |   SELECT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT 'view_no_buy' AS segment, user_id FROM
        |  (SELECT user_id FROM events WHERE event_type = 'view'
        |   EXCEPT
        |   SELECT user_id FROM events WHERE event_type = 'purchase')""".stripMargin,
    "q103_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
        |days AS (SELECT user_id,
        |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d FROM span)
        |SELECT user_id, CAST(d AS VARCHAR) AS day,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events
        |FROM days LEFT JOIN daily USING (user_id, d)""".stripMargin,
    // inner join ⇒ only purchases with >= 1 click appear (by design)
    "q104_range_join_native" ->
      """SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_clicks
        |FROM events p JOIN events k
        |  ON k.event_type = 'click'
        |  AND epoch_us(k.ts) <= epoch_us(p.ts)
        |  AND epoch_us(k.ts) > epoch_us(p.ts) - 3600000000
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1""".stripMargin,
    "q121_proximity_join" ->
      """SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_nearby_clicks
        |FROM events p JOIN events k
        |  ON k.event_type = 'click'
        |  AND abs(epoch_us(p.ts) - epoch_us(k.ts)) <= 300000000
        |WHERE p.event_type = 'error'
        |GROUP BY 1""".stripMargin,
    "q122_left_range_join" ->
      """SELECT p.event_id, CAST(count(k.ts) AS BIGINT) AS n_clicks
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') k
        |  ON epoch_us(k.ts) <= epoch_us(p.ts)
        |  AND epoch_us(k.ts) > epoch_us(p.ts) - 3600000000
        |GROUP BY 1""".stripMargin
  )
}
