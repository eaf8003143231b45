package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.syntax._

/** Corpus-hygiene operators — the cleaning steps a training-data
  * pipeline runs BEFORE dedup/mixing: PII redaction, canonical-form
  * (case/punctuation/whitespace-insensitive) duplicate detection,
  * corpus-health spectra, and exact-substring decontamination. Same
  * discipline as the other batches: codegen'd built-ins only, one
  * key-partitioned shuffle per aggregate, every gated value exact
  * integer / string so the DuckDB oracle matches bit-for-bit.
  *
  * The synthetic corpus carries no real PII/casing variance, so the
  * fixture-dependent operators derive their planted inputs
  * DETERMINISTICALLY inside the query (the q37 synthetic-sky
  * precedent): the oracle replays the same derivation, and the gate
  * pins the OPERATOR's semantics, not the fixture.
  */
object HygieneOps {

  // --------------------------------------------------------------- q112

  /** Conservative patterns shared verbatim by Spark (java.util.regex)
    * and DuckDB (RE2): character classes + bounded quantifiers only, no
    * lookaround, so both engines produce identical matches. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** PII redaction profile — per source: documents touched, match
    * counts per category, and the total redacted length (the integer
    * the gate can pin). Redaction itself is two `regexp_replace`
    * passes (email first — its digits must not be half-eaten by the
    * IP pass; both engines apply the same order). Stateless column
    * math: scan-speed, shuffles only the per-source aggregate. */
  def piiRedactionProfile(docs: DataFrame): DataFrame = {
    val red = regexp_replace(
      regexp_replace($"text", lit(EmailRe), lit("<EMAIL>")),
      lit(Ipv4Re), lit("<IP>"))
    docs
      .select($"source",
        regexp_count($"text", lit(EmailRe)).as("n_em"),
        regexp_count($"text", lit(Ipv4Re)).as("n_ip"),
        length(red).as("red_len"))
      .groupBy($"source")
      .agg(
        count(when($"n_em" + $"n_ip" > 0, 1)).as("n_docs_with_pii"),
        sum($"n_em").cast("long").as("n_emails"),
        sum($"n_ip").cast("long").as("n_ips"),
        sum($"red_len").cast("long").as("redacted_chars"))
  }

  /** Deterministic PII planting: every 4th document gains one email +
    * one IPv4 derived from its id (the corpus itself is digit-free). */
  private def withPlantedPii(docs: DataFrame): DataFrame =
    docs.select($"doc_id", $"source",
      when($"doc_id" % 4 === 0,
        concat($"text", lit(" contact user"), $"doc_id",
          lit("@mail.example.com from 10.0."), $"doc_id" % 256,
          lit("."), ($"doc_id" * 7) % 256))
        .otherwise($"text").as("text"))

  def q112PiiRedaction(s: SparkSession, dir: String): DataFrame =
    piiRedactionProfile(withPlantedPii(load(s, dir, "documents")))

  // --------------------------------------------------------------- q113

  /** Canonical content key: lower → strip non-alphanumeric,
    * non-whitespace chars → collapse WHITESPACE RUNS (not just spaces:
    * deleting a tab would glue its neighbors into a new token and
    * split true whitespace variants) → trim, then md5 so the dedup
    * shuffle carries 16-byte keys instead of document bodies. The
    * whitespace class is EXPLICIT (` \t\n\r\f`), not `\s` — Java's \s
    * includes \x0B where RE2's does not, and a dialect divergence here
    * silently splits the cross-engine gate. Two documents share a key
    * iff they are case/punctuation/whitespace variants of the same
    * text — the normalization layer exact dedup (q17) sits on top of. */
  def canonicalKey(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 \\t\\n\\r\\f]", ""),
      "[ \\t\\n\\r\\f]+", " ")))

  /** Canonical-dedup profile: group count, total docs, largest variant
    * group, and redundant-doc count (Σ (size−1) — what canonical dedup
    * would delete). One hash-key shuffle; group sizes are variant
    * multiplicities, never corpus-sized. */
  def canonicalDedupProfile(docs: DataFrame): DataFrame =
    docs.select(canonicalKey($"text").as("ck"))
      .groupBy($"ck").agg(count(lit(1)).as("sz"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_groups"),
        sum($"sz").as("n_docs"),
        max($"sz").as("max_group"),
        sum($"sz" - 1).as("n_redundant"))

  /** Deterministic variant planting: each document is joined by an
    * uppercased, punctuation-wrapped, whitespace-padded twin — the
    * canonical key must collapse every pair. */
  def q113CanonicalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    canonicalDedupProfile(
      docs.select($"doc_id", $"text").unionByName(
        docs.select(($"doc_id" + 1000000L).as("doc_id"),
          upper(concat(lit("  "), $"text", lit(" !! "))).as("text"))))
  }

  /** Corpus snapshot DIFF — the dataset-versioning operator a managed
    * training corpus needs between releases: given two snapshots keyed
    * by doc_id, per source count the documents added, removed, modified
    * (same id, different content hash) and unchanged. One full outer
    * join on the id, content compared by 8-byte xxhash64 digests so
    * bodies never shuffle twice. Row PRESENCE is tracked by explicit
    * per-side markers, NOT hash nullability — a NULL-text document
    * present on both sides is unchanged, not phantom add+remove — and
    * the hash comparison is null-safe (`<=>`). */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select($"doc_id", $"source".as("src_o"),
      xxhash64($"text").as("h_o"), lit(true).as("in_o"))
    val n = newSnap.select($"doc_id", $"source".as("src_n"),
      xxhash64($"text").as("h_n"), lit(true).as("in_n"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        coalesce($"src_n", $"src_o").as("source"),
        when($"in_o".isNull, lit(1)).otherwise(lit(0)).as("a"),
        when($"in_n".isNull, lit(1)).otherwise(lit(0)).as("r"),
        when($"in_o".isNotNull && $"in_n".isNotNull && !($"h_o" <=> $"h_n"),
          lit(1)).otherwise(lit(0)).as("m"),
        when($"in_o".isNotNull && $"in_n".isNotNull && ($"h_o" <=> $"h_n"),
          lit(1)).otherwise(lit(0)).as("u"))
      .groupBy($"source")
      .agg(
        sum($"a").as("n_added"), sum($"r").as("n_removed"),
        sum($"m").as("n_modified"), sum($"u").as("n_unchanged"))
  }

  /** [[corpusDiff]] through the oracle gate: the "new" snapshot derives
    * deterministically in-query (the q113 synthetic-variant precedent)
    * — ids ≡ 0 mod 7 get edited text, ids ≡ 0 mod 11 (and not mod 7)
    * are removed, and a shifted copy of the first 20 docs arrives as
    * additions — so the DuckDB twin replays the exact same release. */
  def q128CorpusDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val kept = docs.filter($"doc_id" % 11 =!= 0 || $"doc_id" % 7 === 0)
    val newSnap = kept
      .select($"doc_id", $"source",
        when($"doc_id" % 7 === 0, concat($"text", lit(" edited v2")))
          .otherwise($"text").as("text"))
      .unionByName(docs.filter($"doc_id" < 20)
        .select(($"doc_id" + 5000000L).as("doc_id"), $"source", $"text"))
    corpusDiff(docs, newSnap)
  }

  /** Referential-integrity audit across the corpus's tables — the
    * pre-training sanity gate a multimodal pipeline runs before a
    * release: documents without an embedding row, embeddings without a
    * document (orphans from partial deletes), and duplicate ids on
    * either side. Two anti-join counts + two duplicate-key aggregates,
    * all on the pruned id columns — no payloads move. */
  def q130Integrity(s: SparkSession, dir: String): DataFrame = {
    val docIds = load(s, dir, "documents").select($"doc_id")
    val vecIds = load(s, dir, "embeddings").select($"vec_id")
    val docsNoVec = docIds.join(vecIds, $"doc_id" === $"vec_id", "left_anti")
      .groupBy().agg(count(lit(1)).as("n_docs_without_vec"))
    val vecsNoDoc = vecIds.join(docIds, $"doc_id" === $"vec_id", "left_anti")
      .groupBy().agg(count(lit(1)).as("n_vecs_without_doc"))
    // n_docs/n_vecs are ROW counts (sum of per-id multiplicities), not
    // distinct-id counts — on the duplicated data this audit exists to
    // catch, the corpus size must not silently shrink to the id count
    val dupDocs = docIds.groupBy($"doc_id").agg(count(lit(1)).as("c"))
      .groupBy().agg(
        sum($"c").as("n_docs"),
        count(when($"c" > 1, lit(1))).as("n_dup_doc_ids"))
    val dupVecs = vecIds.groupBy($"vec_id").agg(count(lit(1)).as("c"))
      .groupBy().agg(
        sum($"c").as("n_vecs"),
        count(when($"c" > 1, lit(1))).as("n_dup_vec_ids"))
    dupDocs.crossJoin(dupVecs).crossJoin(docsNoVec).crossJoin(vecsNoDoc)
  }

  // --------------------------------------------------------------- q114

  /** Shingle document-frequency spectrum — the corpus-health histogram
    * behind cap tuning (q64's maxDf, q23's band sizing): for each df
    * value, how many distinct shingles carry it and how many postings
    * they contribute. Σdf² per bucket is exactly the pair-join cost the
    * dedup guards bound, so this IS the operator that tells an operator
    * where the hot tail starts. Two aggregates on the shingle key
    * (posting count ≈ corpus tokens, spectrum rows ≈ distinct df
    * values — tiny); no joins, no pairs. */
  def shingleDfSpectrum(docs: DataFrame): DataFrame =
    docs.select($"doc_id", explode(TextOps.shingles($"text")).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("df"))
      .groupBy($"df").agg(count(lit(1)).as("n_shingles"))
      .select($"df", $"n_shingles",
        ($"df" * $"n_shingles").as("n_postings"))

  def q114DfSpectrum(s: SparkSession, dir: String): DataFrame =
    shingleDfSpectrum(load(s, dir, "documents"))

  // --------------------------------------------------------------- q115

  /** Vocabulary head coverage: the cumulative corpus share (ppm) of the
    * top-k tokens by frequency — the Zipf-head measure behind stopword
    * lists and tokenizer-vocab budgeting. The window runs over the
    * VOCABULARY-sized count table (a partitionless sort of distinct
    * tokens, not the corpus — documented single-partition stage,
    * bounded by |vocab|); the corpus itself is touched once by the
    * count aggregate. Total order (cnt desc, token) + ROWS frame makes
    * the cumulative sum engine-exact. */
  def tokenHeadCoverage(docs: DataFrame, ks: Seq[Int]): DataFrame = {
    val counts = docs.select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy().agg(sum($"cnt").as("total"))
    val ord = Window.orderBy($"cnt".desc, $"w")
    counts
      .withColumn("k", row_number().over(ord))
      .withColumn("cum_tokens",
        sum($"cnt").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter($"k".isin(ks: _*))
      .crossJoin(broadcast(tot))
      .select($"k".cast("long").as("k"), $"cum_tokens",
        expr("(cum_tokens * 1000000) div total").as("cum_ppm"))
  }

  def q115HeadCoverage(s: SparkSession, dir: String): DataFrame =
    tokenHeadCoverage(load(s, dir, "documents"), Seq(1, 5, 25))

  // --------------------------------------------------------------- q116

  /** Exact-substring decontamination — the verbatim complement of the
    * shingle-overlap gates (q55/q67): a document is contaminated iff a
    * benchmark PHRASE occurs in it verbatim (`contains`), catching
    * short quoted answers whose shingle overlap stays under the q55
    * threshold. The phrase list broadcasts (benchmarks are small by
    * construction); the corpus is scanned once with a codegen contains
    * per (doc, phrase) — no shuffle until the per-source count. For
    * benchmark suites too large to broadcast, the q67 Bloom route
    * applies to phrase hashes first. */
  def substringDecon(corpus: DataFrame, phrases: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(phrases))
      .filter(contains($"text", $"p"))
      .select($"doc_id", $"source").distinct()
      .groupBy($"source").agg(count(lit(1)).as("n_contaminated"))

  /** Benchmark = the q55 split (doc_id < 10), phrases = each benchmark
    * document's first 3 tokens. */
  def q116SubstringDecon(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val phrases = docs.filter($"doc_id" < 10)
      .select(concat_ws(" ", slice(split($"text", " "), 1, 3)).as("p"))
      .distinct()
    substringDecon(docs.filter($"doc_id" >= 10), phrases)
  }

  // --------------------------------------------------------------- q136

  /** SEGMENT-level corpus dedup — the C4/"line-level" discipline
    * adapted to a corpus whose documents carry no newlines: the text is
    * cut into aligned `segWords`-word segments, a segment CONTENT is
    * kept only at its globally FIRST occurrence (lowest (doc_id, pos) —
    * deterministic, engine-portable), every other occurrence is
    * dropped, and each document is reassembled from its surviving
    * segments in order. This removes cross-document boilerplate at a
    * granularity document-level dedup (q17/q23) never sees, without
    * the all-pairs cost of substring matching: ONE shuffle keyed by
    * segment content (row_number per segment group — the q17
    * hash-groupBy discipline; at petabyte scale the shuffle key can be
    * xxhash64(seg) with the content carried for collision verify), then
    * one per-document regroup. Output: (doc_id, text_kept, n_seg,
    * n_dropped) for EVERY document — a fully-dropped document stays as
    * an empty-text row (the caller decides whether to cull it), never a
    * silent disappearance. */
  def segmentDedup(docs: DataFrame, segWords: Int): DataFrame = {
    require(segWords >= 1, s"segWords must be >= 1, got $segWords")
    val segs = docs
      .select($"doc_id", split($"text", " ").as("tk"))
      .select($"doc_id", posexplode(
        transform(
          sequence(lit(0),
            floor((size($"tk") - 1) / lit(segWords)).cast("int")),
          s => array_join(slice($"tk", s * segWords + 1, lit(segWords)), " ")))
        .as(Seq("pos", "seg")))
    val w = Window.partitionBy($"seg").orderBy($"doc_id", $"pos")
    segs
      .withColumn("rn", row_number().over(w))
      .groupBy($"doc_id")
      .agg(
        // collect_list skips the non-kept (null) entries; array_sort on
        // (pos, seg) structs restores document order before the join
        concat_ws(" ", transform(
          array_sort(collect_list(when($"rn" === 1, struct($"pos", $"seg")))),
          x => x.getField("seg"))).as("text_kept"),
        count(lit(1)).cast("long").as("n_seg"),
        sum(when($"rn" > 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** [[segmentDedup]] through the oracle gate: width 4 on the synthetic
    * corpus plants enough cross-document 4-grams to exercise drops
    * (~430 at sf0.01) while leaving most text intact; the gate pins the
    * 20 lowest-id documents that LOST at least one segment — kept text
    * (the reassembly is the hard part), segment count, drop count. */
  def q136SegmentDedup(s: SparkSession, dir: String): DataFrame =
    segmentDedup(load(s, dir, "documents"), 4)
      .filter($"n_dropped" > 0)
      .orderBy($"doc_id")
      .limit(20)

  /** CDC-boundary segment dedup — [[segmentDedup]]'s first-occurrence
    * discipline over CONTENT-DEFINED chunk boundaries (the q87 rule: a
    * token OPENS a chunk iff md5(token) starts with nibble '0'), which
    * makes the dedup SHIFT-RESISTANT: an insertion re-chunks one
    * neighborhood instead of shifting every downstream fixed-width
    * window, so shared runs between edited variants still dedup — the
    * reason CDC chunking exists. Same survival law (a chunk content
    * survives only at its globally first (doc_id, chunk)), same
    * in-order reassembly, same empty-doc preservation; one shuffle
    * keyed by chunk content + one per-doc regroup, no pairs. */
  def cdcSegmentDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks = docs
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .withColumn("chunk", sum(when(substring(md5($"w"), 1, 1) === "0", 1L)
        .otherwise(0L)).over(w))
      .groupBy($"doc_id", $"chunk")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct($"pos", $"w"))), x => x.getField("w")))
        .as("ctext"))
    val fo = Window.partitionBy($"ctext").orderBy($"doc_id", $"chunk")
    chunks
      .withColumn("rn", row_number().over(fo))
      .groupBy($"doc_id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when($"rn" === 1, struct($"chunk", $"ctext")))),
          x => x.getField("ctext"))).as("text_kept"),
        count(lit(1)).cast("long").as("n_chunks"),
        sum(when($"rn" > 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** [[cdcSegmentDedup]] through the oracle gate: the 20 lowest-id
    * documents that lost a chunk (305 docs lose one at sf0.01 — the
    * synthetic near-dups share content-defined runs), reassembled text
    * pinned exactly. */
  def q142CdcSegmentDedup(s: SparkSession, dir: String): DataFrame =
    cdcSegmentDedup(load(s, dir, "documents"))
      .filter($"n_dropped" > 0)
      .orderBy($"doc_id")
      .limit(20)

  /** Snapshot MERGE — apply a release change set (upserts + deletes) to
    * a corpus snapshot: deleted ids drop, upserted ids replace their
    * old row exactly once (or add, when the id is new), everything else
    * carries through untouched. At 100 TB the change set is
    * release-sized, so BOTH the delete anti-join and the replace
    * anti-join broadcast — the corpus is never shuffled; the merge is
    * two map-side joins and a union. */
  def mergeChangeSet(
      old: DataFrame, upserts: DataFrame, deletes: DataFrame): DataFrame =
    old.join(deletes.select($"doc_id"), Seq("doc_id"), "left_anti")
      .join(upserts.select($"doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(upserts)

  /** [[mergeChangeSet]] gated THROUGH [[corpusDiff]]: the change set is
    * q128's derived release (edits at id ≡ 0 mod 7, deletes at id ≡ 0
    * mod 11 and not mod 7, shifted adds), so `diff(old, merge(old,
    * changes))` must reproduce q128's per-source add/remove/modify/
    * unchanged counts exactly — the q133 pattern: same twin, the engine
    * path routed through the operator under test. */
  def q143SnapshotMerge(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents").select($"doc_id", $"source", $"text")
    val upserts = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id", $"source", concat($"text", lit(" edited v2")).as("text"))
      .unionByName(docs.filter($"doc_id" < 20)
        .select(($"doc_id" + 5000000L).as("doc_id"), $"source", $"text"))
    val deletes = docs
      .filter($"doc_id" % 11 === 0 && $"doc_id" % 7 =!= 0).select($"doc_id")
    corpusDiff(docs, mergeChangeSet(docs, upserts, deletes))
  }

  // --------------------------------------------------------------- q137

  /** NEAR-dup decontamination — the MinHash-LSH complement of the exact
    * (q55), Bloom (q67) and substring (q116) gates: a corpus document
    * is contaminated iff its true shingle-Jaccard against ANY benchmark
    * document reaches `threshold`, catching paraphrase-level leakage
    * the verbatim gates miss. The eval side is benchmark-sized by
    * construction, so BOTH its LSH bands and its shingle sets
    * broadcast: the corpus is signed once ([[TextOps.signatureFrame]]),
    * band-probed against the broadcast eval bands (no corpus shuffle
    * beyond the signature aggregate), and candidates verify by EXACT
    * Jaccard through the sorted merge-walk intersect — the oracle
    * replays the exact math, so LSH recall at the gated threshold is
    * pinned cross-engine (the q23 premise). Output: one row per
    * contaminated doc with its best-matching eval doc (max Jaccard,
    * min eval_id tie-break) and the integer Jaccard permille. */
  def nearDupDecontaminate(
      corpus: DataFrame, evalSet: DataFrame, threshold: Double): DataFrame = {
    import graft.plans.VectorExpressions.sorted_intersect_count
    val cSigs = TextOps.signatureFrame(corpus)
    val eSigs = TextOps.signatureFrame(evalSet)
    val cand = TextOps.bandFrame(cSigs)
      .select($"doc_id", $"band", $"bkey")
      .join(broadcast(TextOps.bandFrame(eSigs)
        .select($"doc_id".as("eval_id"), $"band", $"bkey")),
        Seq("band", "bkey"))
      .select($"doc_id", $"eval_id").distinct()
    val verified = cand
      .join(cSigs.select($"doc_id", $"sh_set".as("sh_c")), "doc_id")
      .join(broadcast(eSigs.select($"doc_id".as("eval_id"),
        $"sh_set".as("sh_e"))), "eval_id")
      .select($"doc_id", $"eval_id",
        sorted_intersect_count($"sh_c", $"sh_e").as("inter"),
        (size($"sh_c") + size($"sh_e")).as("tot"))
      .filter($"inter".cast("double") / ($"tot" - $"inter") >= threshold)
      .select($"doc_id", $"eval_id",
        expr("(inter * 1000) div (tot - inter)").cast("long").as("jac_permille"))
    // best match per doc through the native grouped top-k (rank column
    // dropped from the projection — the TopKPerKey firing condition)
    val w = Window.partitionBy($"doc_id")
      .orderBy($"jac_permille".desc, $"eval_id")
    verified.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"doc_id", $"eval_id", $"jac_permille")
  }

  /** [[nearDupDecontaminate]] through the oracle gate: eval = every
    * 10th document (6 planted near-dup crossings at sf0.01, 10 at
    * sf0.001), threshold 0.8 — the q23-verified LSH recall point. */
  def q137NearDupDecon(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    nearDupDecontaminate(
      docs.filter($"doc_id" % 10 =!= 0),
      docs.filter($"doc_id" % 10 === 0), 0.8)
  }

  /** CONTAMINATION ATTRIBUTION — the audit the aggregate decon gates
    * (q55/q67/q116/q137) don't answer: for each benchmark document,
    * WHICH corpus document overlaps it most (distinct shared word-
    * 3-grams, ties to the lowest doc id), so a contamination report
    * names the offending training rows instead of a per-source count.
    *
    * Plan: the benchmark side is benchmark-sized → its shingle set
    * BROADCASTS; the corpus explodes shingles map-side and only the
    * (bench, train) hit pairs shuffle. The per-benchmark top-1 goes
    * through the `row_number ≤ k, rank dropped` shape the native
    * grouped top-k rewrite ([[graft.plans.TopKPerKey]]) compiles to a
    * single-pass bounded heap — corpus-scan once, heap per bench doc. */
  def q141ContaminationAttribution(s: SparkSession, dir: String): DataFrame = {
    val sh = load(s, dir, "documents")
      .select($"doc_id", explode(TextOps.shingles($"text")).as("g"))
    val bench = sh.filter($"doc_id" < 10).select($"doc_id".as("bench_id"), $"g")
    val corpus = sh.filter($"doc_id" >= 10).select($"doc_id".as("train_id"), $"g")
    // shingles() dedups per doc, so plain count == distinct overlap
    val hits = corpus.join(broadcast(bench), "g")
      .groupBy($"bench_id", $"train_id")
      .agg(count(lit(1)).as("n_overlap"))
    val w = Window.partitionBy($"bench_id")
      .orderBy($"n_overlap".desc, $"train_id")
    hits.withColumn("rk", row_number().over(w)).filter($"rk" <= 1)
      .select($"bench_id", $"train_id", $"n_overlap")
  }

  // ---------------------------------------------------------------- q171

  /** Small-cell suppression — the k-anonymity release rule for
    * published corpus statistics: an aggregate cell describing fewer
    * than k documents can identify its members, so released per-(source,
    * lang) stats suppress every cell with n_docs < k by rolling it into
    * the source's `__suppressed__` residual. The residual CONSERVES
    * mass (its counts are the sum of the suppressed cells' — the q64
    * refuse-or-account rule applied to a privacy gate: nothing is
    * silently dropped, nothing under-k is released), and `n_cells`
    * records how many raw cells each released row aggregates, so
    * auditors can see exactly how much the release coarsened.
    *
    * SCALE: one map-side-combinable aggregate over (source, lang) —
    * cell-domain-sized output — then a re-aggregation of ONLY the
    * suppressed cells (≤ cells rows, corpus-size-free). The corpus is
    * read once; the suppression decision never touches it again. The
    * residual row itself may describe < k documents in total; it is
    * not a released CELL (its label names no lang), which is the
    * standard small-cell-suppression contract. */
  def kAnonRelease(docs: DataFrame, k: Long): DataFrame = {
    val cells = docs
      .select($"source", $"lang", size(split($"text", " ")).cast("long").as("tk"))
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"tk").as("n_tokens"))
    val released = cells.filter($"n_docs" >= k)
      .select($"source", $"lang", $"n_docs", $"n_tokens", lit(1L).as("n_cells"))
    val residual = cells.filter($"n_docs" < k)
      .groupBy($"source")
      .agg(sum($"n_docs").as("n_docs"), sum($"n_tokens").as("n_tokens"),
        count(lit(1)).as("n_cells"))
      .select($"source", lit("__suppressed__").as("lang"),
        $"n_docs", $"n_tokens", $"n_cells")
    released.unionByName(residual)
  }

  def q171KAnonRelease(s: SparkSession, dir: String, k: Long = 5L): DataFrame =
    kAnonRelease(load(s, dir, "documents"), k)

  // ---------------------------------------------------------------- q224

  /** Order-independent table checksum — the migration-verification
    * primitive: after a rewrite (compaction q174, Z-order q154,
    * backfill q219, engine migration), prove content equality without
    * sorting or joining either copy. Each row contributes a 60-bit key
    * derived from md5 of its content (15 hex chars → exact BIGINT on
    * both engines); two independent folds make collisions practically
    * impossible to engineer by accident: `bit_xor` (order-free,
    * self-inverse — detects any odd multiset difference) and a sum of
    * key mod 1e9+7 (detects the even/duplicate differences XOR is
    * blind to). Long bound: n_rows · 1e9 per group — safe to ~9·10⁹
    * rows per key; the xor fold never overflows.
    *
    * SCALE: one map-side-combinable aggregate pass, 3 longs per group
    * out. Comparing two 100 TB copies costs two independent scans and
    * a groups-sized diff — no shuffle joins anything. */
  def tableChecksum(df: DataFrame, keyCol: Column,
      contentCol: Column): DataFrame =
    df.select(keyCol.as("k"),
        conv(substring(md5(contentCol), 1, 15), 16, 10)
          .cast("long").as("rk"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(rk)").as("xor_fold"),
        sum($"rk" % 1000000007L).as("sum_fold"))

  def q224TableChecksum(s: SparkSession, dir: String): DataFrame =
    tableChecksum(load(s, dir, "documents"), $"source",
      concat_ws("|", $"doc_id", $"text", $"lang"))
      .select($"k".as("source"), $"n_rows", $"xor_fold", $"sum_fold")

  // ---------------------------------------------------------------- q239

  /** Declarative data-contract audit: evaluate a list of named
    * constraints — row predicates and referential checks — and emit
    * one accounting row each (rows checked, violations), never
    * filtering anything: the contract gate REPORTS, the caller decides
    * (the q179 flag-never-drop discipline promoted to a framework).
    * Row predicates are one map-combinable conditional count per
    * table scan; referential checks are left-anti joins (broadcast
    * when the referenced keyset is dim-sized). This is the
    * Deequ/Great-Expectations core re-expressed as plain aggregates. */
  def constraintCounts(df: DataFrame, name: String,
      violation: Column): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        sum(when(violation, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), $"n_rows", $"n_violations")

  def referentialViolations(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column, name: String): DataFrame = {
    val misses = fact.join(broadcast(dim.select(dimKey.as("__k"))),
        factKey === $"__k", "left_anti")
    fact.agg(count(lit(1)).as("n_rows"))
      .crossJoin(misses.agg(count(lit(1)).as("n_violations")))
      .select(lit(name).as("check_name"), $"n_rows", $"n_violations")
  }

  /** q239 — the contract audit over the star schema: price positivity,
    * order-date window, event-value range, and two referential checks
    * (orders→customer, customer→nation). All pass on the healthy
    * corpus — zero violations IS the assertion; the spec plants
    * breakage to prove the counts move. */
  def q239ConstraintAudit(s: SparkSession, dir: String): DataFrame = {
    val orders = load(s, dir, "orders")
    val cust = load(s, dir, "customer")
    val nation = load(s, dir, "nation")
    val ev = load(s, dir, "events")
    constraintCounts(orders, "orders_price_positive", $"o_totalprice" <= 0)
      .unionByName(constraintCounts(ev, "events_value_range",
        $"value" < 0 || $"value" > 1000000))
      .unionByName(constraintCounts(orders, "orders_key_not_null",
        $"o_orderkey".isNull))
      .unionByName(referentialViolations(orders, $"o_custkey",
        cust, $"c_custkey", "orders_customer_fk"))
      .unionByName(referentialViolations(cust, $"c_nationkey",
        nation, $"n_nationkey", "customer_nation_fk"))
  }

  // ---------------------------------------------------------------- q247

  /** q247 — right-to-be-forgotten propagation: delete every trace of a
    * user set across the fact tables and ACCOUNT the deletion — per
    * table, rows before / removed / after with conservation (before =
    * removed + after), plus a residue check folded into the gated row.
    * n_residue = n_matched − n_removed, where n_matched is counted by
    * an INDEPENDENT semi-join scan against the forget set and
    * n_removed falls out of the anti-join that produced the kept
    * frame: the two joins derive the same partition of the table from
    * different plans, so an anti-join that leaks (keeps a row whose
    * key matches — e.g. a null-semantics divergence) yields residue
    * > 0 and an over-delete yields residue < 0; the gate hashes it, so
    * either failure mode breaks the green row. (A semi-join against
    * the just-anti-joined frame would be 0 by construction — that is
    * the tautology this accounting deliberately avoids.)
    * The compliance op every data platform needs: deletion is an
    * anti-join per table (broadcast when the forget-set is
    * request-sized, as it always is), accounting is one aggregate per
    * table, and nothing about it is corpus-shaped. */
  def forgetUsers(tables: Seq[(String, DataFrame, Column)],
      forget: DataFrame): DataFrame = {
    val f = broadcast(forget.select($"fid"))
    tables.map { case (name, df, keyCol) =>
      val kept = df.join(f, keyCol === $"fid", "left_anti")
      val before = df.count()
      val after = kept.count()
      val matched = df.join(f, keyCol === $"fid", "left_semi").count()
      forget.sparkSession.range(1).select(
        lit(name).as("table_name"), lit(before).as("n_before"),
        lit(before - after).as("n_removed"), lit(after).as("n_after"),
        lit(matched - (before - after)).as("n_residue"))
    }.reduce(_ unionByName _)
  }

  def q247ForgetUsers(s: SparkSession, dir: String): DataFrame = {
    val forget = load(s, dir, "events").select($"user_id").distinct()
      .filter($"user_id" % 9 === 0L).select($"user_id".as("fid"))
    forgetUsers(Seq(
      ("events", load(s, dir, "events"), $"user_id"),
      ("orders", load(s, dir, "orders"), $"o_custkey"),
      ("customer", load(s, dir, "customer"), $"c_custkey")), forget)
  }

  // ---------------------------------------------------------------- q248

  /** q248 — deterministic pseudonymization: replace the user key with
    * an md5-derived pseudonym CONSISTENTLY across tables, so joins
    * still work but the raw identifier never leaves the boundary (the
    * GDPR-pseudonymization contract: same input → same token, token →
    * input infeasible). The gate proves REFERENTIAL PRESERVATION, the
    * property that makes pseudonymized exports analytically useful:
    * the (events ⋈ orders on user key) group sizes are IDENTICAL
    * before and after tokenization — computed entirely in the
    * pseudonym domain on the Spark side and replayed by the oracle
    * with the same md5 derivation. Tokenization is a per-row codegen'd
    * expression: no lookup table to secure, no shuffle. */
  def pseudonymize(c: Column): Column = md5(concat(lit("u|"), c))

  def q248Pseudonymize(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(pseudonymize($"user_id").as("token"))
    val ord = load(s, dir, "orders")
      .select(pseudonymize($"o_custkey").as("token"))
    ev.groupBy($"token").agg(count(lit(1)).as("n_events"))
      .join(ord.groupBy($"token").agg(count(lit(1)).as("n_orders")), "token")
  }

  // ---------------------------------------------------------------- q179

  /** Corrupt-record quarantine — the ingest-robustness discipline for
    * semi-structured columns: parse with `from_json`, never drop. Every
    * row gets a validity flag (struct parsed AND the required field
    * present); consumers read the valid slice, auditors read the
    * quarantine counts, and conservation (n_valid + n_quarantined =
    * n_events) is part of the gated result — a malformed record can
    * never silently vanish (the q64 refuse-or-account rule at the parse
    * boundary). Pure per-row compute inside whole-stage codegen; the
    * only shuffle is the accounting aggregate. */
  def jsonFlagged(df: DataFrame, jsonCol: Column, ddl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    // PERMISSIVE from_json yields a struct of NULL FIELDS for malformed
    // input, not a null struct — validity must check the fields
    val fieldsPresent = schema.fieldNames
      .map(f => $"__parsed".getField(f).isNotNull).reduce(_ && _)
    df.withColumn("__parsed", from_json(jsonCol, schema))
      .withColumn("is_valid", $"__parsed".isNotNull && fieldsPresent)
  }

  /** q179 — quarantine accounting over the event props with corruption
    * PLANTED deterministically (every 7th event's JSON gets a leading
    * '{', malformed from byte 0 on both engines — the fixture-derivation
    * rule, since the synthetic corpus carries no real corruption). */
  def q179JsonQuarantine(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .withColumn("p", when($"event_id" % 7 === 0,
        concat(lit("{"), $"props")).otherwise($"props"))
    jsonFlagged(ev, $"p", "k INT")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when($"is_valid", 1L).otherwise(0L)).as("n_valid"),
        sum(when(!$"is_valid", 1L).otherwise(0L)).as("n_quarantined"),
        sum(when($"is_valid", $"__parsed".getField("k").cast("long"))
          .otherwise(0L)).as("sum_k"))
  }

  // ------------------------------------------------------------ oracles

  val oracles: Map[String, String] = Map(
    // q179: replay the planted corruption and the validity rule —
    // conservation is IN the gated columns, so silent drops can't pass
    "q179_json_quarantine" ->
      """WITH e AS (SELECT event_type,
        |    CASE WHEN event_id % 7 = 0 THEN '{' || props ELSE props END AS p
        |  FROM events),
        |f AS (SELECT event_type,
        |    CASE WHEN json_valid(p)
        |      AND json_extract(p, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS ok,
        |    CASE WHEN json_valid(p)
        |      THEN CAST(json_extract_string(p, '$.k') AS BIGINT)
        |      ELSE 0 END AS k
        |  FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(ok) AS BIGINT) AS n_valid,
        |  CAST(count(*) - sum(ok) AS BIGINT) AS n_quarantined,
        |  CAST(sum(CASE WHEN ok = 1 THEN k ELSE 0 END) AS BIGINT) AS sum_k
        |FROM f GROUP BY 1""".stripMargin,
    // q171: replay the cell aggregate, the k split, and the residual
    // roll-up — hash equality pins released cells AND conserved
    // suppressed mass
    "q171_kanon_release" ->
      """WITH cells AS (SELECT source, lang,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, lang, n_docs, n_tokens, CAST(1 AS BIGINT) AS n_cells
        |FROM cells WHERE n_docs >= 5
        |UNION ALL
        |SELECT source, '__suppressed__' AS lang,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_cells
        |FROM cells WHERE n_docs < 5 GROUP BY 1""".stripMargin,
    "q141_contamination_attribution" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(tk) >= 3
        |    THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
        |    ELSE [array_to_string(tk, ' ')] END AS s FROM t),
        |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |b AS (SELECT doc_id AS bench_id, g FROM e WHERE doc_id < 10),
        |c AS (SELECT doc_id AS train_id, g FROM e WHERE doc_id >= 10),
        |h AS (SELECT bench_id, train_id, count(*) AS n_overlap
        |  FROM c JOIN b USING (g) GROUP BY 1,2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY bench_id
        |    ORDER BY n_overlap DESC, train_id) AS rk FROM h)
        |SELECT bench_id, train_id, CAST(n_overlap AS BIGINT) AS n_overlap
        |FROM r WHERE rk = 1""".stripMargin,
    "q112_pii_redaction" ->
      """WITH t AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 4 = 0 THEN text || ' contact user' ||
        |    CAST(doc_id AS VARCHAR) || '@mail.example.com from 10.0.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        |  ELSE text END AS text FROM documents),
        |p AS (SELECT source,
        |  len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_em,
        |  len(regexp_extract_all(text, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS n_ip,
        |  length(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')) AS red_len
        |  FROM t)
        |SELECT source,
        |  CAST(count(CASE WHEN n_em + n_ip > 0 THEN 1 END) AS BIGINT) AS n_docs_with_pii,
        |  CAST(sum(n_em) AS BIGINT) AS n_emails,
        |  CAST(sum(n_ip) AS BIGINT) AS n_ips,
        |  CAST(sum(red_len) AS BIGINT) AS redacted_chars
        |FROM p GROUP BY 1""".stripMargin,
    "q113_canonical_dedup" ->
      """WITH v AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, upper('  ' || text || ' !! ') FROM documents),
        |k AS (SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |  '[^a-z0-9 \t\n\r\f]', '', 'g'), '[ \t\n\r\f]+', ' ', 'g'))) AS ck FROM v),
        |g AS (SELECT ck, count(*) AS sz FROM k GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(sz) AS BIGINT) AS n_docs,
        |  CAST(max(sz) AS BIGINT) AS max_group,
        |  CAST(sum(sz - 1) AS BIGINT) AS n_redundant
        |FROM g""".stripMargin,
    // q247: per-table before/removed/after replay; residue is 0 by the
    // anti-join's definition — hashed so a leaky propagation can't pass
    "q247_forget_users" ->
      """WITH f AS (SELECT DISTINCT user_id AS fid FROM events
        |  WHERE user_id % 9 = 0)
        |SELECT 'events' AS table_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_before,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |    WHERE user_id IN (SELECT fid FROM f)) AS n_removed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |    WHERE user_id NOT IN (SELECT fid FROM f)) AS n_after,
        |  CAST(0 AS BIGINT) AS n_residue
        |UNION ALL SELECT 'orders',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |    WHERE o_custkey IN (SELECT fid FROM f)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |    WHERE o_custkey NOT IN (SELECT fid FROM f)),
        |  CAST(0 AS BIGINT)
        |UNION ALL SELECT 'customer',
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer),
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |    WHERE c_custkey IN (SELECT fid FROM f)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |    WHERE c_custkey NOT IN (SELECT fid FROM f)),
        |  CAST(0 AS BIGINT)""".stripMargin,
    // q248: the same md5 derivation on both sides — group sizes in the
    // pseudonym domain prove referential preservation
    "q248_pseudonymize" ->
      """WITH e AS (SELECT md5('u|' || user_id) AS token,
        |    CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1),
        |o AS (SELECT md5('u|' || o_custkey) AS token,
        |    CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1)
        |SELECT e.token, n_events, n_orders
        |FROM e JOIN o ON e.token = o.token""".stripMargin,
    // q239: each constraint replayed as its own aggregate
    "q239_constraint_audit" ->
      """SELECT 'orders_price_positive' AS check_name,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violations FROM orders
        |UNION ALL SELECT 'events_value_range', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN value < 0 OR value > 1000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) FROM events
        |UNION ALL SELECT 'orders_key_not_null', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |UNION ALL SELECT 'orders_customer_fk',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL SELECT 'customer_nation_fk',
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer),
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))""".stripMargin,
    // q224: 60-bit md5-derived row keys, xor + mod-sum folds — both
    // engines parse the same 15 hex chars into the same BIGINT
    "q224_table_checksum" ->
      """WITH k AS (SELECT source,
        |    CAST(concat('0x', substring(md5(
        |      concat_ws('|', doc_id, text, lang)), 1, 15)) AS BIGINT) AS rk
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(rk) AS xor_fold,
        |  CAST(sum(rk % 1000000007) AS BIGINT) AS sum_fold
        |FROM k GROUP BY 1""".stripMargin,
    "q130_integrity" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |v AS (SELECT vec_id FROM embeddings)
        |SELECT
        |  CAST((SELECT count(*) FROM d) AS BIGINT) AS n_docs,
        |  CAST((SELECT count(*) FROM (SELECT doc_id FROM d
        |    GROUP BY 1 HAVING count(*) > 1)) AS BIGINT) AS n_dup_doc_ids,
        |  CAST((SELECT count(*) FROM v) AS BIGINT) AS n_vecs,
        |  CAST((SELECT count(*) FROM (SELECT vec_id FROM v
        |    GROUP BY 1 HAVING count(*) > 1)) AS BIGINT) AS n_dup_vec_ids,
        |  CAST((SELECT count(*) FROM d WHERE NOT EXISTS
        |    (SELECT 1 FROM v WHERE v.vec_id = d.doc_id)) AS BIGINT)
        |    AS n_docs_without_vec,
        |  CAST((SELECT count(*) FROM v WHERE NOT EXISTS
        |    (SELECT 1 FROM d WHERE d.doc_id = v.vec_id)) AS BIGINT)
        |    AS n_vecs_without_doc""".stripMargin,
    // presence via explicit per-side markers (the corpusDiff contract —
    // hash nullability would misread NULL-text rows as add+remove)
    "q142_cdc_segment_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |tok AS (SELECT doc_id, unnest(ts) AS w,
        |  unnest(list_transform(ts, (x,i) -> i)) AS pos FROM t),
        |ck AS (SELECT doc_id, w, pos,
        |  sum(CASE WHEN substr(md5(w),1,1) = '0' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS chunk FROM tok),
        |chunks AS (SELECT doc_id, chunk,
        |  string_agg(w, ' ' ORDER BY pos) AS ctext FROM ck GROUP BY 1,2),
        |fo AS (SELECT doc_id, chunk, ctext, row_number() OVER (
        |  PARTITION BY ctext ORDER BY doc_id, chunk) AS rn FROM chunks),
        |agg AS (SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN ctext END,
        |    ' ' ORDER BY chunk), '') AS text_kept,
        |  count(*) AS n_chunks,
        |  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dropped
        |  FROM fo GROUP BY 1)
        |SELECT doc_id, text_kept, CAST(n_chunks AS BIGINT) AS n_chunks,
        |  CAST(n_dropped AS BIGINT) AS n_dropped
        |FROM agg WHERE n_dropped > 0 ORDER BY doc_id LIMIT 20""".stripMargin,
    "q143_snapshot_merge" ->
      """WITH o AS (SELECT doc_id, source, md5(text) AS h, 1 AS p
        |  FROM documents),
        |kept AS (SELECT * FROM documents
        |  WHERE doc_id % 11 != 0 OR doc_id % 7 = 0),
        |n AS (SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' edited v2'
        |      ELSE text END) AS h, 1 AS p FROM kept
        |  UNION ALL SELECT doc_id + 5000000, source, md5(text), 1
        |  FROM documents WHERE doc_id < 20),
        |j AS (SELECT coalesce(n.source, o.source) AS source,
        |  o.h AS h_o, n.h AS h_n, o.p AS p_o, n.p AS p_n
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT source,
        |  CAST(sum(CASE WHEN p_o IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(sum(CASE WHEN p_n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(sum(CASE WHEN p_o IS NOT NULL AND p_n IS NOT NULL
        |    AND h_o IS DISTINCT FROM h_n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_modified,
        |  CAST(sum(CASE WHEN p_o IS NOT NULL AND p_n IS NOT NULL
        |    AND h_o IS NOT DISTINCT FROM h_n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unchanged
        |FROM j GROUP BY 1""".stripMargin,
    // NOTE the CASE yields a LIST in one CTE and the unnest runs in the
    // NEXT one (the q51/q23 oracle pattern): an unnest INSIDE a CASE
    // branch gets hoisted by DuckDB, so a document with an empty
    // generated shingle list (< 3 tokens) would vanish from the oracle
    // entirely and its ELSE whole-text shingle would never emit.
    "q128_corpus_diff" ->
      """WITH o AS (SELECT doc_id, source, md5(text) AS h, 1 AS p
        |  FROM documents),
        |kept AS (SELECT * FROM documents
        |  WHERE doc_id % 11 != 0 OR doc_id % 7 = 0),
        |n AS (SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' edited v2'
        |      ELSE text END) AS h, 1 AS p FROM kept
        |  UNION ALL SELECT doc_id + 5000000, source, md5(text), 1
        |  FROM documents WHERE doc_id < 20),
        |j AS (SELECT coalesce(n.source, o.source) AS source,
        |  o.h AS h_o, n.h AS h_n, o.p AS p_o, n.p AS p_n
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT source,
        |  CAST(sum(CASE WHEN p_o IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(sum(CASE WHEN p_n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(sum(CASE WHEN p_o IS NOT NULL AND p_n IS NOT NULL
        |    AND h_o IS DISTINCT FROM h_n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_modified,
        |  CAST(sum(CASE WHEN p_o IS NOT NULL AND p_n IS NOT NULL
        |    AND h_o IS NOT DISTINCT FROM h_n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unchanged
        |FROM j GROUP BY 1""".stripMargin,
    // NOTE the CASE yields a LIST in one CTE and the unnest runs in the
    // NEXT one (the q51/q23 oracle pattern): an unnest INSIDE a CASE
    // branch gets hoisted by DuckDB, so a document with an empty
    // generated shingle list (< 3 tokens) would vanish from the oracle
    // entirely and its ELSE whole-text shingle would never emit.
    "q114_df_spectrum" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ts) >= 3
        |    THEN list_transform(generate_series(1, len(ts)-2),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
        |    ELSE [array_to_string(ts, ' ')] END AS s FROM t),
        |g AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh),
        |d AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1)
        |SELECT df, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(df * count(*) AS BIGINT) AS n_postings
        |FROM d GROUP BY 1""".stripMargin,
    "q115_head_coverage" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS k,
        |  sum(cnt) OVER (ORDER BY cnt DESC, w
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c),
        |t AS (SELECT sum(cnt) AS total FROM c)
        |SELECT CAST(k AS BIGINT) AS k, CAST(cum AS BIGINT) AS cum_tokens,
        |  CAST(cum * 1000000 // total AS BIGINT) AS cum_ppm
        |FROM r, t WHERE k IN (1, 5, 25)""".stripMargin,
    // the rn=1 keep rule runs over the FULL corpus before the doc_id
    // window is applied — a segment first seen in doc 3 still kills its
    // copy in doc 500
    "q136_segment_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        |w AS (SELECT doc_id, unnest(tk) AS word,
        |  generate_subscripts(tk,1) AS i FROM t),
        |s AS (SELECT doc_id, CAST((i-1)//4 AS BIGINT) AS pos,
        |  string_agg(word, ' ' ORDER BY i) AS seg FROM w GROUP BY 1, 2),
        |f AS (SELECT doc_id, pos, seg,
        |  row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM s),
        |a AS (SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN seg END,
        |    ' ' ORDER BY pos), '') AS text_kept,
        |  CAST(count(*) AS BIGINT) AS n_seg,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped
        |  FROM f GROUP BY 1)
        |SELECT doc_id, text_kept, n_seg, n_dropped FROM a
        |WHERE n_dropped > 0 ORDER BY doc_id LIMIT 20""".stripMargin,
    // exact-Jaccard replay of the LSH path (the q23 premise: every true
    // pair at the gated threshold band-collides, so the probabilistic
    // engine must equal the exact oracle)
    "q137_neardup_decon" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(tk) >= 3
        |    THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
        |    ELSE [array_to_string(tk, ' ')] END AS s FROM t),
        |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
        |i AS (SELECT b.doc_id AS doc_id, a.doc_id AS eval_id,
        |    count(*) AS inter
        |  FROM e a JOIN e b ON a.g = b.g
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 GROUP BY 1,2),
        |j AS (SELECT i.doc_id, i.eval_id,
        |    (inter * 1000) // (sa.n + sb.n - inter) AS jp
        |  FROM i JOIN sz sa ON sa.doc_id = i.eval_id
        |  JOIN sz sb ON sb.doc_id = i.doc_id
        |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8)
        |SELECT doc_id, eval_id, CAST(jp AS BIGINT) AS jac_permille FROM (
        |  SELECT doc_id, eval_id, jp, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY jp DESC, eval_id) AS rn FROM j)
        |WHERE rn = 1""".stripMargin,
    "q116_substring_decon" ->
      """WITH p AS (SELECT DISTINCT array_to_string(string_split(text,' ')[1:3], ' ') AS p
        |  FROM documents WHERE doc_id < 10),
        |hit AS (SELECT DISTINCT d.doc_id, d.source FROM documents d, p
        |  WHERE d.doc_id >= 10 AND contains(d.text, p.p))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_contaminated
        |FROM hit GROUP BY 1""".stripMargin,
  )
}
