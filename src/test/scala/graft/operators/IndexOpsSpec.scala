package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.load
import graft.functions.ZOrder

/** Index-artifact laws: the inverted index's exact-df / capped-postings
  * contract (q149) and the Z-order key algebra (q151) — the quadrant
  * law that makes tiles a prefix of the key, the box cover used for
  * pruning, and bit-parity between the mask-spread encoder and the
  * oracle's Σ ((x>>i)&1)<<2i replay.
  */
class IndexOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q149

  test("q149: df counts documents (per-doc dedup), postings sorted, cap accounted") {
    val docs = Seq(
      (2L, "x x z", "s"), // x twice in one doc -> df 1 for this doc
      (1L, "x y", "s"),
      (3L, "z", "s")).toDF("doc_id", "text", "source")
    val idx = IndexOps.invertedIndex(docs).collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[String]("postings"),
          r.getAs[Boolean]("truncated")))).toMap
    assert(idx("x") === ((2L, "1,2", false)), "df=2 not 3; postings ascending")
    assert(idx("y") === ((1L, "1", false)))
    assert(idx("z") === ((2L, "2,3", false)))
    // cap: df stays EXACT while postings truncate, and the row says so
    val capped = IndexOps.invertedIndex(docs, cap = 1).collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[String]("postings"),
          r.getAs[Boolean]("truncated")))).toMap
    assert(capped("x") === ((2L, "1", true)))
    assert(capped("y") === ((1L, "1", false)))
  }

  test("q149: planted hot token (df >> cap) — exact df, first-cap postings, bounded plan") {
    graft.plans.TopKPerKey.install(spark)
    // 500 docs all carry "hot"; each also carries a private rare token
    val docs = (1L to 500L).map(i => (i, s"hot rare$i", "s"))
      .toDF("doc_id", "text", "source").repartition(7)
    val q = IndexOps.invertedIndex(docs)
    // plan gate: the postings side is bounded by the native grouped
    // top-k BEFORE collect_list — no Window sort of the raw postings
    // survives anywhere in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), "bounded top-k missing:\n" + plan)
    assert(!plan.contains("Window"), "unbounded window sort survived:\n" + plan)
    val idx = q.collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[String]("postings"),
          r.getAs[Boolean]("truncated")))).toMap
    // hot token: df exact at 500, postings = the 32 SMALLEST doc_ids
    assert(idx("hot") === ((500L, (1L to 32L).mkString(","), true)))
    // rare tokens untouched by the cap
    assert(idx("rare1") === ((1L, "1", false)))
    assert(idx("rare500") === ((1L, "500", false)))
    assert(idx.size === 501)
  }

  test("q149: index is repartition-invariant on the corpus") {
    val docs = load(spark, dir, "documents")
    val a = IndexOps.invertedIndex(docs).collect().toSet
    val b = IndexOps.invertedIndex(docs.repartition(13)).collect().toSet
    assert(a === b && a.nonEmpty)
  }

  // ---------------------------------------------------------------- q151

  test("q151: morton encode truth table and oracle-formula parity") {
    assert(ZOrder.encode(0, 0) === 0L)
    assert(ZOrder.encode(1, 0) === 1L)
    assert(ZOrder.encode(0, 1) === 2L)
    assert(ZOrder.encode(3, 5) === 39L) // 011 ⨯ 101 interleaved
    assert(ZOrder.encode(0xFFFFL, 0xFFFFL) === 0xFFFFFFFFL)
    // parity with the oracle's literal bit-sum replay
    def sumForm(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    val probe = Seq(0L, 1L, 2L, 3L, 255L, 256L, 4095L, 14633L, 65535L)
    for (x <- probe; y <- probe)
      assert(ZOrder.encode(x, y) === sumForm(x, y), s"($x, $y)")
  }

  test("q151: quadrant law — tile of the key == key of the coarse dims") {
    for {
      s <- Seq(4, 8, 12)
      x <- Seq(0L, 17L, 255L, 4096L, 65535L)
      y <- Seq(0L, 300L, 14633L, 65535L)
    } assert(ZOrder.tile(ZOrder.encode(x, y), s) ===
      ZOrder.encode(x >> s, y >> s), s"s=$s ($x, $y)")
  }

  test("q151: box cover is exact on the tile grid") {
    val (x0, x1, y0, y1, s) = (100L, 900L, 14700L, 15000L, 8)
    val cover = ZOrder.tilesForBox(x0, x1, y0, y1, s).toSet
    // complete: every point of the box lands in a covered tile
    for (x <- x0 to x1 by 57; y <- y0 to y1 by 31)
      assert(cover.contains(ZOrder.tile(ZOrder.encode(x, y), s)))
    // tight: every covered tile's quadrant intersects the box
    assert(cover.size === ((x1 >> s) - (x0 >> s) + 1) * ((y1 >> s) - (y0 >> s) + 1))
  }

  test("q151: profile rows stay inside their tile's quadrant") {
    val prof = IndexOps.q151ZorderLayout(spark, dir).collect()
    assert(prof.nonEmpty)
    prof.foreach { r =>
      val t = r.getAs[Long]("ztile")
      for (c <- Seq("min_x", "max_x"); d <- Seq("min_y", "max_y"))
        assert(ZOrder.tile(ZOrder.encode(
          r.getAs[Long](c), r.getAs[Long](d)), 8) === t, s"tile $t $c/$d")
    }
  }

  test("writeZOrdered + boxProbe: probe prunes to PartitionFilters, result ≡ direct scan") {
    val ev = load(spark, dir, "events")
    val tmp = graft.TempDirs.create("zorder").toString
    IndexOps.writeZOrdered(ev,
      $"user_id", expr("unix_timestamp(ts) div 3600"), scale = 8, path = tmp)
    // one file per (task, tile): every tile directory holds exactly one
    // part file (the chunk-bijection write discipline)
    val root = new java.io.File(tmp)
    val tileDirs = root.listFiles().filter(_.getName.startsWith("ztile="))
    assert(tileDirs.nonEmpty)
    tileDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length === 1, s"${d.getName}: ${parts.length} files")
    }
    val probe = IndexOps.boxProbe(spark, tmp, 0L, 255L, 14600L, 15100L, scale = 8)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(!plan.contains("PartitionFilters: []"), plan)
    assert("PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).get
      .contains("ztile"), plan)
    // box residual on zx/zy reaches the parquet scan (the FileScan
    // string truncates the filter list — assert on its visible prefix)
    assert("PushedFilters: \\[[^\\]]*".r.findFirstIn(plan).exists(f =>
      f.contains("zx") && !f.endsWith("[]")), plan)
    // and the pruned read returns exactly the box's rows
    val expected = ev.filter($"user_id" % 65536L <= 255L &&
      expr("unix_timestamp(ts) div 3600") % 65536L >= 14600L &&
      expr("unix_timestamp(ts) div 3600") % 65536L <= 15100L).count()
    assert(probe.count() === expected && expected > 0L)
  }

  test("appendZOrdered: delta appends keep probe ≡ direct scan; re-layout folds files") {
    val ev = load(spark, dir, "events")
    val base = ev.filter($"event_id" % 2 === 0)
    val delta = ev.filter($"event_id" % 2 === 1)
    val tmp = graft.TempDirs.create("zappend").toString
    IndexOps.writeZOrdered(base,
      $"user_id", expr("unix_timestamp(ts) div 3600"), scale = 8, path = tmp)
    IndexOps.appendZOrdered(delta,
      $"user_id", expr("unix_timestamp(ts) div 3600"), scale = 8, path = tmp)
    val probe = IndexOps.boxProbe(spark, tmp, 0L, 255L, 14600L, 15100L, scale = 8)
    val expected = ev.filter($"user_id" % 65536L <= 255L &&
      expr("unix_timestamp(ts) div 3600") % 65536L >= 14600L &&
      expr("unix_timestamp(ts) div 3600") % 65536L <= 15100L).count()
    assert(probe.count() === expected && expected > 0L,
      "probe over base+delta must equal the direct scan of the union")
    // appended epochs leave >1 file in touched tiles; a re-layout of the
    // full data folds back to the one-file-per-tile invariant
    val root = new java.io.File(tmp)
    def maxFilesPerTile: Int = root.listFiles()
      .filter(_.getName.startsWith("ztile=")).map(
        _.listFiles().count(_.getName.startsWith("part-"))).max
    assert(maxFilesPerTile > 1, "delta should append files, not rewrite")
    IndexOps.writeZOrdered(ev,
      $"user_id", expr("unix_timestamp(ts) div 3600"), scale = 8, path = tmp)
    assert(maxFilesPerTile === 1, "re-layout must fold to one file per tile")
    assert(IndexOps.boxProbe(spark, tmp, 0L, 255L, 14600L, 15100L, scale = 8)
      .count() === expected)
  }

  // ---------------------------------------------------------------- q158

  test("q158: manifest-pruned read ≡ direct scan while opening fewer files") {
    val ev = load(spark, dir, "events")
    val tmp = graft.TempDirs.create("manifest").toString
    ev.repartitionByRange(8, $"user_id")
      .sortWithinPartitions($"user_id", $"ts")
      .write.mode("overwrite").parquet(s"$tmp/t")
    IndexOps.writeStatsManifest(spark, s"$tmp/t",
      Seq("user_id", "event_id"), s"$tmp/m")
    val total = spark.read.parquet(s"$tmp/t").inputFiles.length
    assert(total >= 4, s"layout should split into several files, got $total")
    // manifest carries one row per file with min/max per requested column
    val manifest = spark.read.parquet(s"$tmp/m")
    assert(manifest.count().toInt === total)
    assert(manifest.columns.toSet ===
      Set("file", "min_user_id", "max_user_id",
        "min_event_id", "max_event_id", "n_rows"))
    val pruned = IndexOps.statsPrunedRead(
      spark, s"$tmp/t", s"$tmp/m", "user_id", 10L, 40L)
    // the skip is real: a narrow user range opens a strict subset of files
    assert(pruned.inputFiles.length < total,
      s"pruned ${pruned.inputFiles.length} of $total files")
    // and semantics-free: exactly the direct filter's rows
    val expect = ev.filter($"user_id".between(10L, 40L)).count()
    assert(pruned.count() === expect && expect > 0L)
    // a range outside every file's stats yields an empty, well-typed frame
    val none = IndexOps.statsPrunedRead(
      spark, s"$tmp/t", s"$tmp/m", "user_id", 99999999L, 99999999L)
    assert(none.count() === 0L)
    assert(none.schema.fieldNames.sameElements(pruned.schema.fieldNames))
    // a conjunction prunes at least as hard as its tightest member and
    // still equals the direct two-predicate filter
    val multi = IndexOps.statsPrunedReadMulti(spark, s"$tmp/t", s"$tmp/m",
      Seq(("user_id", 10L, 40L), ("event_id", 0L, 5000L)))
    assert(multi.inputFiles.length <= pruned.inputFiles.length)
    assert(multi.count() === ev.filter($"user_id".between(10L, 40L) &&
      $"event_id".between(0L, 5000L)).count())
  }

  // ---------------------------------------------------------------- q182

  test("q182: incremental append ≡ full rebuild; already-current is a free no-op") {
    val ev = load(spark, dir, "events")
    val tmp = graft.TempDirs.create("apmanifest").toString
    ev.filter($"user_id" % 5 =!= 0L)
      .repartitionByRange(6, $"user_id")
      .sortWithinPartitions($"user_id", $"ts")
      .write.mode("overwrite").parquet(s"$tmp/t")
    IndexOps.writeStatsManifest(spark, s"$tmp/t",
      Seq("user_id", "event_id"), s"$tmp/m")
    val baseFiles = spark.read.parquet(s"$tmp/t").inputFiles.length
    ev.filter($"user_id" % 5 === 0L)
      .repartitionByRange(2, $"user_id")
      .sortWithinPartitions($"user_id", $"ts")
      .write.mode("append").parquet(s"$tmp/t")
    val total = spark.read.parquet(s"$tmp/t").inputFiles.length
    assert(total > baseFiles, "delta batch must land as its own files")
    // append stats exactly the delta's files
    val nNew = IndexOps.appendStatsManifest(spark, s"$tmp/t",
      Seq("user_id", "event_id"), s"$tmp/m")
    assert(nNew === total - baseFiles)
    // appended manifest row-set == a from-scratch rebuild (keyed by
    // basename: the rebuild re-stats the same physical files)
    def rows(p: String) = spark.read.parquet(p).collect().map { r =>
      (r.getAs[String]("file").split('/').last,
        r.getAs[Long]("min_user_id"), r.getAs[Long]("max_user_id"),
        r.getAs[Long]("min_event_id"), r.getAs[Long]("max_event_id"),
        r.getAs[Long]("n_rows"))
    }.toSet
    IndexOps.writeStatsManifest(spark, s"$tmp/t",
      Seq("user_id", "event_id"), s"$tmp/m2")
    assert(rows(s"$tmp/m") === rows(s"$tmp/m2"))
    // a second append finds nothing, stats nothing, changes nothing
    val before = rows(s"$tmp/m")
    assert(IndexOps.appendStatsManifest(spark, s"$tmp/t",
      Seq("user_id", "event_id"), s"$tmp/m") === 0)
    assert(rows(s"$tmp/m") === before)
    // pruned read through the appended manifest ≡ the direct filter
    val pruned = IndexOps.statsPrunedRead(
      spark, s"$tmp/t", s"$tmp/m", "user_id", 10L, 40L)
    assert(pruned.count() === ev.filter($"user_id".between(10L, 40L)).count())
  }

  test("q174: compaction folds the fragment layout without changing a row") {
    import graft.Tables.load
    val docs = load(spark, dir, "documents")
    val tmp = graft.TempDirs.create("compact").toString
    docs.repartition(32).write.parquet(s"$tmp/frag")
    val before = spark.read.parquet(s"$tmp/frag")
    assert(before.inputFiles.length === 32)
    val n = docs.count()
    val written = IndexOps.compactFiles(spark, s"$tmp/frag",
      s"$tmp/out", targetRowsPerFile = (n + 3) / 4, sortCols = Seq("doc_id"))
    val after = spark.read.parquet(s"$tmp/out")
    assert(written <= 4 && after.inputFiles.length === written)
    // content-preserving: same multiset of rows
    assert(after.select($"doc_id", $"text").collect().map(r =>
        (r.getLong(0), r.getString(1))).sorted.toSeq ===
      docs.select($"doc_id", $"text").collect().map(r =>
        (r.getLong(0), r.getString(1))).sorted.toSeq)
    // a single-row target degenerates to one file per row bounded at n;
    // an oversized target folds to exactly one file
    assert(IndexOps.compactFiles(spark, s"$tmp/frag", s"$tmp/one",
      targetRowsPerFile = n * 10) === 1)
    assert(spark.read.parquet(s"$tmp/one").inputFiles.length === 1)
  }

  // ---------------------------------------------------------------- q196

  test("q196: overlapping occurrences count; first_pos is 1-based leftmost") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a"),        // (a,a) at 1 and 2 — overlap counts
      (2L, "x y x y"),      // (x,y) at 1 and 3
      (3L, "a"),            // too short, dropped by the size guard
      (4L, "b a a b")       // (a,a) at 2
    ).toDF("doc_id", "text")
    val aa = IndexOps.phraseSearch(docs, "a", "a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(aa.toSeq === Seq((1L, 2L, 1L), (4L, 1L, 2L)))
    val xy = IndexOps.phraseSearch(docs, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(xy === Seq((2L, 2L, 1L)))
  }

  test("q196: the plan has zero exchanges — the match never shuffles") {
    import graft.Tables.load
    val q = IndexOps.phraseSearch(load(spark, dir, "documents"), "table", "hash")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phrase search shuffled:\n$plan")
    assert(q.count() > 0, "gate is vacuous with zero phrase hits")
  }

  // ------------------------------------------------- snapshot lifecycle

  test("q200: versions are monotone, reads pin, retention keeps the " +
    "newest and sweeps staging residue") {
    import spark.implicits._
    val store = graft.TempDirs.create("snap")
      .toString + "/s"
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val d2 = Seq((3L, "c")).toDF("id", "v")
    assert(IndexOps.writeSnapshot(d1, store) === 1L)
    assert(IndexOps.writeSnapshot(d2, store) === 2L)
    // plant crash residue; the next write must sweep it and commit v3
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$store/.snap-staging/snap=99"))
    assert(IndexOps.writeSnapshot(d1.union(d2), store) === 3L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/.snap-staging")))
    assert(IndexOps.snapshotVersions(spark, store).sorted === Seq(1L, 2L, 3L))
    // pinned read of an OLD version is exact
    assert(IndexOps.readSnapshot(spark, store, Some(2L))
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    // retention: newest 2 survive, v1 reported expired
    assert(IndexOps.expireSnapshots(spark, store, keep = 2) === Seq(1L))
    assert(IndexOps.snapshotVersions(spark, store).sorted === Seq(2L, 3L))
    assert(IndexOps.readSnapshot(spark, store).count() === 3L)
    // expired versions refuse to read; keep < 1 refuses outright
    intercept[IllegalArgumentException](
      IndexOps.readSnapshot(spark, store, Some(1L)))
    intercept[IllegalArgumentException](
      IndexOps.expireSnapshots(spark, store, keep = 0))
    // idempotent: nothing left to expire
    assert(IndexOps.expireSnapshots(spark, store, keep = 2) === Seq.empty)
  }

  test("q233: the anchored two-phase retrieval equals the direct phrase scan") {
    val direct = IndexOps.phraseSearch(
      graft.Tables.load(spark, dir, "documents"), "merge", "group")
    val anchored = IndexOps.q233PhraseRetrieveAnchored(spark, dir)
    assert(anchored.exceptAll(direct).isEmpty &&
      direct.exceptAll(anchored).isEmpty)
    assert(direct.count() > 0, "phrase absent — gate vacuous")
  }
}
