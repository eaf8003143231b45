package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** One media row: REAL encoded image bytes + typed metadata. */
case class MediaRow(
    doc_id: Long, media: Array[Byte], format: String,
    n_bytes: Int, width: Int, height: Int)

/** Decoded feature row: per-image pixel accounting + an 8-bin
  * luminance histogram computed from DECODED pixels. */
case class MediaFeature(
    doc_id: Long, n_bytes: Int, n_pixels: Long, pixel_sum: Long,
    feature: Array[Float])

/** Multimodal columns: image payloads as opaque `binary` columns with
  * typed metadata, decoded and featurized per partition with
  * `javax.imageio` (PNG support ships with the JDK — zero extra deps).
  *
  * The media fixtures are generated in-pipeline: each document's bytes
  * are packed row-major into a 16-wide grayscale image and PNG-encoded,
  * so the payloads are REAL compressed images and `featurize` performs a
  * REAL decode. The correctness gate exploits the construction: the
  * decoded-pixel luminance sum must equal the character-code sum of the
  * source text (computable by the SQL oracle) — a broken encode/decode
  * roundtrip breaks the hash gate, not just a unit test.
  *
  * At scale this runs embarrassingly parallel — `mapPartitions` batches,
  * one task per input split, no shuffle until the aggregate (the Scala
  * analogue of a `mapInPandas` decode stage).
  */
object MultimodalOps {

  val ImageWidth = 16

  ImageIO.setUseCache(false) // in-memory streams; no tmp-file spills

  /** Pack raw bytes row-major into a `ImageWidth`-wide grayscale PNG
    * (zero-padded final row). Real codec output: headers, filters, zlib. */
  def encodePng(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    val w = ImageWidth
    val h = math.max(1, (bytes.length + w - 1) / w)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < bytes.length) {
      raster.setSample(i % w, i / w, 0, bytes(i) & 0xff)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    (out.toByteArray, w, h)
  }

  /** Decode an image payload to its grayscale pixel values (row-major). */
  def decodePixels(media: Array[Byte]): Array[Int] = {
    val img = ImageIO.read(new ByteArrayInputStream(media))
    require(img != null, "undecodable media payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    px
  }

  /** The media "source": one real PNG per document, built from the
    * document's bytes (deterministic fixture generation, encoded per
    * partition — no driver-side work, no shuffle). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val (png, w, h) = encodePng(text.getBytes("UTF-8"))
          MediaRow(id, png, "image/png", png.length, w, h)
        }
      }
  }

  /** Per-partition decode + featurization — the mapInPandas-equivalent
    * batch loop, now over a real image codec: 8-bin luminance histogram
    * (normalized) plus exact pixel accounting from the DECODED raster. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val px = decodePixels(r.media)
        val hist = new Array[Float](8)
        var sum = 0L
        var i = 0
        while (i < px.length) {
          hist(px(i) >> 5) += 1f
          sum += px(i)
          i += 1
        }
        if (px.length > 0) {
          var j = 0
          while (j < 8) { hist(j) /= px.length; j += 1 }
        }
        MediaFeature(r.doc_id, r.n_bytes, px.length.toLong, sum, hist)
      }
    }
  }

  /** Decode-roundtrip gate: per source, media count, decoded pixel count
    * (= 16 · ⌈len/16⌉ by construction) and decoded luminance sum (= the
    * text's character-code sum) — all recomputable by the SQL oracle, so
    * the PNG encode→decode roundtrip itself is hash-gated. */
  def q29Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = featurize(mediaTable(s, dir))
    feats.join(load(s, dir, "documents"), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_pixels")).cast("long").as("sum_pixels"),
        sum(col("pixel_sum")).cast("long").as("sum_lum"))
  }

  // --------------------------------------------------------------- q245

  /** Nearest-neighbor 2× downsample of a decoded raster: out(x, y) =
    * in(2x, 2y) over the ⌈w/2⌉×⌈h/2⌉ grid — the thumbnail/preprocess
    * step every vision pipeline runs before feature extraction. Pure
    * integer sampling (no interpolation) so the resized luminance sum
    * is exactly replayable by the oracle from the fixture bytes. */
  def resizeHalf(px: Array[Int], w: Int, h: Int): (Array[Int], Int, Int) = {
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) { out(y * w2 + x) = px((2 * y) * w + 2 * x); x += 1 }
      y += 1
    }
    (out, w2, h2)
  }

  /** q245 — decode → 2× nearest resize → RE-ENCODE through the real
    * codec → feature account: per source, image count, resized pixel
    * count, resized luminance sum (both gate-exact against the fixture
    * bytes), plus the decode(encode(resized)) == resized roundtrip
    * asserted in-flight (a corrupted re-encode throws, never ships).
    * Per-partition mapPartitions batches — the mapInPandas shape with
    * a real JDK codec; no shuffle until the final accounting agg. */
  def q245ImageResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = mediaTable(s, dir).mapPartitions { rows =>
      rows.map { r =>
        val px = decodePixels(r.media)
        val (small, w2, h2) = resizeHalf(px, r.width, r.height)
        // real-codec roundtrip: re-encode the thumbnail, decode back
        val img = new BufferedImage(w2, h2, BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            img.getRaster.setSample(x, y, 0, small(y * w2 + x)); x += 1
          }
          y += 1
        }
        val out = new ByteArrayOutputStream()
        ImageIO.write(img, "png", out)
        val back = decodePixels(out.toByteArray)
        require(java.util.Arrays.equals(back, small),
          s"q245: thumbnail codec roundtrip corrupted doc ${r.doc_id}")
        (r.doc_id, w2.toLong * h2, small.map(_.toLong).sum)
      }
    }.toDF("doc_id", "n_px_resized", "lum_resized")
    feats.join(load(s, dir, "documents"), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_px_resized")).as("sum_px_resized"),
        sum(col("lum_resized")).as("sum_lum_resized"))
  }

  /** 64-bit average-hash (aHash) over a decoded grayscale raster — the
    * perceptual-dedup fingerprint: pool the grid into 8×8 cells by
    * integer bucketing (cell = (y·8 div h, x·8 div w) — every pixel in
    * exactly one cell, uneven tails absorbed), set bit c iff cell c's
    * mean ≥ the global mean. Both comparisons are cleared of division
    * (s_c·N ≥ S·n_c, all nonnegative longs), so the hash is
    * INTEGER-EXACT and engine-replayable — no float mean anywhere. The
    * hash is brightness-shift invariant by construction (adding δ to
    * every pixel adds δ·n_c·N to both sides) — the property that makes
    * it perceptual rather than cryptographic: re-encodes, format
    * conversions, and global exposure changes keep the fingerprint
    * while md5-style exact hashing loses it. Cells with no pixels
    * (h < 8 leaves cy gaps) contribute 0 on both engines. */
  def aHash(px: Array[Int], w: Int, h: Int): Long = {
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < px.length) {
      val c = ((i / w) * 8 / h) * 8 + ((i % w) * 8 / w)
      sums(c) += px(i); cnts(c) += 1; total += px(i)
      i += 1
    }
    val n = px.length.toLong
    var hash = 0L
    var c = 0
    while (c < 64) {
      if (cnts(c) > 0 && sums(c) * n >= total * cnts(c)) hash |= (1L << c)
      c += 1
    }
    hash
  }

  /** (doc_id, text) → (doc_id, ahash) through the REAL codec: encode
    * the document's bytes as a PNG, decode it back, fingerprint the
    * decoded raster — one per-partition pass, no shuffle, shared by
    * q184/q185/q188 and the streaming registry
    * ([[graft.streaming.HistogramStream.imageRegistryStream]]). */
  def fingerprints(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val (png, w, h) = encodePng(text.getBytes("UTF-8"))
          (id, aHash(decodePixels(png), w, h))
        }
      }.toDF("doc_id", "ahash")
  }

  /** q184 — perceptual image dedup: every document's REAL PNG payload
    * is decoded and aHash-fingerprinted per partition (no shuffle until
    * the group), then grouped by (source, ahash) — images whose 8×8
    * luminance structure collides are one perceptual group, the binary
    * exact-dedup's (q17) robust sibling. Gated per source: doc count,
    * distinct fingerprints, collision groups/docs, and the bit_xor fold
    * of the fingerprints themselves — the fold pins every HASH VALUE
    * cross-engine, so the whole decode → pool → threshold pipeline is
    * hash-gated through the real codec (the q29 construction: the
    * raster is the text's bytes, so the oracle rebuilds each raster
    * from character codes in SQL). At 100 TB: decode is embarrassingly
    * parallel, the group key is 8 bytes, and the aggregate is
    * map-side-combinable — the same shape as exact dedup. */
  def q184ImageAHashDedup(s: SparkSession, dir: String): DataFrame = {
    val hashed = fingerprints(load(s, dir, "documents"))
    hashed.join(load(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy(col("source"), col("ahash"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("source"))
      .agg(
        sum(col("k")).cast("long").as("n_docs"),
        count(lit(1)).as("n_hashes"),
        count(when(col("k") > 1, lit(1))).as("n_dup_groups"),
        coalesce(sum(when(col("k") > 1, col("k"))), lit(0)).cast("long")
          .as("n_dup_docs"),
        expr("CAST(bit_xor(ahash) AS BIGINT)").as("hash_fold"))
  }

  /** Banded Hamming near-dup pairs over 64-bit fingerprints —
    * pigeonhole-EXACT blocking: split the hash into maxHam+1 equal bit
    * bands; hashes within Hamming distance maxHam differ in ≤ maxHam
    * bands, so they SHARE at least one band value untouched — every
    * true pair is a candidate, zero false negatives BY THEOREM (the
    * q95/q156 exactness-by-construction discipline; the minhash
    * banding idea, but here lossless because Hamming, unlike Jaccard,
    * pigeonholes). The self-join runs on (band_idx, band_value) —
    * candidate volume is Σ band-bucket-choose-2, never all-pairs —
    * then the exact bit_count verify drops false candidates and
    * `distinct` collapses multi-band matches (a pair sharing two bands
    * is one pair). At 100 TB this is the image-side MinHash+LSH: one
    * explode (4 rows/doc), one shuffle on a ≤ 16-bit-value key, exact
    * verify only within buckets. */
  /** (doc_id, ahash) → one row per hash band: (doc_id, ahash, bi, bv)
    * with bv the band's bit slice — the shared blocking key of
    * [[aHashNearDupPairs]] and [[q188ImageDecon]]. */
  private def bandRows(hashed: DataFrame, maxHam: Int): DataFrame = {
    require(maxHam >= 0 && 64 % (maxHam + 1) == 0,
      s"band count ${maxHam + 1} must divide 64")
    val nb = maxHam + 1
    val width = 64 / nb
    val mask = (1L << width) - 1
    hashed.select(col("doc_id"), col("ahash"),
        explode(array((0 until nb).map { b =>
          struct(lit(b).as("bi"),
            expr(s"shiftrightunsigned(ahash, ${b * width}) & $mask").as("bv"))
        }: _*)).as("band"))
      .select(col("doc_id"), col("ahash"),
        col("band.bi").as("bi"), col("band.bv").as("bv"))
  }

  def aHashNearDupPairs(hashed: DataFrame, maxHam: Int = 3): DataFrame = {
    val banded = bandRows(hashed, maxHam)
    val a = banded.select(col("doc_id").as("ia"), col("ahash").as("ha"),
      col("bi"), col("bv"))
    val b = banded.select(col("doc_id").as("ib"), col("ahash").as("hb"),
      col("bi"), col("bv"))
    a.join(b, Seq("bi", "bv")).filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"), col("ha"), col("hb")).distinct()
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHam"))
      .withColumn("ham", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
  }

  /** q185 — perceptual NEAR-dup image pairs (q184 finds exact
    * fingerprint collisions; this finds fingerprints within Hamming 3 —
    * images whose 8×8 luminance structure differs in at most three
    * cells). Gated: pair count, same-source pairs, the distance
    * spectrum d0..d3, and a bit_xor fold of the pair identities — the
    * fold pins WHICH pairs were found, so a banding bug that drops one
    * candidate hash-mismatches even if the counts happened to survive. */
  def q185ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    val hashed = fingerprints(load(s, dir, "documents"))
    val src = load(s, dir, "documents").select(col("doc_id"), col("source"))
    aHashNearDupPairs(hashed, 3)
      .join(src.select(col("doc_id").as("ia"), col("source").as("sa")), "ia")
      .join(src.select(col("doc_id").as("ib"), col("source").as("sb")), "ib")
      .agg(
        count(lit(1)).as("n_pairs"),
        count(when(col("sa") === col("sb"), lit(1))).as("n_same_source"),
        count(when(col("ham") === 0L, lit(1))).as("n_d0"),
        count(when(col("ham") === 1L, lit(1))).as("n_d1"),
        count(when(col("ham") === 2L, lit(1))).as("n_d2"),
        count(when(col("ham") === 3L, lit(1))).as("n_d3"),
        expr("CAST(coalesce(bit_xor(ia ^ (ib * 2654435761)), 0) AS BIGINT)")
          .as("pair_fold"))
  }

  /** q188 — perceptual image DECONTAMINATION: corpus images within
    * Hamming 3 of any benchmark image are flagged — the image-side
    * q55/q74 (paraphrase-robust eval-leakage removal, here
    * re-encode/exposure-robust). Benchmark = the q55 split
    * (doc_id < 10). The plan is the decontamination shape at its best:
    * the benchmark's band rows BROADCAST (benchmarks are small by
    * definition), so the corpus is never shuffled at all — each corpus
    * image explodes to its 4 band rows map-side, probes the broadcast
    * band table, and only band-collision candidates pay the bit_count
    * verify; `distinct` collapses to flagged doc_ids. Per-source
    * accounting rides a 0-sentinel source spine (NULL-free gate rule).
    * Pigeonhole exactness (see [[aHashNearDupPairs]]) means zero false
    * negatives — the oracle's brute-force EXISTS scan agrees exactly. */
  def q188ImageDecon(s: SparkSession, dir: String, maxHam: Int = 3): DataFrame = {
    val hashed = fingerprints(load(s, dir, "documents"))
    val bench = broadcast(bandRows(hashed.filter(col("doc_id") < 10), maxHam)
      .select(col("bi"), col("bv"), col("ahash").as("bh")))
    val flagged = bandRows(hashed.filter(col("doc_id") >= 10), maxHam)
      .join(bench, Seq("bi", "bv"))
      .filter(expr(s"bit_count(ahash ^ bh) <= $maxHam"))
      .select(col("doc_id")).distinct()
    val src = load(s, dir, "documents").select(col("doc_id"), col("source"))
    val spine = src.filter(col("doc_id") >= 10)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val hits = flagged.join(src, "doc_id").groupBy(col("source"))
      .agg(count(lit(1)).as("n_flagged"),
        expr("CAST(bit_xor(doc_id) AS BIGINT)").as("flag_fold"))
    spine.join(hits, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("flag_fold"), lit(0L)).as("flag_fold"))
  }

  /** q191 — perceptual dedup AT INGEST through the streaming
    * first-seen registry: three micro-batches (doc_id mod 3) append
    * their (ahash → min doc_id) shards via
    * [[graft.streaming.HistogramStream.appendRegistryShard]], with a
    * REAL mid-stream fold between batches 2 and 3 (asserted live or
    * the query throws — the q133 non-vacuity rule). Because min() is
    * associative, commutative, and idempotent, the folded registry
    * assigns every fingerprint the GLOBALLY smallest doc_id regardless
    * of batch order, interleaving, or replay — so streaming ingest
    * reaches exactly the survivor assignment a one-shot batch job
    * computes, which is what the oracle replays. Gated per source:
    * docs, canonical count, docs deduped against history, and the
    * bit_xor fold of canonical ids (pins the ASSIGNMENT, not just its
    * size). At 100 TB each batch pays one fingerprint pass + one
    * batch-sized min-aggregate; the registry holds one row per
    * distinct fingerprint — the dedup history itself, partition-
    * filtered to live tags on every read. */
  def q191ImageRegistryStream(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.HistogramStream
    val docs = load(s, dir, "documents")
    val store = graft.TempDirs.create("q191").toString
    def shard(part: Long): DataFrame =
      fingerprints(docs.filter(col("doc_id") % 3 === part))
        .groupBy(col("ahash")).agg(min(col("doc_id")).as("first_id"))
    HistogramStream.appendRegistryShard(s, store, "batch_0", shard(0L))
    HistogramStream.appendRegistryShard(s, store, "batch_1", shard(1L))
    HistogramStream.compactRegistry(s, store)
    val afterFold = HistogramStream.liveTags(s, store)
    require(afterFold == Seq("folded-0"),
      s"q191 gate is vacuous unless the fold ran: live tags $afterFold")
    HistogramStream.appendRegistryShard(s, store, "batch_2", shard(2L))
    val reg = HistogramStream.readRegistry(s, store)
    fingerprints(docs).join(reg, "ahash")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("first_id")).as("n_canonical"),
        count(when(col("doc_id") =!= col("first_id"), lit(1)))
          .as("n_deduped"),
        expr("CAST(bit_xor(DISTINCT first_id) AS BIGINT)").as("canon_fold"))
  }

  /** q192 — multimodal INTEGRITY AUDIT at the binary-payload boundary,
    * the q179 discipline (flag, never drop; conservation in the gated
    * result) applied to media: every row's payload is actually decoded
    * and checked against its DECLARED metadata — decodability, decoded
    * geometry == declared (width, height), payload size == declared
    * n_bytes. The fixture plants real corruption: every 7th document's
    * payload is truncated to 12 bytes (a torn write — PNG magic intact,
    * stream unreadable) and every 11th non-truncated row under-declares
    * its n_bytes by 1 (metadata rot — payload fine, bookkeeping wrong),
    * so both failure AXES (payload vs metadata) are exercised and
    * distinguishable in the output. Conservation n_ok + n_torn +
    * n_meta_rot = n_rows is part of the gated row — a silently vanished
    * record cannot pass. Per-partition decode, one accounting
    * aggregate; the audit reads each payload once. */
  def q192MediaAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val audited = mediaTable(s, dir).map { r =>
      val torn = r.doc_id % 7 == 0L
      val media = if (torn) r.media.take(12) else r.media
      val declaredBytes =
        if (!torn && r.doc_id % 11 == 0L) r.n_bytes - 1 else r.n_bytes
      val decodedOk =
        try { decodePixels(media).length == r.width * r.height }
        catch { case _: Throwable => false }
      val status =
        if (!decodedOk) "torn"
        else if (declaredBytes != media.length) "meta_rot"
        else "ok"
      (r.doc_id, status)
    }.toDF("doc_id", "status")
    audited.join(load(s, dir, "documents").select($"doc_id", $"source"), "doc_id")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_rows"),
        count(when($"status" === "ok", lit(1))).as("n_ok"),
        count(when($"status" === "torn", lit(1))).as("n_torn"),
        count(when($"status" === "meta_rot", lit(1))).as("n_meta_rot"))
  }

  /** Frame-sampling shape op: split each payload into fixed-size "frames"
    * and explode — the video-frame-sample plumbing (byte-slicing layer;
    * content-agnostic by design). */
  def q32FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frameSize = 64
    load(s, dir, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"))
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), floor((octet_length(col("media")) - 1) / frameSize).cast("int")),
            i => col("media").substr(i * frameSize + 1, lit(frameSize)))))
      .groupBy()
      .agg(
        count(lit(1)).as("n_frames"),
        sum(octet_length(col("col"))).cast("long").as("sum_frame_bytes"))
  }

  // ---------------------------------------------------------------- audio

  val AudioFrame = 100 // samples per analysis frame

  /** Encode PCM16 samples as a REAL RIFF/WAVE byte stream (44-byte
    * canonical header + little-endian data chunk) — the JVM-only audio
    * counterpart of [[encodePng]]. */
  def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE payload back to PCM16 samples — a real binary
    * decode (magic checks, chunk walk, LE sample extraction), not a
    * length heuristic. */
  def decodeWav(bytes: Array[Byte]): Array[Short] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF stream"); buf.getInt
    require(tag() == "WAVE", "not a WAVE stream")
    require(tag() == "fmt ", "missing fmt chunk"); buf.getInt
    require(buf.getShort == 1, "not PCM"); buf.getShort
    buf.getInt; buf.getInt; buf.getShort
    require(buf.getShort == 16, "not 16-bit")
    require(tag() == "data", "missing data chunk")
    val n = buf.getInt / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = buf.getShort; i += 1 }
    out
  }

  /** Audio decode + featurization — opaque `binary` WAV payloads
    * (synthesized per partition: sample i = 100 × charCode i, a real
    * codec roundtrip whose decoded stats the SQL oracle can recompute
    * from the text), then per-document frame analysis from the DECODED
    * samples: total |amplitude|, energy (Σ s²), and the peak
    * 100-sample frame — all exact Long arithmetic, so the encode→
    * decode→featurize chain is hash-gated end to end. Per-partition
    * map, no shuffle: the mapInPandas-equivalent audio batch stage. */
  def q76AudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val samples = text.getBytes("US-ASCII").map(b => ((b & 0xff) * 100).toShort)
          val decoded = decodeWav(encodeWav(samples))
          var (absSum, energy) = (0L, 0L)
          decoded.foreach { v =>
            absSum += math.abs(v.toLong); energy += v.toLong * v.toLong
          }
          var peak = 0L
          var f = 0
          while (f < decoded.length) {
            var (fs, i) = (0L, f)
            while (i < math.min(f + AudioFrame, decoded.length)) {
              fs += math.abs(decoded(i).toLong); i += 1
            }
            if (fs > peak) peak = fs
            f += AudioFrame
          }
          (id, decoded.length.toLong, absSum, energy,
            ((decoded.length + AudioFrame - 1) / AudioFrame).toLong, peak)
        }
      }
      .toDF("doc_id", "n_samples", "abs_sum", "energy", "n_frames", "peak_frame_sum")
  }

  // ---------------------------------------------------------------- video

  val VideoFrameChars = 64 // source bytes per frame
  val VideoSampleEvery = 2 // decode every 2nd frame

  /** Pack encoded frames into a length-prefixed container (magic +
    * frame count + per-frame byte length) — the seekable-directory
    * layout that lets a reader jump to frame k without decoding 0..k-1,
    * which is exactly what frame SAMPLING needs. Big-endian, fixed
    * header; a real wire format, not a concat. */
  def encodeVideo(frames: Array[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(_.length + 4).sum
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.put("GVID".getBytes("US-ASCII")).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Walk the container back to its frame payloads (magic + bounds
    * checks — a malformed directory fails loudly, not garbage-decodes). */
  def decodeVideo(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); buf.get(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID stream")
    val n = buf.getInt
    require(n >= 0, "negative frame count")
    Array.fill(n) {
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(), "frame overruns container")
      val f = new Array[Byte](len); buf.get(f); f
    }
  }

  /** Video decode + frame sampling: each document becomes a REAL video
    * payload (its bytes cut into 64-byte segments, each PNG-encoded,
    * packed into the GVID container), then every 2nd frame is pulled
    * through the container walk + PNG decode and featurized. The gate
    * recomputes the decoded stats from the text (frame pixel counts
    * from the encoder's geometry, luminance from char codes at sampled
    * positions), so container + codec + sampler are hash-gated end to
    * end. Per-partition map — the only shuffle is the final per-source
    * aggregate; at 100 TB this is an embarrassingly parallel decode
    * stage exactly like q29/q76. */
  def q96VideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, source, text) =>
          val bytes = text.getBytes("US-ASCII")
          val video = encodeVideo(
            bytes.grouped(VideoFrameChars).map(seg => encodePng(seg)._1).toArray)
          val frames = decodeVideo(video)
          var (nSampled, sumPix, sumLum) = (0L, 0L, 0L)
          var f = 0
          while (f < frames.length) {
            if (f % VideoSampleEvery == 0) {
              val px = decodePixels(frames(f))
              nSampled += 1
              sumPix += px.length
              var i = 0
              while (i < px.length) { sumLum += px(i); i += 1 }
            }
            f += 1
          }
          (id, source, frames.length.toLong, nSampled, sumPix, sumLum)
        }
      }
      .toDF("doc_id", "source", "n_frames", "n_sampled", "sum_pixels", "sum_lum")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_videos"),
        sum(col("n_frames")).cast("long").as("sum_frames"),
        sum(col("n_sampled")).cast("long").as("sum_sampled"),
        sum(col("sum_pixels")).cast("long").as("sum_pixels"),
        sum(col("sum_lum")).cast("long").as("sum_lum"))
  }

  /** Shared oracle prefix: rebuild every document's aHash from
    * character codes (the q29 construction: pixel i of a doc's image
    * is byte i of its text, zero-padded to the 16-wide grid), pool 8×8
    * cells by the same integer bucketing, clear the mean comparison of
    * division, and bit_or the cell masks — bit 63's mask is the
    * explicit Long.MinValue literal because DuckDB refuses 1<<63.
    * Yields `bits(doc_id, source, ahash)`. */
  private val aHashBitsSql: String =
    """WITH d AS (SELECT doc_id, source, text,
      |    CAST(greatest((length(text) + 15) // 16, 1) AS BIGINT) AS h
      |  FROM documents),
      |px AS (SELECT doc_id, source, h,
      |    ((i - 1) // 16) AS y, ((i - 1) % 16) AS x,
      |    CASE WHEN i <= length(text)
      |      THEN unicode(substr(text, CAST(i AS INT), 1)) ELSE 0 END AS v
      |  FROM (SELECT doc_id, source, text, h,
      |          unnest(generate_series(1, h * 16)) AS i FROM d)),
      |cells AS (SELECT doc_id, source,
      |    ((y * 8) // h) * 8 + ((x * 8) // 16) AS c,
      |    sum(v) AS s, count(*) AS nc
      |  FROM px GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, sum(s) AS ts, sum(nc) AS tn
      |  FROM cells GROUP BY 1),
      |bits AS (SELECT cells.doc_id, source,
      |    CAST(bit_or(CASE WHEN s * tn >= ts * nc THEN
      |        CASE WHEN c = 63 THEN (-9223372036854775807 - 1)
      |          ELSE CAST(1 AS BIGINT) << CAST(c AS INT) END
      |      ELSE 0 END) AS BIGINT) AS ahash
      |  FROM cells JOIN tot USING (doc_id) GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    // q184: the bit_xor fold pins every hash VALUE, not just the
    // group structure (raster replay: see aHashBitsSql)
    "q184_image_ahash" ->
      s"""$aHashBitsSql,
        |g AS (SELECT source, ahash, count(*) AS k FROM bits GROUP BY 1, 2)
        |SELECT source, CAST(sum(k) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_hashes,
        |  CAST(count(CASE WHEN k > 1 THEN 1 END) AS BIGINT) AS n_dup_groups,
        |  CAST(coalesce(sum(CASE WHEN k > 1 THEN k END), 0) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(bit_xor(ahash) AS BIGINT) AS hash_fold
        |FROM g GROUP BY 1""".stripMargin,
    // q185's oracle is the BRUTE-FORCE all-pairs Hamming scan with no
    // banding anywhere in the SQL — the pigeonhole theorem (≤ 3
    // differing bits cannot touch all 4 bands) makes the banded join
    // provably lossless, so hash equality proves blocked ≡ exhaustive
    // (the q156 discipline applied to perceptual image dedup)
    "q185_image_neardup" ->
      s"""$aHashBitsSql,
        |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
        |    a.source AS sa, b.source AS sb,
        |    bit_count(xor(a.ahash, b.ahash)) AS ham
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(CASE WHEN sa = sb THEN 1 END) AS BIGINT)
        |    AS n_same_source,
        |  CAST(count(CASE WHEN ham = 0 THEN 1 END) AS BIGINT) AS n_d0,
        |  CAST(count(CASE WHEN ham = 1 THEN 1 END) AS BIGINT) AS n_d1,
        |  CAST(count(CASE WHEN ham = 2 THEN 1 END) AS BIGINT) AS n_d2,
        |  CAST(count(CASE WHEN ham = 3 THEN 1 END) AS BIGINT) AS n_d3,
        |  CAST(coalesce(bit_xor(xor(ia, ib * 2654435761)), 0) AS BIGINT)
        |    AS pair_fold
        |FROM p""".stripMargin,
    // q188's oracle: brute-force EXISTS over the rebuilt hashes, no
    // banding/broadcast anywhere — pigeonhole exactness proven by hash
    // equality; 0-sentinel spine keeps sources without flags NULL-free
    "q188_image_decon" ->
      s"""$aHashBitsSql,
        |bm AS (SELECT ahash FROM bits WHERE doc_id < 10),
        |c AS (SELECT doc_id, source, ahash FROM bits WHERE doc_id >= 10),
        |f AS (SELECT doc_id, source FROM c WHERE EXISTS
        |  (SELECT 1 FROM bm WHERE bit_count(xor(c.ahash, bm.ahash)) <= 3)),
        |sp AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM c GROUP BY 1),
        |h AS (SELECT source, CAST(count(*) AS BIGINT) AS n_flagged,
        |    CAST(bit_xor(doc_id) AS BIGINT) AS flag_fold
        |  FROM f GROUP BY 1)
        |SELECT sp.source, sp.n_docs,
        |  coalesce(h.n_flagged, 0) AS n_flagged,
        |  coalesce(h.flag_fold, 0) AS flag_fold
        |FROM sp LEFT JOIN h USING (source)""".stripMargin,
    // q191: min-merge means shard-accumulate + fold + read ≡ the
    // one-shot batch assignment, so the oracle is the plain global
    // min-per-fingerprint replay — hash equality proves the streaming
    // registry reaches the batch survivor assignment exactly
    "q191_image_registry_stream" ->
      s"""$aHashBitsSql,
        |canon AS (SELECT ahash, min(doc_id) AS first_id
        |  FROM bits GROUP BY 1),
        |j AS (SELECT bits.doc_id, bits.source, canon.first_id
        |  FROM bits JOIN canon USING (ahash))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT first_id) AS BIGINT) AS n_canonical,
        |  CAST(count(CASE WHEN doc_id <> first_id THEN 1 END) AS BIGINT)
        |    AS n_deduped,
        |  CAST(bit_xor(DISTINCT first_id) AS BIGINT) AS canon_fold
        |FROM j GROUP BY 1""".stripMargin,
    // q192 replays the PLANTED corruption rule; the Spark side earns
    // its match only if the real decoder rejects exactly the truncated
    // payloads (else they'd misclassify as meta_rot) and accepts the
    // intact ones (else meta_rot rows would misclassify as torn)
    "q192_media_audit" ->
      """WITH st AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN 'torn'
        |      WHEN doc_id % 11 = 0 THEN 'meta_rot'
        |      ELSE 'ok' END AS status
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN status = 'ok' THEN 1 END) AS BIGINT) AS n_ok,
        |  CAST(count(CASE WHEN status = 'torn' THEN 1 END) AS BIGINT)
        |    AS n_torn,
        |  CAST(count(CASE WHEN status = 'meta_rot' THEN 1 END) AS BIGINT)
        |    AS n_meta_rot
        |FROM st GROUP BY 1""".stripMargin,
    // sampled-frame geometry and luminance recomputed from the text:
    // frame f holds chars [64f, 64f+64); sampled iff f even; a frame of
    // s bytes decodes to 16·max(1,ceil(s/16)) pixels (encodePng geometry)
    "q96_video_frames" ->
      """WITH d AS (SELECT doc_id, source, text, strlen(text) AS len FROM documents),
        |per AS (SELECT doc_id, source,
        |  (len + 63) // 64 AS n_frames,
        |  ((len + 63) // 64 + 1) // 2 AS n_sampled,
        |  list_aggregate(list_transform(
        |    generate_series(0, CAST((len + 63) // 64 - 1 AS BIGINT)),
        |    f -> CASE WHEN f % 2 = 0
        |      THEN 16 * greatest(1, (least(64, len - f*64) + 15) // 16)
        |      ELSE 0 END), 'sum') AS spix,
        |  list_aggregate(list_transform(generate_series(1, len),
        |    i -> CASE WHEN ((i-1) // 64) % 2 = 0
        |      THEN CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)
        |      ELSE 0 END), 'sum') AS slum
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_videos,
        |  CAST(sum(n_frames) AS BIGINT) AS sum_frames,
        |  CAST(sum(n_sampled) AS BIGINT) AS sum_sampled,
        |  CAST(sum(spix) AS BIGINT) AS sum_pixels,
        |  CAST(sum(slum) AS BIGINT) AS sum_lum
        |FROM per GROUP BY 1""".stripMargin,
    "q76_audio_decode" ->
      """WITH c AS (SELECT doc_id, list_transform(generate_series(1, strlen(text)),
        |    i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)) AS codes
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(codes) AS code, generate_subscripts(codes,1) AS i FROM c),
        |fr AS (SELECT doc_id, (i-1)//100 AS f, sum(code) AS fsum FROM u GROUP BY 1,2),
        |a AS (SELECT doc_id, count(*) AS n_samples, sum(code) AS s1, sum(code*code) AS s2
        |  FROM u GROUP BY 1),
        |p AS (SELECT doc_id, count(*) AS n_frames, max(fsum) AS mf FROM fr GROUP BY 1)
        |SELECT a.doc_id, CAST(n_samples AS BIGINT) AS n_samples,
        |CAST(s1*100 AS BIGINT) AS abs_sum, CAST(s2*10000 AS BIGINT) AS energy,
        |CAST(n_frames AS BIGINT) AS n_frames, CAST(mf*100 AS BIGINT) AS peak_frame_sum
        |FROM a JOIN p USING (doc_id)""".stripMargin,
    "q29_multimodal" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_media,
        |CAST(sum(16 * greatest(1, CAST(ceil(strlen(text) / 16.0) AS BIGINT))) AS BIGINT) AS sum_pixels,
        |CAST(sum(list_aggregate(list_transform(generate_series(1, strlen(text)),
        |  i -> ascii(substr(text, CAST(i AS INTEGER), 1))), 'sum')) AS BIGINT) AS sum_lum
        |FROM documents GROUP BY 1""".stripMargin,
    // q245: resized (x, y) samples the padded raster at (2x, 2y) —
    // only 0-based positions with even row AND even column survive,
    // zeros from padding contribute nothing
    "q245_image_resize" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_media,
        |CAST(sum(8 * ((greatest(1, CAST(ceil(strlen(text) / 16.0) AS BIGINT)) + 1) // 2)) AS BIGINT)
        |  AS sum_px_resized,
        |CAST(sum(coalesce(list_aggregate(list_transform(
        |  list_filter(generate_series(1, strlen(text)),
        |    i -> ((i-1) // 16) % 2 = 0 AND ((i-1) % 16) % 2 = 0),
        |  i -> ascii(substr(text, CAST(i AS INTEGER), 1))), 'sum'), 0)) AS BIGINT)
        |  AS sum_lum_resized
        |FROM documents GROUP BY 1""".stripMargin,
    "q32_frame_sample" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_frames,
        |CAST(sum(least(64, strlen(text) - f*64)) AS BIGINT) AS sum_frame_bytes
        |FROM documents, (SELECT unnest(generate_series(0, 100000)) AS f) frames
        |WHERE f <= floor((strlen(text)-1)/64)""".stripMargin,
  )
}
