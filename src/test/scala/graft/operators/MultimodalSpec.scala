package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.min
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec semantics of the multimodal path: the payloads are actual
  * PNGs (magic bytes, compressed) and `featurize` computes from DECODED
  * pixels, not raw payload bytes. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("encodePng emits a real PNG and decodePixels roundtrips the bytes") {
    val (png, w, h) = MultimodalOps.encodePng("abc".getBytes("UTF-8"))
    // PNG signature: 137 80 78 71 13 10 26 10
    assert((png(0) & 0xff) == 137 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    assert(w == 16 && h == 1)
    val px = MultimodalOps.decodePixels(png)
    assert(px.length == 16)
    assert(px.take(3).toSeq == Seq(97, 98, 99), px.toSeq.toString) // 'a','b','c'
    assert(px.drop(3).forall(_ == 0)) // zero padding
  }

  test("multi-row images pack row-major with a zero-padded final row") {
    val bytes = (0 until 40).map(i => (i + 1).toByte).toArray // 40 > 2*16
    val (png, w, h) = MultimodalOps.encodePng(bytes)
    assert(w == 16 && h == 3)
    val px = MultimodalOps.decodePixels(png)
    assert(px.length == 48)
    assert(px.take(40).toSeq == (1 to 40), px.toSeq.toString)
    assert(px.drop(40).forall(_ == 0))
  }

  test("featurize computes histogram and sums from DECODED pixels") {
    import spark.implicits._
    // 'a'=97 (bin 3), ' '=32 (bin 1); padding zeros land in bin 0
    val media = Seq((7L, "aaaa aaaa")).toDF("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val (png, w, h) = MultimodalOps.encodePng(text.getBytes("UTF-8"))
        MediaRow(id, png, "image/png", png.length, w, h)
      }
    val f = MultimodalOps.featurize(media).collect().head
    assert(f.doc_id == 7L)
    assert(f.n_pixels == 16L)
    assert(f.pixel_sum == 8L * 97 + 32) // decoded luminance, not PNG bytes
    assert(math.abs(f.feature(3) - 8f / 16) < 1e-6)  // 8 × 'a'
    assert(math.abs(f.feature(1) - 1f / 16) < 1e-6)  // 1 × ' '
    assert(math.abs(f.feature(0) - 7f / 16) < 1e-6)  // 7 × pad
    // the payload is compressed: PNG size != pixel count
    assert(f.n_bytes != f.n_pixels)
  }

  test("WAV roundtrip preserves PCM16 samples, including negatives") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = MultimodalOps.encodeWav(samples)
    // canonical header: 44 bytes + 2 per sample, RIFF/WAVE magic
    assert(wav.length == 44 + samples.length * 2)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(MultimodalOps.decodeWav(wav).toSeq == samples.toSeq)
    // corrupted magic must be rejected, not mis-parsed
    val bad = wav.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](MultimodalOps.decodeWav(bad))
  }

  test("audio features: peak frame isolates the loud span") {
    import spark.implicits._
    // framed analysis on a synthetic doc: 100 quiet chars then 50 loud
    val quiet = "!" * 100 // code 33
    val loud = "z" * 50 // code 122
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.q76AudioDecode(spark, dir)
    // gate-shape sanity on real testdata: one row per document
    assert(out.count() == graft.Tables.load(spark, dir, "documents").count())
    // and the law itself on a controlled row
    val row = Seq((1L, quiet + loud)).toDF("doc_id", "text")
    val r = {
      val samples = (quiet + loud).getBytes("US-ASCII").map(b => ((b & 0xff) * 100).toShort)
      val dec = MultimodalOps.decodeWav(MultimodalOps.encodeWav(samples))
      dec.grouped(MultimodalOps.AudioFrame).map(_.map(_.toLong).sum).max
    }
    assert(r == 50L * 122 * 100) // the loud half-frame wins
  }

  test("GVID container roundtrips frames and rejects a corrupt magic") {
    val frames = Array(
      Array[Byte](1, 2, 3),
      Array.emptyByteArray,
      Array.tabulate(200)(i => (i % 127).toByte))
    val enc = MultimodalOps.encodeVideo(frames)
    assert(new String(enc.take(4), "US-ASCII") == "GVID")
    val dec = MultimodalOps.decodeVideo(enc)
    assert(dec.length == 3)
    assert(dec.zip(frames).forall { case (a, b) => a.sameElements(b) })
    val corrupt = enc.clone(); corrupt(0) = 'X'.toByte
    intercept[IllegalArgumentException](MultimodalOps.decodeVideo(corrupt))
    // a frame length overrunning the container fails loudly too
    val truncated = enc.take(enc.length - 1)
    intercept[IllegalArgumentException](MultimodalOps.decodeVideo(truncated))
  }

  test("q96: sampled-frame stats come from decoded pixels of real PNG frames") {
    import spark.implicits._
    // controlled text: 3 frames of 64 chars + a 10-char tail = 4 frames;
    // sampled frames 0 and 2 → luminance = codes in [0,64) ∪ [128,192)
    val text = ("a" * 64) + ("b" * 64) + ("c" * 64) + ("d" * 10)
    val bytes = text.getBytes("US-ASCII")
    val video = MultimodalOps.encodeVideo(
      bytes.grouped(MultimodalOps.VideoFrameChars)
        .map(seg => MultimodalOps.encodePng(seg)._1).toArray)
    val frames = MultimodalOps.decodeVideo(video)
    assert(frames.length == 4)
    // frame 0 decodes to the 'a' run: 64 chars → 16×4 pixels, sum 64·97
    val px0 = MultimodalOps.decodePixels(frames(0))
    assert(px0.length == 64 && px0.sum == 64 * 'a'.toInt)
    // frame 3 (tail): 10 chars → one 16-wide zero-padded row
    val px3 = MultimodalOps.decodePixels(frames(3))
    assert(px3.length == 16 && px3.sum == 10 * 'd'.toInt)
    // sampled = frames 0,2: pixel counts 64+64, lum 64·'a'+64·'c'
    val sampledLum = Seq(0, 2).map(f => MultimodalOps.decodePixels(frames(f)).sum).sum
    assert(sampledLum == 64 * 'a'.toInt + 64 * 'c'.toInt)
  }

  // ---------------------------------------------------------------- q184

  test("q184: aHash is invariant to a global brightness shift") {
    // 16x16 gradient raster; +40 to every pixel must not flip any bit
    // (s_c·N >= S·n_c gains δ·n_c·N on both sides)
    val base = Array.tabulate(256)(i => (i * 200) / 256)
    val shifted = base.map(_ + 40)
    assert(MultimodalOps.aHash(base, 16, 16) ===
      MultimodalOps.aHash(shifted, 16, 16))
  }

  test("q184: aHash survives a PNG encode/decode roundtrip; structure matters") {
    val text = ("the quick brown fox " * 20).getBytes("UTF-8")
    val (png, w, h) = MultimodalOps.encodePng(text)
    val direct = MultimodalOps.aHash(
      text.map(_ & 0xff).padTo(w * h, 0), w, h)
    val decoded = MultimodalOps.aHash(MultimodalOps.decodePixels(png), w, h)
    assert(direct === decoded, "lossless codec must preserve the fingerprint")
    // opposite gradients have opposite bright halves => different hashes
    val up = Array.tabulate(256)(i => i)
    val down = up.reverse
    assert(MultimodalOps.aHash(up, 16, 16) !==
      MultimodalOps.aHash(down, 16, 16))
  }

  // ---------------------------------------------------------------- q185

  test("q185: banded join ≡ brute-force Hamming<=3 on the real corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val hashed = MultimodalOps.mediaTable(spark, dir).mapPartitions { rows =>
      rows.map(r => (r.doc_id,
        MultimodalOps.aHash(MultimodalOps.decodePixels(r.media), r.width, r.height)))
    }.toDF("doc_id", "ahash")
    val banded = MultimodalOps.aHashNearDupPairs(hashed, 3)
      .select($"ia", $"ib").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(banded.length === banded.distinct.length, "no duplicate pairs")
    val hs = hashed.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(banded.toSet === brute, "pigeonhole blocking must be lossless")
  }

  test("q185: one flip per band defeats banding only beyond the radius") {
    import spark.implicits._
    val base = 0x0123456789ABCDEFL
    // 3 flips: bits 0, 16, 32 -> bands 0,1,2 differ, band 3 shared => found
    val within = base ^ ((1L << 0) | (1L << 16) | (1L << 32))
    // 4 flips, one per band: no shared band AND ham=4 > radius => excluded
    val beyond = base ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))
    val hashed = Seq((1L, base), (2L, within), (3L, beyond))
      .toDF("doc_id", "ahash")
    val pairs = MultimodalOps.aHashNearDupPairs(hashed, 3)
      .select($"ia", $"ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) ham=3 found; (2,3) ham=1 found; (1,3) ham=4 one flip per
    // band — no shared band, beyond the radius — excluded
    assert(pairs === Set((1L, 2L), (2L, 3L)), pairs.toString)
  }

  // ---------------------------------------------------------------- q188

  test("q188: broadcast-banded decon ≡ brute force; planted dup flagged") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.q188ImageDecon(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // brute-force truth from collected hashes
    val hs = MultimodalOps.mediaTable(spark, dir).mapPartitions { rows =>
      rows.map(r => (r.doc_id,
        MultimodalOps.aHash(MultimodalOps.decodePixels(r.media), r.width, r.height)))
    }.toDF("doc_id", "ahash").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bench = hs.filter(_._1 < 10).map(_._2)
    val flagged = hs.filter(_._1 >= 10).filter { case (_, h) =>
      bench.exists(b => java.lang.Long.bitCount(h ^ b) <= 3) }.map(_._1).toSet
    val srcOf = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = flagged.groupBy(srcOf)
    for ((src, (_, nFlag, fold)) <- out) {
      val expect = bySrc.getOrElse(src, Set.empty)
      assert(nFlag === expect.size.toLong, s"$src flag count")
      assert(fold === expect.foldLeft(0L)(_ ^ _), s"$src flag fold")
    }
    // the corpus side must reach the verify WITHOUT an exchange: the
    // benchmark band table broadcasts
    val plan = MultimodalOps.q188ImageDecon(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  // ---------------------------------------------------------------- q192

  test("q192: audit conserves rows and classifies both planted failure axes") {
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.q192MediaAudit(spark, dir).collect()
    val n = graft.Tables.load(spark, dir, "documents").count()
    assert(out.map(_.getAs[Long]("n_rows")).sum === n)
    for (r <- out)
      assert(r.getAs[Long]("n_ok") + r.getAs[Long]("n_torn") +
        r.getAs[Long]("n_meta_rot") === r.getAs[Long]("n_rows"),
        s"conservation broken for ${r.getString(0)}")
    // both planted axes fire somewhere on the corpus
    assert(out.map(_.getAs[Long]("n_torn")).sum > 0L)
    assert(out.map(_.getAs[Long]("n_meta_rot")).sum > 0L)
  }

  // ---------------------------------------------------------------- q191

  test("q191: registry min-merge is order-blind, fold-stable, replay-idempotent") {
    import spark.implicits._
    import graft.streaming.HistogramStream
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s1 = Seq((10L, 100L), (20L, 200L)).toDF("ahash", "first_id")
    val s2 = Seq((10L, 50L), (30L, 300L)).toDF("ahash", "first_id")
    val expect = Map(10L -> 50L, 20L -> 200L, 30L -> 300L)
    // order-blind
    val a = graft.TempDirs.create("rega").toString
    HistogramStream.appendRegistryShard(spark, a, "b0", s1)
    HistogramStream.appendRegistryShard(spark, a, "b1", s2)
    val b = graft.TempDirs.create("regb").toString
    HistogramStream.appendRegistryShard(spark, b, "b0", s2)
    HistogramStream.appendRegistryShard(spark, b, "b1", s1)
    assert(regMap(HistogramStream.readRegistry(spark, a)) === expect)
    assert(regMap(HistogramStream.readRegistry(spark, b)) === expect)
    // fold preserves every assignment; idempotent re-fold
    HistogramStream.compactRegistry(spark, a)
    assert(HistogramStream.liveTags(spark, a) === Seq("folded-0"))
    assert(regMap(HistogramStream.readRegistry(spark, a)) === expect)
    // replaying a shard (same tag) changes nothing — min is idempotent
    HistogramStream.appendRegistryShard(spark, b, "b1", s1)
    assert(regMap(HistogramStream.readRegistry(spark, b)) === expect)
  }

  test("q191: the streaming wrapper reaches the one-shot batch assignment") {
    import spark.implicits._
    import graft.streaming.HistogramStream
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
    val base = graft.TempDirs.create("regstream")
    val (src, store) = (s"$base/src", s"$base/store")
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$src/b0.parquet")
    val q = HistogramStream.imageRegistryStream(spark, src, store)
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" % 2 === 1).write
        .mode("append").parquet(s"$src/b1.parquet")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = HistogramStream.readRegistry(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = MultimodalOps.fingerprints(docs)
      .groupBy($"ahash").agg(min($"doc_id").as("first_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch && batch.nonEmpty)
  }

  test("q184: gated counts conserve the corpus and bound collisions") {
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.q184ImageAHashDedup(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    for (r <- out) {
      assert(r.getAs[Long]("n_hashes") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_dup_docs") >= 2 * r.getAs[Long]("n_dup_groups")
        || r.getAs[Long]("n_dup_groups") === 0L)
    }
  }

  test("q245: nearest 2x resize samples exactly the even-grid corners") {
    // 3x3 raster 0..8: out = in(2x, 2y) over a 2x2 grid -> 0, 2, 6, 8
    val (out, w2, h2) = MultimodalOps.resizeHalf((0 to 8).toArray, 3, 3)
    assert((w2, h2) === ((2, 2)))
    assert(out.toSeq === Seq(0, 2, 6, 8))
    // odd-even mix: 4x3 -> 2x2, samples (0,0),(2,0),(0,2),(2,2)
    val (o2, a, b) = MultimodalOps.resizeHalf((0 to 11).toArray, 4, 3)
    assert((a, b) === ((2, 2)))
    assert(o2.toSeq === Seq(0, 2, 8, 10))
  }
}
