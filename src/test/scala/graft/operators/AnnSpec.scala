package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.load

/** ANN semantics: brute force is the truth; LSH/IVF are buckets over the
  * same exact re-rank. */
class AnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("brute-force top-k: best match of a member query is itself") {
    val emb = load(spark, dir, "embeddings")
    val ref = emb.filter($"vec_id" === 7).select($"embedding".as("ref_emb"))
    val top = emb.crossJoin(broadcast(ref))
      .select($"vec_id", VectorOps.cosine($"embedding", $"ref_emb").as("cos"))
      .orderBy($"cos".desc)
      .limit(1)
      .collect()
    assert(top.head.getLong(0) == 7)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("IVF assignment partitions the vector set exactly once") {
    val emb = load(spark, dir, "embeddings")
    val n = emb.count()
    val cents = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"embedding".as("cent"))
    val assigned = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"cent_id", VectorOps.l1Distance($"embedding", $"cent").as("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"d", $"cent_id")))
      .filter($"rn" === 1)
    assert(assigned.count() == n)
    assert(assigned.select("vec_id").distinct().count() == n)
  }

  test("IVF artifact: persists, maintains incrementally, and searches bucket-pruned") {
    val emb = load(spark, dir, "embeddings")
    val cents = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"embedding".as("cent"))
    val tmp = graft.TempDirs.create("ivf").toString
    // build + persist the artifact
    VectorOps.ivfAssignments(emb, cents).write.parquet(s"$tmp/assign")
    val stored = spark.read.parquet(s"$tmp/assign")
    assert(stored.count() == emb.count()) // every vector assigned once
    // rebuild law: old-half artifact + incremental update == full build
    val oldHalf = VectorOps.ivfAssignments(emb.filter($"vec_id" < 250), cents)
    val incr = VectorOps.updateIvfAssignments(emb, oldHalf, cents)
    val rebuilt = oldHalf.unionByName(incr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = stored.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rebuilt == full)
    // probe with a member vector: nprobe = ALL buckets ≡ brute force
    val probe = emb.filter($"vec_id" === 7).select($"embedding")
      .collect()(0).getSeq[Float](0)
    val brute = emb
      .select($"vec_id",
        floor(VectorOps.cosine($"embedding", typedlit(probe)) * 1e6 + 0.5)
          .cast("long").as("cos_scaled"))
      .orderBy($"cos_scaled".desc, $"vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val all = VectorOps.ivfSearch(emb, stored, cents, probe, nprobe = 16, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all == brute)
    // bucket pruning bites: nprobe=1 searches exactly one bucket's vectors
    val one = VectorOps.ivfSearch(emb, stored, cents, probe, nprobe = 1, k = 5)
      .collect().map(_.getLong(0)).toSet
    val probeBucket = stored.as("a")
      .join(stored.filter($"vec_id" === 7).select($"cent_id"), "cent_id")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(one.subsetOf(probeBucket))
    assert(one.contains(7L)) // self lives in the probed bucket
  }

  test("trainIvfCentroids: fixpoint, retrain identity, search laws, recall floor") {
    val emb = load(spark, dir, "embeddings")
    // converges on the testdata without bestEffort (else this throws)
    val cents = VectorOps.trainIvfCentroids(emb, k = 8)
    val got = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.nonEmpty && got.size <= 8)
    assert(got.values.forall(_.length == 64))
    // deterministic: retraining reproduces the artifact exactly
    val again = VectorOps.trainIvfCentroids(emb, k = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again == got)
    // the trained artifact plugs into the IVF stack: nprobe = all
    // buckets ≡ brute force (the ivfSearch law, now on trained cents)
    val assigned = VectorOps.ivfAssignments(emb, cents)
    val probe = emb.filter($"vec_id" === 7).select($"embedding")
      .collect()(0).getSeq[Float](0)
    val brute = emb
      .select($"vec_id",
        floor(VectorOps.cosine($"embedding", typedlit(probe)) * 1e6 + 0.5)
          .cast("long").as("cos_scaled"))
      .orderBy($"cos_scaled".desc, $"vec_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val all = VectorOps.ivfSearch(
        emb, assigned, cents, probe, nprobe = got.size, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all == brute)
    // recall@10 floor at nprobe=2: the pruned search must keep at least
    // half of the exact top-10 (deterministic corpus + deterministic
    // training ⇒ a stable measurement, pinned conservatively)
    val pruned = VectorOps.ivfSearch(
        emb, assigned, cents, probe, nprobe = 2, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.map(_._1).count(pruned.contains)
    assert(recall >= 5, s"recall@10 at nprobe=2 fell to $recall/10")
  }

  test("PQ: codebooks train to a fixpoint, codes well-formed, ADC search laws") {
    val emb = load(spark, dir, "embeddings")
    val (m, k) = (4, 8)
    val books = VectorOps.pqTrainCodebooks(emb, m, k)
    val bk = books.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(bk.keys.map(_._1).toSet == (0 until m).toSet)
    assert(bk.values.forall(_.length == 64 / m))
    // retrain identity (deterministic artifact)
    val again = VectorOps.pqTrainCodebooks(emb, m, k).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(again == bk)
    // codes: one per subspace, drawn from that subspace's codebook
    val codes = VectorOps.pqEncode(emb, books, m)
    val cd = codes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(cd.size == emb.count())
    assert(cd.values.forall(_.length == m))
    cd.values.foreach(cs => cs.zipWithIndex.foreach { case (c, s) =>
      assert(bk.contains((s, c)), s"code $c not in subspace $s codebook")
    })
    // ADC self-law: searching with vector 7 as the probe, vec 7's ADC
    // distance equals its own reconstruction error — and for a member
    // vector that is small enough to rank it into the top-k
    val probe = emb.filter($"vec_id" === 7).select($"embedding")
      .collect()(0).getSeq[Float](0)
    val top = VectorOps.pqSearch(codes, books, probe, m, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.map(_._1).contains(7L),
      s"probe vector missing from its own ADC top-10: ${top.toSeq}")
    // planted-contrast law: the synthetic corpus is isotropic (neighbors
    // are barely closer than strangers, so a recall@k floor over it
    // measures nothing) — instead plant true near-copies of the probe
    // and require ADC to rank them above the whole random corpus, which
    // is what quantized distance must preserve: LARGE contrasts
    import spark.implicits._
    val planted = (0 until 3).map { i =>
      val v = probe.toArray.clone()
      v(i * 7) = v(i * 7) + 0.02f
      (1000L + i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(planted)
    val top5 = VectorOps.pqSearch(
        VectorOps.pqEncode(corpus, books, m), books, probe, m, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(top5.contains(7L) &&
      Set(1000L, 1001L, 1002L).subsetOf(top5),
      s"planted near-copies not ranked above the corpus: $top5")
    // IVF-PQ composition: at nprobe = #buckets the bucket prune is a
    // no-op and the composed search equals plain ADC over the artifact
    val cents = VectorOps.trainIvfCentroids(emb, k = 8)
    val nBuckets = cents.count().toInt
    val assigned = VectorOps.ivfAssignments(emb, cents)
    val full = VectorOps.pqSearch(codes, books, probe, m, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val composed = VectorOps.ivfPqSearch(
        codes, assigned, cents, books, probe, nprobe = nBuckets, m, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(composed == full, s"ivfPq(nprobe=all) diverged:\n$composed\n$full")
    // plan gate: the ADC lookup table joins as a broadcast hash join —
    // the corpus-side codes never shuffle for the table, and nothing
    // degenerates to a nested loop
    val searchPlan = VectorOps.pqSearch(codes, books, probe, m, k = 10)
      .queryExecution.executedPlan.toString
    assert(searchPlan.contains("BroadcastHashJoin"), searchPlan)
    assert(!searchPlan.contains("BroadcastNestedLoopJoin"), searchPlan)
    // at nprobe = 1 only the probed bucket's codes are scored
    val one = VectorOps.ivfPqSearch(
        codes, assigned, cents, books, probe, nprobe = 1, m, k = 10)
      .collect().map(_.getLong(0)).toSet
    val probeBucket = assigned.as("a")
      .join(assigned.filter($"vec_id" === 7).select($"cent_id"), "cent_id")
      .select($"a.vec_id").collect().map(_.getLong(0)).toSet
    assert(one.subsetOf(probeBucket) && one.contains(7L))
  }

  test("PQ incremental: append ≡ full re-encode; drift stat exact-zero law; rerank recall dominance") {
    val m = 4
    val emb = load(spark, dir, "embeddings")
    val books = VectorOps.pqTrainCodebooks(emb, m, 8)
    // rebuild law (unchanged codebooks): old-half codes + incremental
    // append == one-shot full encode, row-for-row
    val canon = (df: org.apache.spark.sql.DataFrame) => df
      .select($"vec_id", $"codes")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    val oldCodes = VectorOps.pqEncode(emb.filter($"vec_id" < 250), books, m)
    val inc = VectorOps.updatePqCodes(emb, oldCodes, books, m)
    // the increment touches ONLY the missing ids
    assert(inc.select($"vec_id").collect().map(_.getLong(0)).forall(_ >= 250))
    assert(canon(oldCodes.unionByName(inc))
      == canon(VectorOps.pqEncode(emb, books, m)))
    // drift-zero law: with every vector its own codebook entry, ADC is
    // exact by construction — the stat must report exactly zero error
    val selfBooks = VectorOps.pqTrainCodebooks(
      emb.filter($"vec_id" < 32), m, 32) // k = n: fixpoint after 1 step
    val selfCodes = VectorOps.pqEncode(emb.filter($"vec_id" < 32), selfBooks, m)
    val probe = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0)
    val drift = VectorOps.pqDriftStat(
      emb.filter($"vec_id" < 32), selfCodes, selfBooks, probe, m,
      sampleSize = 32).head()
    assert(drift.getAs[Long]("n_sampled") == 32L)
    assert(drift.getAs[Long]("mean_adc_err_scaled") == 0L, drift.toString)
    assert(drift.getAs[Long]("err_permille") == 0L)
    // trained-codebook drift is the documented baseline: nonzero but
    // bounded (the retrain threshold rides ~2× this)
    val codes = VectorOps.pqEncode(emb, books, m)
    val d2 = VectorOps.pqDriftStat(emb, codes, books, probe, m).head()
    assert(d2.getAs[Long]("err_permille") > 0L)
    assert(d2.getAs[Long]("err_permille") < 500L, d2.toString)
    // recall dominance: vs the brute-force exact-L1 top-k, the exact
    // re-rank over R candidates never recalls FEWER than plain ADC
    // top-k (it can only fix quantization inversions inside the set)
    val probeScaled = probe.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)
    val exactTop = load(spark, dir, "embeddings")
      .select($"vec_id",
        aggregate(
          zip_with($"embedding",
            typedlit(probeScaled),
            (a, p) => abs(floor(a.cast("double") * 1e6 + 0.5).cast("long") - p)),
          lit(0L), (acc, x) => acc + x).as("d"))
      .orderBy($"d", $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val adcTop = VectorOps.pqSearch(codes, books, probe, m, k = 10)
      .collect().map(_.getLong(0)).toSet
    val rerankTop = VectorOps.pqSearchRerank(
      emb, codes, books, probe, m, k = 10, rerankFrom = 50)
      .collect().map(_.getLong(0)).toSet
    assert(rerankTop.size == 10)
    assert((rerankTop & exactTop).size >= (adcTop & exactTop).size,
      s"rerank recall ${(rerankTop & exactTop).size} < adc ${(adcTop & exactTop).size}")
  }

  test("ivfPqSearchRerank: ≡ pqSearchRerank at nprobe=all; exact bucket-restricted top-k at covering depth") {
    val m = 4
    val emb = load(spark, dir, "embeddings")
    val cents = VectorOps.trainIvfCentroids(emb, 8)
    val assigned = VectorOps.ivfAssignments(emb, cents)
    val books = VectorOps.pqTrainCodebooks(emb, m, 8)
    val codes = VectorOps.pqEncode(emb, books, m)
    val probe = emb.filter($"vec_id" === 3).select($"embedding")
      .head().getSeq[Float](0)
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // degradation law: probing every bucket IS the two-stage rerank
    assert(canon(VectorOps.ivfPqSearchRerank(emb, codes, assigned, cents,
        books, probe, nprobe = 8, m = m, k = 10, rerankFrom = 50))
      == canon(VectorOps.pqSearchRerank(
        emb, codes, books, probe, m, k = 10, rerankFrom = 50)))
    // covering-depth law: with rerankFrom ≥ the probed population, the
    // ADC candidate stage can lose nothing — the result is the EXACT
    // scaled-L1 top-k of the probed buckets' members (recomputed
    // driver-side, (dist, vec_id) tie-break)
    val near2 = cents
      .select($"cent_id", VectorOps.l1Distance($"cent",
        org.apache.spark.sql.functions.typedlit(probe)).as("d"))
      .orderBy($"d", $"cent_id").limit(2).select($"cent_id")
    val bucketIds = assigned.join(near2, "cent_id")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val pS = probe.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)
    val exact = emb.filter($"vec_id".isin(bucketIds.toSeq: _*))
      .select($"vec_id", $"embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        (r.getLong(0), e.indices.map(i =>
          math.abs(math.floor(e(i).toDouble * 1e6 + 0.5).toLong - pS(i))).sum)
      }
      .sortBy { case (id, d) => (d, id) }.take(5)
      .map { case (id, d) => (id, d) }.toSeq
    val got = VectorOps.ivfPqSearchRerank(emb, codes, assigned, cents, books,
        probe, nprobe = 2, m = m, k = 5, rerankFrom = bucketIds.size)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exact, s"got $got\nexact $exact")
  }

  test("pqSearchMany ≡ pqSearch per probe; IVF recall sweep obeys its laws") {
    import spark.implicits._
    val emb = load(spark, dir, "embeddings")
    val m = 4
    val books = VectorOps.pqTrainCodebooks(emb, m, 8)
    val codes = VectorOps.pqEncode(emb, books, m)
    val probe = emb.filter($"vec_id" === 7).select($"embedding")
      .collect()(0).getSeq[Float](0)
    // per-probe identity on a TWO-probe batch: each pid's top-k must
    // equal its own pqSearch — this is what the batched path adds
    // (per-pid isolation), so a single-probe check cannot gate it
    val probe3 = emb.filter($"vec_id" === 3).select($"embedding")
      .collect()(0).getSeq[Float](0)
    val manyDf = VectorOps.pqSearchMany(
      codes, books,
      Seq((3L, probe3), (7L, probe)).toDF("pid", "probe"), m, k = 10)
    val many = manyDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._3, t._2)).map(t => (t._2, t._3)).toSeq)
      .toMap
    for ((pid, pv) <- Seq(3L -> probe3, 7L -> probe)) {
      val single = VectorOps.pqSearch(codes, books, pv, m, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(many(pid) == single,
        s"batched ADC diverged for pid=$pid:\n${many(pid)}\n$single")
    }
    // plan gate: the per-pid ranking compiles through the native
    // grouped top-k (rank column dropped ⇒ rewrite fires), not a
    // per-pid window sort
    val manyPlan = manyDf.queryExecution.executedPlan.toString
    assert(manyPlan.contains("TopKPerKey"), manyPlan)
    // recall sweep laws
    val cents = VectorOps.trainIvfCentroids(emb, k = 8)
    val nB = cents.count().toInt
    val assigned = VectorOps.ivfAssignments(emb, cents)
    val sweep = VectorOps.ivfRecallSweep(
        emb, assigned, cents, Seq(3L, 7L), Seq(1, 2, nB), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val n = emb.count()
    for (pid <- Seq(3L, 7L)) {
      val s = sweep.filter(_._1 == pid).sortBy(_._2)
      assert(s.map(_._2).toSeq == Seq(1, 2, nB).sorted)
      // recall and cost are non-decreasing in nprobe
      assert(s.map(_._3).sliding(2).forall(p => p.size < 2 || p(0) <= p(1)))
      assert(s.map(_._4).sliding(2).forall(p => p.size < 2 || p(0) <= p(1)))
      // at nprobe = all buckets: full recall, whole corpus scanned
      assert(s.last._3 == 10L && s.last._4 == n)
    }
    // pointwise agreement with an independent recompute at nprobe = 2
    val twoBuckets = cents
      .select($"cent_id", VectorOps.l1Distance($"cent", typedlit(probe)).as("d"))
      .orderBy($"d", $"cent_id").limit(2)
      .collect().map(_.getLong(0)).toSet
    val inBuckets = assigned
      .filter($"cent_id".isin(twoBuckets.toSeq: _*))
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val brute = emb.filter($"vec_id" =!= 7)
      .select($"vec_id",
        floor(VectorOps.cosine($"embedding", typedlit(probe)) * 1e6 + 0.5)
          .cast("long").as("cs"))
      .orderBy($"cs".desc, $"vec_id").limit(10)
      .collect().map(_.getLong(0))
    val expected = brute.count(inBuckets.contains).toLong
    val got = sweep.find(r => r._1 == 7L && r._2 == 2).get._3
    assert(got == expected, s"sweep recall $got != recomputed $expected")
  }

  test("trainIvfCentroids refuses loudly when the iteration cap is hit") {
    val emb = load(spark, dir, "embeddings")
    val ex = intercept[IllegalStateException] {
      VectorOps.trainIvfCentroids(emb, k = 8, maxIter = 1)
    }
    assert(ex.getMessage.contains("no fixpoint"), ex.getMessage)
    // bestEffort returns the capped iterate instead
    assert(VectorOps.trainIvfCentroids(emb, k = 8, maxIter = 1,
      bestEffort = true).count() > 0)
  }

  test("LSH signature buckets: identical vectors share a signature") {
    val emb = load(spark, dir, "embeddings")
    val sig = emb.withColumn("sig", VectorOps.signatureCol($"embedding", 64, 12))
    // deterministic: same vector → same signature on recompute
    val a = sig.select("vec_id", "sig").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = sig.select("vec_id", "sig").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // signatures spread the space (not all equal)
    assert(a.values.toSet.size > 10)
  }

  test("minhash finds planted near-duplicates (recall on a known pair)") {
    // 200 distinct tokens -> ~198 distinct shingles; a single-word edit
    // changes 3 of them: jaccard ≈ 0.97, far above the 0.8 threshold
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    val nearDup = base.replace("word100", "changed")
    val docs = (0 until 40).map(i => (i.toLong, s"totally different text number $i " +
      s"with unique words ${i * 7} ${i * 13} ${i * 29} " * 6)) ++
      Seq((100L, base), (101L, nearDup))
    val df = docs.toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_planted")
    // rerun the q23 pipeline against the planted table
    val sh = df.select($"doc_id", explode(TextOps.shingles($"text")).as("sh"))
    val aggs = collect_set($"sh").as("sh_set") +:
      (0 until 16).map(k => min(xxhash64($"sh", lit(k))).as(s"m$k"))
    val sigs = sh.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
    val banded = sigs.select($"doc_id", explode(array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * 4 until (b + 1) * 4).map(i => col(s"m$i")): _*).as("bkey"))
    }: _*)).as("bb"))
      .select($"doc_id", col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)), s"planted pair not found in $pairs")
  }

  test("dedup clustering: a planted A~B~C chain forms ONE 3-doc cluster") {
    // B is a near-dup of both A and C, but A and C differ enough that the
    // pair (A, C) is NOT an edge — only transitivity links them
    val base = (0 until 200).map(i => s"tok$i").mkString(" ")
    val b = base.replace("tok50", "x50")
    val c = b.replace("tok150", "x150") // vs A: two edits, jac still >= 0.8 at 3-shingles? keep edits far apart
    val others = (0 until 30).map(i => (i.toLong,
      s"completely unrelated content $i " + s"junk ${i * 3} ${i * 11} " * 8))
    val docs = others ++ Seq((200L, base), (201L, b), (202L, c))
    val df = docs.toDF("doc_id", "text")
    val pairs = TextOps.nearDupPairs(df, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((200L, 201L)) && pairs.contains((201L, 202L)), pairs.toString)

    // both physical strategies (driver union-find, distributed
    // large-star/small-star) must merge the chain into ONE cluster of 3
    // labeled by the min id
    for (maxLocal <- Seq(1000000L, 0L)) {
      val clusters = TextOps.dedupClusters(df, 0.8, maxLocalEdges = maxLocal)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(clusters.get(200L).contains(3L), s"maxLocal=$maxLocal: $clusters")
      assert(!clusters.contains(201L) && !clusters.contains(202L))
    }
  }

  test("distributed CC converges on a chain component with diameter >> 20") {
    // a 41-node path graph: plain min-label propagation needs 40 rounds
    // (the old 20-round cap exited silently wrong); large-star/small-star
    // needs O(log n). Also plant a second component and an isolated pair.
    val chain = (0 until 40).map(i => (i.toLong, (i + 1).toLong))
    val extra = Seq((100L, 101L), (100L, 102L), (200L, 201L))
    val pairs = (chain ++ extra).toDF("id_a", "id_b")
    val members = TextOps.distributedClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = members.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(clusters == Map(0L -> 41L, 100L -> 3L, 200L -> 2L), clusters.toString)
    // per-doc labels, not just sizes: the whole chain carries the min id
    assert(members.filter(_._2 == 0L).map(_._1).sorted.toSeq == (0L to 40L))
  }

  test("dedup clustering refuses (or warns) when the LSH cap drops edges") {
    // 140 identical docs: every pair is a candidate, so per-doc candidate
    // degree 139 > MaxCandidatesPerDoc — dropped edges could split the
    // cluster, and the clusterer must not be silent about it
    val docs = (0 until 140).map(i =>
      (i.toLong, (0 until 50).map(j => s"same$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val ex = intercept[IllegalStateException] {
      TextOps.dedupClusters(df, 0.8)
    }
    assert(ex.getMessage.contains("capped") || ex.getMessage.contains("dropped"),
      ex.getMessage)
    // opt-out path still runs (accepting possibly-fractured clusters)
    val clusters = TextOps.dedupClusters(df, 0.8, failOnCappedEdges = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty && clusters.values.sum <= 140L, clusters.toString)
  }

  test("ANN recall: counts are bounded and agree with a driver-side recompute") {
    val out = VectorOps.q72AnnRecall(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    for ((pid, inBucket, bucket) <- out)
      assert(inBucket <= 10L && inBucket <= bucket, s"probe $pid: $inBucket/$bucket")
    // truth: recompute one probe's top-10 and bucket membership locally
    val emb = load(spark, dir, "embeddings")
      .withColumn("sig", VectorOps.signatureCol($"embedding", 64, 6))
      .select($"vec_id", $"sig", $"embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val (_, psig, pemb) = emb.find(_._1 == 0L).get
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val scored = emb.filter(_._1 != 0L)
      .map { case (id, sig, e) =>
        (id, math.floor(cos(pemb, e) * 1e6 + 0.5).toLong, sig == psig) }
    val top10 = scored.sortBy { case (id, cs, _) => (-cs, id) }.take(10)
    assert(out.head._2 == top10.count(_._3))
    assert(out.head._3 == scored.count(_._3))
  }

  // ---------------------------------------------------------------- q193

  test("q193: identical releases pin drift to zero; a planted shift is caught") {
    import spark.implicits._
    // even/odd twins share the same vector (pairs keyed by vec_id/2),
    // one label — the two parity releases have identical centroids
    val same = (0L until 40L).map { i =>
      (i, Array.fill(4)(((i / 2) % 5).toFloat / 10f), 1)
    }.toDF("vec_id", "embedding", "label")
    val tmp = graft.TempDirs.create("q193").toString
    same.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val zero = VectorOps.q193CentroidDrift(spark, tmp).collect()
    assert(zero.length === 1 && zero.head.getAs[Long]("drift_num") === 0L,
      zero.mkString(","))
    // shift every odd (release-B) vector by +0.5 in dim 0 only:
    // drift_num = n_a*n_b*500000 exactly (one dim, scale 1e6)
    val shifted = same.as[(Long, Array[Float], Int)].map { case (id, e, l) =>
      if (id % 2 == 1) (id, e.updated(0, e(0) + 0.5f), l) else (id, e, l)
    }.toDF("vec_id", "embedding", "label")
    shifted.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = VectorOps.q193CentroidDrift(spark, tmp).collect().head
    val (na, nb) = (out.getAs[Long]("n_a"), out.getAs[Long]("n_b"))
    assert(out.getAs[Long]("drift_num") === na * nb * 500000L)
  }

  // ---------------------------------------------------------------- q183

  test("q183: bucket-explode equi-join candidates ≡ Hamming<=1 membership") {
    val emb = load(spark, dir, "embeddings")
      .withColumn("sig", VectorOps.signatureCol($"embedding", 64, 6))
    val probes = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("pid"), $"sig".as("psig"))
    val viaJoin = VectorOps.multiProbeCandidates(
        emb.select($"vec_id", $"sig"), probes, 6)
      .select($"pid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaHamming = emb.select($"vec_id", $"sig").crossJoin(probes)
      .filter(expr("bit_count(sig ^ psig) <= 1"))
      .select($"pid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaJoin === viaHamming && viaJoin.nonEmpty)
  }

  test("q183: multi-probe dominates single-probe, probe ring finds 1-flip neighbors") {
    val out = VectorOps.q183MultiProbeRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    for ((pid, tkS, tkM, nS, nM) <- out) {
      assert(tkM >= tkS, s"probe $pid: multi top-k recall below single")
      assert(nM >= nS, s"probe $pid: multi candidates below single")
      assert(tkM <= 10L && tkS <= tkM && nS <= nM)
    }
    // a planted vector whose signature differs from the probe's in
    // exactly one plane is a multi-probe candidate, never single-probe
    val probes = Seq((100L, 5L)).toDF("pid", "psig")
    val data = Seq((1L, 5L), (2L, 5L ^ 8L), (3L, 5L ^ 24L)).toDF("vec_id", "sig")
    val cand = VectorOps.multiProbeCandidates(data, probes, 6)
      .select($"vec_id", ($"sig" === $"psig").as("own")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(cand === Map(1L -> true, 2L -> false), cand.toString)
  }

  // ---------------------------------------------------------------- q201

  test("q201: shortlist re-rank dominates prefix-direct recall row by row") {
    val out = VectorOps.q201MatryoshkaRecall(spark, dir).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val (p, rr) = (r.getAs[Long]("n_topk_prefix"),
        r.getAs[Long]("n_topk_rerank"))
      assert(rr >= p, s"pid ${r.get(0)}: rerank $rr < prefix $p")
      assert(rr <= 10L && p >= 0L)
    }
    // non-vacuity: the prefix pass retrieves something somewhere
    assert(out.map(_.getAs[Long]("n_topk_rerank")).sum > 0L)
  }

  test("q218: reciprocal ranks are exact 2520/rank integers, misses score 0") {
    val out = VectorOps.q218AnnMrr(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rr = r.getAs[Long]("rr_scaled")
      val rank = r.getAs[Long]("rel_rank")
      if (rank >= 1L && rank <= 10L)
        assert(rr === 2520L / rank && 2520L % rank === 0L)
      else assert(rr === 0L) // miss sentinel 0 or rank past the cutoff
    }
  }

  test("q231: overlap counts are in [0,10] and quantized search is non-vacuous") {
    val out = VectorOps.q231Int8Recall(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 10L)
      assert(r.getAs[Long]("q_top1") >= 0L)
    }
    // 255-level quantization preserves most of the top-10 on average
    assert(out.map(_.getAs[Long]("n_overlap")).sum > 0L)
  }
}
