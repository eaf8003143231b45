package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch per-action profiler for nearDupDedupBatch's batch-1 (store
  * present) path — mirrors DocumentStream.nearDupDedupBatch step by
  * step with a timer around every action so a latency regression names
  * its job. Not part of the bench contract; delete freely.
  */
object ProfDedup2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextOps
    import graft.streaming.DocumentStream
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof2] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof2").toString
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    t("batch0 total (fresh store)")(
      DocumentStream.nearDupDedupBatch(b0, s"$tmp/s1", 0.8, Some("b0")).count())

    // ---- batch1 unrolled ----
    val sigStore = s"$tmp/s1"
    val threshold = 0.8
    val batch = b1
    val newSigs = t("sig plan build")(TextOps.signatureFrame(batch).persist())
    val newBands = DocumentStream.bucketedBands(newSigs)
    val buckets = t("buckets collect")(
      newBands.select(col("band"), col("pbucket")).distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq)
    val storeBands = DocumentStream.prunedStoreBands(spark, sigStore, buckets)
      .map(_.persist())
    val slim = (d: org.apache.spark.sql.DataFrame) =>
      d.select(col("doc_id"), col("band"), col("bkey"))
    val probe = slim(storeBands.get).unionByName(slim(newBands))
    val rnRaw = TextOps.bandCandidates(probe, slim(newBands))
    val (kept, _) = TextOps.guardCandidates(rnRaw, TextOps.MaxCandidatesPerDoc, false)
    val cand = kept.persist()
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val storeMeta = storeBands.map { sb =>
      sb.select(col("doc_id"), col("rep"), col("pdoc")).distinct()
        .join(candIds, "doc_id").persist()
    }
    val pdocs = t("pdocs collect")(storeMeta.toSeq
      .flatMap(_.select(col("pdoc")).distinct().collect().map(_.getInt(0))))
    val shCols = (d: org.apache.spark.sql.DataFrame) =>
      d.select(col("doc_id"), col("sh_set"))
    val verifySigs =
      if (pdocs.isEmpty) shCols(newSigs)
      else shCols(spark.read.parquet(s"$sigStore/sigs")
          .filter(col("pdoc").isin(pdocs: _*)))
        .unionByName(shCols(newSigs))
    val pairs = TextOps.verifyPairs(cand, verifySigs, threshold)
    val members = t("clusterMembers")(TextOps.clusterMembersFromPairs(pairs))
    val r0 = members
      .join(storeMeta.get.select(col("doc_id"), col("rep")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("rep"), col("doc_id")).as("r0"),
        col("rep").isNotNull.as("in_store"))
    val reps = r0.groupBy(col("cluster_id")).agg(
      coalesce(min(when(col("in_store"), col("r0"))), min(col("r0")))
        .as("final_rep"))
    val assign = r0.join(reps, "cluster_id")
      .select(col("doc_id"), col("final_rep"))
      .persist()
    val dupIds = assign.filter(col("doc_id") =!= col("final_rep"))
      .select(col("doc_id"))
    val survivors = batch.join(dupIds, Seq("doc_id"), "left_anti")
    val reppedSigs = newSigs
      .join(assign, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("final_rep"), col("doc_id")))
      .drop("final_rep")
      .withColumn("pdoc",
        pmod(xxhash64(col("doc_id")), lit(DocumentStream.SigBuckets.toLong)).cast("int"))
    t("sigs write") {
      val tagged = reppedSigs.withColumn("btag", lit("b1"))
      tagged.repartitionByRange(col("pdoc")).sortWithinPartitions(col("pdoc"))
        .write.partitionBy("btag").option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$sigStore/sigs")
    }
    t("bands write") {
      val bb = DocumentStream.bucketedBands(reppedSigs, carry = Seq("rep", "pdoc"))
        .withColumn("btag", lit("b1"))
      bb.repartitionByRange(col("band"), col("pbucket"))
        .sortWithinPartitions(col("pbucket"))
        .write.partitionBy("btag", "band").option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$sigStore/bands")
    }
    t("batch scan alone")(batch.count())
    t("storeMeta count")(storeMeta.get.count())
    t("members count")(members.count())
    t("r0 count")(r0.count())
    t("reps count")(reps.count())
    t("assign count (cached?)")(assign.count())
    t("survivors count")(survivors.count())
    t("survivors count again")(survivors.count())
    TextOps.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
