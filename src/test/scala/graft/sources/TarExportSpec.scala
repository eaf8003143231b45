package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WebDataset-style tar shard sink: ustar conformance (independent
  * parser), sample contiguity, deterministic sharding, byte-stable
  * re-export. */
class TarExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Minimal independent ustar reader: (name, payload) in file order. */
  private def readTar(path: String): Seq[(String, Array[Byte])] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= bytes.length && bytes(off) != 0) {
      val base = new String(bytes, off, 100, StandardCharsets.US_ASCII)
        .takeWhile(_ != '\u0000')
      // POSIX prefix field: re-join prefix(155) + '/' + name(100)
      val prefix = new String(bytes, off + 345, 155, StandardCharsets.US_ASCII)
        .takeWhile(_ != '\u0000')
      val name = if (prefix.isEmpty) base else s"$prefix/$base"
      // header self-check: stored checksum must match recomputation
      val stored = Integer.parseInt(new String(bytes, off + 148, 6,
        StandardCharsets.US_ASCII), 8)
      val sum = (0 until 512).map { i =>
        if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xff
      }.sum
      assert(stored == sum, s"checksum mismatch for $name")
      assert(new String(bytes, off + 257, 5, StandardCharsets.US_ASCII) == "ustar")
      val size = java.lang.Long.parseLong(new String(bytes, off + 124, 11,
        StandardCharsets.US_ASCII).trim, 8).toInt
      val payload = java.util.Arrays.copyOfRange(bytes, off + 512, off + 512 + size)
      out += ((name, payload))
      off += 512 + size + (512 - size % 512) % 512
    }
    out.result()
  }

  private def samples = {
    import spark.implicits._
    (0 until 12).map { i =>
      val img = Array.tabulate[Byte](100 + i * 37)(j => ((i * j) % 251).toByte)
      (f"doc-$i%03d", Map(
        "txt" -> s"text body $i".getBytes(StandardCharsets.UTF_8),
        "json" -> s"""{"id":$i}""".getBytes(StandardCharsets.UTF_8),
        "img" -> img))
    }.toDF("key", "entries")
  }

  test("tar shards roundtrip: every entry recovered, samples contiguous and sorted") {
    val out = graft.TempDirs.create("tar").toString
    Export.writeTarShards(samples, out, nShards = 3)
    val shardFiles = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(shardFiles.nonEmpty && shardFiles.length <= 3)
    val entries = shardFiles.flatMap(f => readTar(f.getAbsolutePath)).toSeq
    // full recovery: 12 samples x 3 files, payloads byte-identical
    assert(entries.length == 36)
    val byName = entries.toMap
    assert(new String(byName("doc-007.txt"), StandardCharsets.UTF_8) == "text body 7")
    for (i <- 0 until 12)
      assert(byName(f"doc-$i%03d.img").toSeq ==
        Array.tabulate[Byte](100 + i * 37)(j => ((i * j) % 251).toByte).toSeq)
    // WebDataset law: one sample's files are contiguous (and ext-sorted)
    for (shard <- shardFiles.map(f => readTar(f.getAbsolutePath))) {
      val keys = shard.map(_._1.split('.').head)
      assert(keys == keys.sorted, s"keys not grouped/sorted: $keys")
      shard.grouped(3).foreach { g =>
        assert(g.map(_._1.split('.').head).distinct.size == 1)
        assert(g.map(_._1.split('.').last) == Seq("img", "json", "txt"))
      }
    }
  }

  test("multimodal sample assembly exports joined doc+embedding shards end-to-end") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = graft.TempDirs.create("tar-mm").toString
    val samples = Export.multimodalSamples(docs, emb)
    val n = samples.count()
    assert(n > 0)
    Export.writeTarShards(samples, out, nShards = 4)
    val entries = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".tar"))
      .flatMap(f => readTar(f.getAbsolutePath)).toSeq
    assert(entries.length == n * 3) // txt + json + emb.json per sample
    // spot-check one sample roundtrips content faithfully
    val byName = entries.toMap
    val doc7 = docs.filter($"doc_id" === 7).select($"text").as[String].head()
    val key7 = "doc-" + "0" * 18 + "7"
    assert(new String(byName(s"$key7.txt"), StandardCharsets.UTF_8) == doc7)
    val embJson = new String(byName(s"$key7.emb.json"), StandardCharsets.UTF_8)
    assert(embJson.startsWith("[") && embJson.count(_ == ',') ==
      emb.filter($"vec_id" === 7).select($"embedding").as[Seq[Float]].head().size - 1)
  }

  test("nested keys over 100 bytes use the ustar prefix field; job commits with _SUCCESS") {
    import spark.implicits._
    // 150-byte entry name: 60-byte dir + '/' + 85-byte stem + ".txt"
    val dir60 = "a" * 60
    val stem85 = "b" * 85
    val longKey = s"$dir60/$stem85"
    val out = graft.TempDirs.create("tar-prefix").toString
    val df = Seq((longKey,
      Map("txt" -> "nested payload".getBytes(StandardCharsets.UTF_8))))
      .toDF("key", "entries")
    Export.writeTarShards(df, out, nShards = 2)
    val files = new java.io.File(out).listFiles().map(_.getName).toSet
    // commit protocol: final shards + _SUCCESS only, no .inprogress litter
    assert(files.contains("_SUCCESS"), files.toString)
    assert(!files.exists(_.contains("inprogress")), files.toString)
    val entries = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".tar"))
      .flatMap(f => readTar(f.getAbsolutePath)).toSeq
    assert(entries.map(_._1) == Seq(s"$longKey.txt"))
    assert(s"$longKey.txt".getBytes(StandardCharsets.UTF_8).length == 150)
    assert(new String(entries.head._2, StandardCharsets.UTF_8) == "nested payload")
    // unsplittable >100-byte names refuse loudly (no silent truncation)
    val bad = Seq(("c" * 120,
      Map("txt" -> Array[Byte](1)))).toDF("key", "entries")
    val ex = intercept[Exception] {
      Export.writeTarShards(bad, graft.TempDirs.create("tar-bad").toString)
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(ex).contains("no prefix(155)/name(100) split"), msgs(ex))
  }

  test("shard assignment is the deterministic xxhash64 rule; re-export is byte-identical") {
    import spark.implicits._
    val out1 = graft.TempDirs.create("tar1").toString
    val out2 = graft.TempDirs.create("tar2").toString
    Export.writeTarShards(samples, out1, nShards = 3)
    // second export from a DIFFERENT input partitioning
    Export.writeTarShards(samples.repartition(7), out2, nShards = 3)
    val expected = samples
      .select($"key", pmod(xxhash64($"key"), lit(3)).as("shard"))
      .as[(String, Long)].collect().toMap
    for (f <- new java.io.File(out1).listFiles().filter(_.getName.endsWith(".tar"))) {
      val shard = f.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
      readTar(f.getAbsolutePath).foreach { case (name, _) =>
        assert(expected(name.split('.').head) == shard, s"$name in wrong shard")
      }
      val twin = Paths.get(out2, f.getName)
      assert(Files.exists(twin), s"missing twin shard ${f.getName}")
      assert(java.util.Arrays.equals(
        Files.readAllBytes(f.toPath), Files.readAllBytes(twin)),
        s"${f.getName} not byte-identical across re-exports")
    }
  }
}
