package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** One decoded media row: opaque bytes + typed metadata. */
case class MediaRow(doc_id: Long, media: Array[Byte], format: String, n_bytes: Int)

/** Extracted feature row (decode output schema). */
case class MediaFeature(doc_id: Long, n_bytes: Int, feature: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/featurized per partition.
  *
  * The actual codec call is STUBBED (no image/audio libs in this
  * container — see `decodeStub`); everything Spark-side is real: the
  * binary column, the schema, the per-partition batched iteration
  * (`mapPartitions`, the Scala analogue of `mapInPandas` batches), and
  * the downstream relational handling of the fixed-width feature vector.
  * At scale this runs embarrassingly parallel, one task per input split,
  * no shuffle until the aggregate.
  */
object MultimodalOps {

  /** Deterministic fake "media": the document text bytes stand in for an
    * encoded image payload. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    load(s, dir, "documents")
      .select(
        $"doc_id",
        encode($"text", "UTF-8").as("media"),
        lit("fake/raw").as("format"),
        octet_length(encode($"text", "UTF-8")).as("n_bytes"))
      .as[MediaRow]
  }

  /** STUB decoder: a real build would call an image codec here; we emit a
    * deterministic 8-bin byte histogram (normalized) as the "feature" so
    * the full pipeline stays testable end-to-end. Signature and batch
    * shape are the real contract. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 5) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 8) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Per-partition featurization — the mapInPandas-equivalent batch loop. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaFeature(r.doc_id, r.n_bytes, decodeStub(r.media)))
    }
  }

  /** Driver-gated query: binary-column plumbing whose *byte accounting* a
    * SQL oracle can check (feature values are covered by ScalaTest). */
  def q29Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = featurize(mediaTable(s, dir))
    feats.join(load(s, dir, "documents"), "doc_id")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").cast("long").as("sum_bytes"))
  }

  /** Frame-sampling shape op: split each payload into fixed-size "frames"
    * and explode — the video-frame-sample plumbing (stubbed content). */
  def q32FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frameSize = 64
    load(s, dir, "documents")
      .select(
        $"doc_id",
        encode($"text", "UTF-8").as("media"))
      .select(
        $"doc_id",
        posexplode(
          transform(
            sequence(lit(0), floor((octet_length($"media") - 1) / frameSize).cast("int")),
            i => $"media".substr(i * frameSize + 1, lit(frameSize)))))
      .groupBy()
      .agg(
        count(lit(1)).as("n_frames"),
        sum(octet_length($"col")).cast("long").as("sum_frame_bytes"))
  }

  val oracles: Map[String, String] = Map(
    "q29_multimodal" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_media,
        |CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes
        |FROM documents GROUP BY 1""".stripMargin,
    "q32_frame_sample" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_frames,
        |CAST(sum(least(64, strlen(text) - f*64)) AS BIGINT) AS sum_frame_bytes
        |FROM documents, (SELECT unnest(generate_series(0, 100000)) AS f) frames
        |WHERE f <= floor((strlen(text)-1)/64)""".stripMargin,
  )
}
