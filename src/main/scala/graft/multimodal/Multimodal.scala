package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata — the multimodal
  * column pattern for a training-data pipeline (image/audio/video bytes
  * travel as `binary`; metadata is first-class columns so pruning/filtering
  * never touches the payload).
  */
case class MediaRow(doc_id: Long, format: String, width: Int, height: Int, payload: Array[Byte])

/** Deterministic features extracted by the decode stub. */
case class MediaFeatures(doc_id: Long, format: String, width: Int, height: Int,
                         n_bytes: Int, mean_byte: Double, frames: Int)

/** Multimodal column handling: binary payloads with typed metadata, plus
  * decode / feature-extraction / frame-sampling plumbing.
  *
  * The actual codecs (image/audio libraries) are NOT available in this
  * container, so the decode step is a clearly-marked deterministic STUB
  * (byte statistics stand in for pixel decoding). Everything around it is
  * real and scale-shaped: payloads stay in executors (never collected),
  * metadata predicates prune before any payload is touched, and the decode
  * runs per-partition over iterators — the Scala analog of arrow-batched
  * decode UDFs, swap the stub body for a codec call on a real cluster.
  */
object Multimodal {

  /** Synthesize a media table from `documents` (payload = utf-8 text bytes;
    * metadata derived deterministically from doc_id).
    */
  def mediaTable(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
      (pmod(col("doc_id"), lit(4)) + 1).cast("int")).as("format"),
    (lit(64) + pmod(col("doc_id"), lit(8)) * 64).cast("int").as("width"),
    (lit(64) + pmod(col("doc_id"), lit(4)) * 64).cast("int").as("height"),
    col("text").cast("binary").as("payload"))

  /** STUB decode + feature extraction. A real deployment replaces the map
    * body with a codec invocation (e.g. JPEG decode → channel means); the
    * iterator-per-partition shape, input schema, and output schema are the
    * real contract and do not change.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val bytes = if (m.payload == null) Array.empty[Byte] else m.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
        val frames = if (m.format == "mp4") math.max(1, bytes.length / 16) else 1
        MediaFeatures(m.doc_id, m.format, m.width, m.height, bytes.length, mean, frames)
      }
    }
  }

  /** STUB frame sampling for video payloads: every stride-th 16-byte block
    * stands in for a decoded frame. Native expressions only — the payload is
    * sliced with array functions, no lambda serialization.
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    media.filter(col("format") === "mp4")
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest(floor(length(col("payload")) / (16 * stride)).cast("int") - 1, lit(0))),
          i => substring(col("payload"), (i * (16 * stride) + lit(1)).cast("int"), lit(16)))))
      .withColumnRenamed("pos", "frame_no").withColumnRenamed("col", "frame_bytes")

  /** STUB resize: stride-sample the payload (every factor-th byte) and scale
    * the metadata dims — a real deployment swaps the body for a codec resize;
    * the per-partition iterator shape and schema are the contract.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val bytes = if (m.payload == null) Array.empty[Byte] else m.payload
        val out = new Array[Byte]((bytes.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
        m.copy(width = math.max(1, m.width / factor),
          height = math.max(1, m.height / factor), payload = out)
      }
    }
  }

  /** End-to-end: documents → media table → decoded features (typed). */
  def features(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    decodeFeatures(mediaTable(docs).as[MediaRow])
  }
}
