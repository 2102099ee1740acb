package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media object: opaque self-describing binary payload keyed by doc_id —
  * the multimodal column pattern for a training-data pipeline (image/audio/
  * video bytes travel as `binary`; everything else is decoded FROM the bytes,
  * so the payload column is the single source of truth exactly like a real
  * JPEG/WAV/MP4 blob would be).
  */
case class MediaRow(doc_id: Long, payload: Array[Byte])

/** Features decoded from a GM1 container (header metadata + body byte stats). */
case class MediaFeatures(doc_id: Long, format: String, width: Int, height: Int,
                         n_bytes: Long, byte_sum: Long, frames: Long)

/** Multimodal column handling: binary payloads in a deterministic container
  * format, plus decode / feature-extraction / frame-sampling plumbing.
  *
  * The payload is a real (if synthetic) container — "GM1":
  * {{{
  *   byte 0-1  magic 0x47 0x4D ("GM")
  *   byte 2    version (0x01)
  *   byte 3    format code 0..3 → png | jpeg | wav | mp4
  *   byte 4    width  / 64
  *   byte 5    height / 64
  *   byte 6+   body: length 32 + doc_id % 97, body[i] = (doc_id*31 + i*17) % 256
  * }}}
  * generated from doc_id alone, so both engines (and the DuckDB oracle) can
  * construct bit-identical blobs and every decode is verifiable end-to-end —
  * q44 is hash-checked against DuckDB's BLOB functions (octet_length, hex,
  * byte extraction), not rows-only.
  *
  * Real image/audio codecs are NOT available in this container, so the
  * "pixel decode" is byte statistics over the body — but the decode path
  * itself is real: header parse + byte extraction from the blob, in two
  * interchangeable implementations (native expressions for codegen'd
  * pipelines; a per-partition typed decoder at the codec boundary, the shape
  * a libjpeg/ffmpeg call drops into). Payloads stay in executors, metadata
  * predicates prune before body bytes are touched.
  */
object Multimodal {

  val Formats: Seq[String] = Seq("png", "jpeg", "wav", "mp4")

  /** Deterministic GM1 blob from an id column — built hex-string-first
    * (`unhex` at the end) so the identical construction is expressible in
    * DuckDB (`unhex(printf ...)`), making every downstream decode
    * oracle-checkable.
    */
  def syntheticPayload(id: Column): Column = {
    val hx2 = (b: Column) => lpad(hex(b.cast("long")), 2, "0")
    val header = concat(lit("474D01"), hx2(pmod(id, lit(4))),
      hx2(pmod(id, lit(8)) + 1), hx2(pmod(id, lit(4)) + 1))
    val bodyLen = (pmod(id, lit(97)) + 32).cast("long")
    val body = array_join(transform(sequence(lit(0L), bodyLen - 1),
      i => hx2(pmod(id * 31 + i * 17, lit(256)))), "")
    unhex(concat(header, body))
  }

  /** Media table: (doc_id, payload) — one GM1 blob per document. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), syntheticPayload(col("doc_id")).as("payload"))

  /** Native-expression decode: header metadata + body byte stats, computed
    * only from the payload bytes (hex round-trip; `substr`/`conv` on the hex
    * string). The hex string is materialized once in its own projection —
    * CollapseProject declines to inline a non-cheap expression referenced
    * many times, so `hex(payload)` is evaluated once per row, not once per
    * consumer (the projection-collapse trap BENCH.md documents).
    *
    * Fully codegen'd; this is the path for expression-shaped pipelines. The
    * typed [[decodeFeatures]] is the same decode at the codec boundary.
    */
  def decode(media: DataFrame): DataFrame = {
    val withHx = media.select(col("doc_id"), col("payload"),
      hex(col("payload")).as("hx"),
      (length(col("payload")) - 6).cast("long").as("n_bytes"))
    val b = (pos: Column) => conv(col("hx").substr(pos, lit(2)), 16, 10).cast("int")
    withHx.select(
      col("doc_id"), col("payload"), col("n_bytes"),
      element_at(array(Formats.map(lit): _*), b(lit(7)) + 1).as("format"),
      (b(lit(9)) * 64).as("width"),
      (b(lit(11)) * 64).as("height"),
      aggregate(sequence(lit(0L), col("n_bytes") - 1), lit(0L),
        (acc, i) => acc + conv(col("hx").substr((i * 2 + 13).cast("int"), lit(2)), 16, 10)
          .cast("long")).as("byte_sum"),
      when(b(lit(7)) === 3,
        greatest(lit(1L), floor(col("n_bytes") / 16).cast("long")))
        .otherwise(lit(1L)).as("frames"))
  }

  /** Typed per-partition decode — the codec boundary. The header parse and
    * byte extraction are a real GM1 decoder; a real deployment swaps the
    * body-stats loop for a codec call (JPEG decode → channel means); the
    * iterator-per-partition shape and schemas are the contract and do not
    * change. Bit-equal to [[decode]] (asserted in NorthStarSpec).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val p = m.payload
        require(p != null && p.length >= 6 &&
          p(0) == 0x47 && p(1) == 0x4d && p(2) == 0x01,
          s"doc ${m.doc_id}: not a GM1 container")
        val fmt = Formats(p(3) & 0xff)
        val width = (p(4) & 0xff) * 64
        val height = (p(5) & 0xff) * 64
        val n = p.length - 6
        var sum = 0L
        var i = 6
        while (i < p.length) { sum += p(i) & 0xff; i += 1 }
        val frames = if (fmt == "mp4") math.max(1L, n / 16L) else 1L
        MediaFeatures(m.doc_id, fmt, width, height, n.toLong, sum, frames)
      }
    }
  }

  /** Frame sampling for video payloads: every stride-th 16-byte body block
    * stands in for a decoded frame. Native expressions only — format is
    * decoded from the header, the body is sliced with `substr`, no lambda
    * serialization; non-video payloads are pruned before any body byte is
    * touched.
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    decode(media).filter(col("format") === "mp4")
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest((col("n_bytes") / (16 * stride)).cast("int") - 1, lit(0))),
          i => col("payload").substr(i * (16 * stride) + 7, lit(16)))))
      .withColumnRenamed("pos", "frame_no").withColumnRenamed("col", "frame_bytes")

  /** Typed resize at the codec boundary: stride-sample the body and rewrite
    * the header's dim bytes — a genuine container rewrite (output is again a
    * valid GM1 blob). A real deployment swaps the sampling loop for a codec
    * resize; the shape and schema are the contract.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val p = m.payload
        val n = p.length - 6
        val outN = (n + factor - 1) / factor
        val out = new Array[Byte](6 + outN)
        System.arraycopy(p, 0, out, 0, 6)
        out(4) = math.max(1, (p(4) & 0xff) / factor).toByte
        out(5) = math.max(1, (p(5) & 0xff) / factor).toByte
        var i = 0
        while (i < outN) { out(6 + i) = p(6 + i * factor); i += 1 }
        m.copy(payload = out)
      }
    }
  }

  /** End-to-end typed pipeline: documents → media table → decoded features. */
  def features(spark: org.apache.spark.sql.SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    decodeFeatures(mediaTable(docs).as[MediaRow])
  }
}
