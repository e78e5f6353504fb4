package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque BINARY
  * columns plus typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as per-partition batch operators.
  *
  * The actual codecs (JPEG/PNG decode, audio resample, video frame
  * extraction) are NOT available in this container, so [[StubCodec]] is
  * a clearly-marked deterministic fake. Everything AROUND the codec —
  * the schema, the binary column handling, the mapPartitions batch
  * shape (one codec init per partition, streamed rows), the feature
  * output layout — is real and tested; swapping in a real codec touches
  * only StubCodec.
  */
object Media {

  /** Typed media row: opaque payload + structured metadata, the schema
    * a 100 TB media lake would use (payload in parquet binary or
    * pointered to object storage; metadata columns for pruning). */
  case class MediaFile(media_id: Long, kind: String, bytes: Array[Byte],
                       width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: String, histogram: Array[Long],
                           thumb_w: Int, thumb_h: Int)

  /** ====== STUB — replace with real codecs when available ======
    * Deterministic fakes standing in for image/audio decoding. The
    * interface (bytes in → pixels/samples out) is what a real codec
    * (e.g. javax.imageio / ffmpeg bindings) would implement. */
  object StubCodec {
    /** "Decode" = the raw bytes themselves (a real impl returns pixel
      * data). Deterministic, so tests can assert exact outputs. */
    def decode(bytes: Array[Byte]): Array[Byte] = bytes

    /** "Resize" = pick target dims, aspect-preserving bound to 64px. */
    def thumbDims(w: Int, h: Int): (Int, Int) = {
      if (w <= 0 || h <= 0) (0, 0)
      else if (w >= h) (64, math.max(1, (64.0 * h / w).toInt))
      else (math.max(1, (64.0 * w / h).toInt), 64)
    }

    /** "Frame sample" = every nth fixed-size chunk of the payload (a
      * real impl samples decoded video frames). */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, everyN: Int): Seq[Array[Byte]] =
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (chunk, i) if i % everyN == 0 => chunk }.toSeq
  }

  /** Per-partition feature extraction: one codec/state init per
    * partition, then a streamed pass over rows — the mapPartitions
    * batch shape that amortizes model/codec startup at scale (the
    * Scala analog of mapInPandas batching). */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // (real impl: initialize codec / model weights HERE, once)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { m =>
        val decoded = StubCodec.decode(m.bytes)
        val hist = new Array[Long](16)
        decoded.foreach(b => hist((b & 0xFF) >> 4) += 1)
        md.reset()
        val checksum = md.digest(decoded).map("%02x".format(_)).mkString
        val (tw, th) = StubCodec.thumbDims(m.width, m.height)
        MediaFeatures(m.media_id, m.kind, decoded.length.toLong, checksum,
          hist, tw, th)
      }
    }
  }

  /** Frame sampling as a Dataset operator (video → exploded frames). */
  def sampleFrames(media: Dataset[MediaFile], frameSize: Int, everyN: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      StubCodec.sampleFrames(m.bytes, frameSize, everyN).zipWithIndex.map {
        case (frame, i) => (m.media_id, i, frame.length, frame)
      }
    }.toDF("media_id", "frame_no", "frame_bytes_len", "frame_bytes")
  }

  // ----------------------- driver oracle query -----------------------
  /** Media features over a binary column synthesized from documents
    * (UTF-8 payload stands in for real media bytes). The SQL-checkable
    * slice: byte length + md5 checksum + a 4-bucket length histogram
    * class; the full mapPartitions path is exercised in MediaSpec. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        lit("text/utf-8").as("kind"),
        col("text").cast("binary").as("bytes"))
      .select(col("media_id"), col("kind"),
        octet_length(col("bytes")).cast("long").as("n_bytes"),
        md5(col("bytes")).as("checksum"),
        expr("cast(octet_length(bytes) div 256 as int)").as("size_class"))

  val mmFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  'text/utf-8' AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS checksum,
      |  CAST(octet_length(encode(text)) // 256 AS INT) AS size_class
      |FROM documents""".stripMargin
}
