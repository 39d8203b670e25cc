package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` payload columns next to typed metadata,
  * the layout every large-scale multimodal pipeline converges on: Spark
  * moves/filters/joins bytes without interpreting them, and decode happens
  * at the edge inside partition-local batch functions.
  *
  * The decode/feature kernels here are DETERMINISTIC STUBS (this
  * environment ships no image/audio codecs — see the builder contract);
  * every stub is marked `STUB:` and has the exact signature, batching
  * shape, and partitioning a real codec (JNI/FFI or subprocess) would use,
  * so swapping one in changes no plan.
  */
object Multimodal {

  /** A media row: payload + the metadata a real ingester would attach. */
  final case class MediaRow(
      doc_id: Long, modality: String, byte_len: Long, payload: Array[Byte])

  /** Extracted features (fixed-width, schema-stable). */
  final case class MediaFeatures(
      doc_id: Long, modality: String, byte_len: Long,
      mean_byte: Double, n_frames: Int, frame_bytes: Array[Long])

  /** A resized payload row (thumbnail analog). */
  final case class MediaThumb(
      doc_id: Long, modality: String, orig_len: Long, thumb: Array[Byte])

  /** Wrap a text/bytes column as a media payload table. Modality is
    * round-robin by id — synthetic, but exercises the real schema. */
  def asMedia(df: DataFrame, id: String, payloadText: String): DataFrame =
    df.select(
      col(id).cast("long").as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(id) % 3 + 1).cast("int")).as("modality"),
      octet_length(col(payloadText)).cast("long").as("byte_len"),
      encode(col(payloadText), "UTF-8").as("payload"))

  /** STUB: media decode. A real implementation calls the codec here —
    * one invocation per row, inside `mapPartitions`, so a JNI context /
    * subprocess is amortized per PARTITION (the batch shape that matters
    * at scale), never per row. The stub derives deterministic pseudo
    * features from the bytes. */
  private def decodeStub(payload: Array[Byte]): (Double, Int) = {
    // STUB: real codec goes here (e.g. image decode → pixel stats).
    val mean = if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
    val frames = 1 + payload.length / 64   // STUB: pretend 64-byte "frames"
    (mean, frames)
  }

  /** STUB: frame sampling — every `stride`-th 64-byte window's byte sum.
    * Real video path: demux + keyframe index, same output shape. */
  private def sampleFramesStub(payload: Array[Byte], stride: Int): Array[Long] =
    payload.grouped(64).zipWithIndex
      .collect { case (chunk, i) if i % stride == 0 =>
        chunk.map(b => (b & 0xff).toLong).sum }
      .toArray

  /** STUB: resize — byte-domain downsample to ≤ targetLen by averaging
    * fixed-width windows (a real image path decodes, bilinear-resamples,
    * re-encodes; same signature, batching, and output shape). */
  private def resizeStub(payload: Array[Byte], targetLen: Int): Array[Byte] = {
    // STUB: real resample goes here.
    if (payload.length <= targetLen) payload
    else {
      val window = math.ceil(payload.length.toDouble / targetLen).toInt
      payload.grouped(window)
        .map(w => (w.map(b => (b & 0xff).toLong).sum / w.length).toByte)
        .toArray
    }
  }

  /** Resize pass: partition-local like [[extractFeatures]] — the batch
    * shape a JNI/subprocess codec needs (context per partition, row
    * streaming, no shuffle). */
  def resize(media: DataFrame, targetLen: Int = 64): Dataset[MediaThumb] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "modality", "byte_len", "payload").as[MediaRow]
      .mapPartitions { it =>
        // a real decoder would open its codec context once, here
        it.map(r => MediaThumb(r.doc_id, r.modality, r.byte_len,
          resizeStub(r.payload, targetLen)))
      }
  }

  /** Feature extraction over a media table: partition-local, zero-shuffle,
    * iterator-to-iterator (never materializes a partition). */
  def extractFeatures(media: DataFrame, stride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "modality", "byte_len", "payload").as[MediaRow]
      .mapPartitions { it =>
        // a real decoder would open its codec context once, here
        it.map { r =>
          val (mean, frames) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.modality, r.byte_len,
            mean, frames, sampleFramesStub(r.payload, stride))
        }
      }
  }
}
