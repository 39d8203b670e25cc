package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "abc"),                 // 3 bytes
    (1L, "A" * 64),              // exactly one frame
    (2L, "B" * 130)              // three frames (64+64+2)
  ).toDF("doc_id", "text")

  test("asMedia: payload bytes, length, modality round-robin") {
    val m = Multimodal.asMedia(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(m.map(_.getAs[String]("modality")).toSeq === Seq("image", "audio", "video"))
    assert(m.map(_.getAs[Long]("byte_len")).toSeq === Seq(3L, 64L, 130L))
    assert(new String(m(0).getAs[Array[Byte]]("payload"), "UTF-8") === "abc")
  }

  test("extractFeatures: deterministic stub features, partition-local") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(m, stride = 1).collect().sortBy(_.doc_id)
    assert(f(0).mean_byte === ('a' + 'b' + 'c').toDouble / 3)
    assert(f(0).n_frames === 1)     // 1 + 3/64
    assert(f(2).n_frames === 3)     // 1 + 130/64
    assert(f(1).frame_bytes.toSeq === Seq(65L * 64))
    assert(f(2).frame_bytes.toSeq === Seq(66L * 64, 66L * 64, 66L * 2))
  }

  test("frame sampling stride skips frames") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(m, stride = 2).collect().sortBy(_.doc_id)
    assert(f(2).frame_bytes.toSeq === Seq(66L * 64, 66L * 2)) // frames 0 and 2
  }

  test("resize stub: bounded length, identity for small payloads, deterministic") {
    import graft.operators.Multimodal
    val media = Multimodal.asMedia(
      Seq((1L, "x" * 300), (2L, "tiny")).toDF("doc_id", "text"), "doc_id", "text")
    val thumbs = Multimodal.resize(media, targetLen = 64)
      .collect().map(t => t.doc_id -> t).toMap
    assert(thumbs(1L).thumb.length <= 64 && thumbs(1L).orig_len === 300L)
    assert(thumbs(2L).thumb.toSeq === "tiny".getBytes("UTF-8").toSeq) // small → identity
    val again = Multimodal.resize(media, targetLen = 64)
      .collect().map(t => t.doc_id -> t.thumb.toSeq).toMap
    assert(again(1L) === thumbs(1L).thumb.toSeq)
  }

  test("empty payload does not divide by zero") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(
      Multimodal.asMedia(empty, "doc_id", "text")).collect()
    assert(f.head.mean_byte === 0.0)
    assert(f.head.n_frames === 1)
  }
}
