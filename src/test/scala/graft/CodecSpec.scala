package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Flac, Gif, Jpeg, Multimodal, Png, Tif}

/** Adversarial hardening for the pure-JVM codec family beyond the
  * per-format fixtures in MultimodalSpec: seeded random roundtrip
  * sweeps (lossless codecs must be EXACT at every size, not just the
  * hand-picked ones) and a mutation fuzz that drives corrupted payloads
  * through the REAL serving entry — `Multimodal.decode`'s sniff chain —
  * asserting the poison contract operationally: every row comes back,
  * no exception, no hang, no executor loss. */
class CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lossless codecs: seeded random rasters roundtrip EXACTLY at 40 random sizes") {
    val rnd = new scala.util.Random(0x5eed)
    for (_ <- 0 until 40) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(24)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val dPng = Png.decode(Png.encodeGray(px, w, h)).get
      assert(dPng.gray.toSeq === px.toSeq, s"png ${w}x$h")
      val dGif = Gif.decode(Gif.encodeGray(px, w, h)).get
      for (i <- 0 until w * h)
        assert(dGif.rgb(3 * i) === px(i), s"gif ${w}x$h px $i")
      val dTif = Tif.decode(Tif.encodeGray(px, w, h)).get
      assert(dTif.gray.toSeq === px.toSeq, s"tiff ${w}x$h")
      // RGB variants on the two codecs with color encoders
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256))
      assert(Png.decode(Png.encodeRgb(rgb, w, h)).get.rgb.toSeq === rgb.toSeq,
        s"png rgb ${w}x$h")
      // FLAC (audio lossless): random 16-bit samples, random block split
      val au = Array.fill(w * h)(rnd.nextInt(65536) - 32768)
      val blk = 1 + rnd.nextInt(au.length)
      val dFlac = Flac.decode(Flac.encodeMono(au, 8000, 16, blockSize = blk)).get
      assert(dFlac.samples.toSeq === au.toSeq, s"flac n=${au.length} blk=$blk")
    }
    // JPEG's exact contract is the quality-100 constant-block device:
    // random CONSTANT 8×8 blocks roundtrip exactly at random grid sizes
    for (_ <- 0 until 10) {
      val bw = 1 + rnd.nextInt(8); val bh = 1 + rnd.nextInt(4)
      val blocks = Array.fill(bw * bh)(rnd.nextInt(256))
      val w = bw * 8; val h = bh * 8
      val px = Array.tabulate(w * h) { i =>
        val x = (i % w) / 8; val y = (i / w) / 8
        blocks(y * bw + x)
      }
      val dec = Jpeg.decode(Jpeg.encodeGray(px, w, h, quality = 100)).get
      assert(dec.gray.toSeq === px.toSeq, s"jpeg ${bw}x$bh blocks")
    }
  }

  test("mutation fuzz: corrupted payloads of every format survive the sniff chain") {
    // the operational poison contract: mutate REAL payloads (bit flips
    // and truncations) and push ALL of them through Multimodal.decode in
    // one job — every row must return (decoded or 'unknown'), nothing
    // may throw, and the job must finish (no decoder hang)
    val rnd = new scala.util.Random(0xf0220)
    val text = Array.tabulate(100)(i => ((i * 37 + 11) % 95 + 32))
    val bases: Seq[Array[Byte]] = Seq(
      Png.encodeGray(text, 100, 1),
      Gif.encodeGray(text, 100, 1),
      Tif.encodeGray(text, 100, 1),
      Jpeg.encodeGray(Array.tabulate(8 * 128)(i => text(((i % 128) / 8) % 100)),
        128, 8, quality = 90),
      Multimodal.wavHeaderPcm8Mono(100) ++ text.map(_.toByte),
      Flac.encodeMono(text, 8000, 16, blockSize = 32),
      graft.operators.Pcm.wavG711(text, ulaw = true),
      graft.operators.Pcm.wavG711(text, ulaw = false),
      graft.operators.Pcm.wavAdpcmOracleBlocks(text.take(16)))
    val mutated = for {
      (base, bi) <- bases.zipWithIndex
      trial <- 0 until 300
    } yield {
      val m = base.clone()
      if (trial % 3 == 2) {
        // truncation at a random point
        m.take(1 + rnd.nextInt(m.length - 1))
      } else {
        // 1-4 random byte flips
        for (_ <- 0 to rnd.nextInt(4))
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        m
      }
    }
    val rows = mutated.zipWithIndex.map { case (p, i) =>
      (i.toLong, "image", p.length.toLong, p)
    }
    val media = rows.toDF("doc_id", "modality", "byte_len", "payload")
      .repartition(8) // spread across tasks: a throw would fail the JOB
    val out = Multimodal.decode(media).collect()
    assert(out.length === mutated.length,
      "every poisoned row must produce exactly one output row")
    // the corpus must be a real mix: some mutations survive as valid
    // decodes, some degrade — both paths exercised
    val formats = out.map(_.format).toSet
    assert(formats.contains("unknown"), s"no mutation degraded: $formats")
    assert(formats.exists(_ != "unknown"), s"every mutation degraded: $formats")
  }

  test("mutation fuzz: direct decoder calls never throw on cross-format payloads") {
    // feed each format's (clean) bytes to every OTHER decoder — the
    // misrouting case a corrupted magic number produces
    val text = Array.tabulate(64)(i => (i * 29 + 7) % 256)
    val payloads = Seq(
      Png.encodeGray(text, 8, 8), Gif.encodeGray(text, 8, 8),
      Tif.encodeGray(text, 8, 8), Jpeg.encodeGray(text, 8, 8, 90),
      Multimodal.wavHeaderPcm8Mono(64) ++ text.map(_.toByte))
    for (p <- payloads) {
      Png.decode(p); Gif.decode(p); Tif.decode(p); Jpeg.decode(p)
      // completing without a throw IS the assertion
    }
    succeed
  }
}
