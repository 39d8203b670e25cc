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

  // ===== real decoders: hand-built fixtures, exact ground truth =====

  private def mediaDF(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("doc_id", "payload")
      .select(col("doc_id"), lit("x").as("modality"),
        octet_length(col("payload")).cast("long").as("byte_len"), col("payload"))

  test("WAV PCM decode: 8-bit and 16-bit, exact sample count and mean") {
    // 8-bit mono: samples 0..9, mean 4.5
    val wav8 = Multimodal.wavHeaderPcm8Mono(10) ++ (0 until 10).map(_.toByte)
    // 16-bit stereo: build header by hand (blockAlign 4, bits 16), samples
    // [-2, -1, 0, 1] → 2 frames, mean -0.5
    val bb = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      .putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
      .put("data".getBytes).putInt(8)
      .putShort(-2).putShort(-1).putShort(0).putShort(1)
    val out = Multimodal.decode(mediaDF(0L -> wav8, 1L -> bb.array()))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(0L).format === "wav" && out(0L).channels === Some(1) &&
      out(0L).sample_rate === Some(8000) && out(0L).n_samples === 10L &&
      out(0L).mean_value === 4.5)
    assert(out(1L).format === "wav" && out(1L).channels === Some(2) &&
      out(1L).sample_rate === Some(44100) && out(1L).n_samples === 2L &&
      out(1L).mean_value === -0.5)
  }

  test("BMP decode: 24-bit with row padding, bottom-up and top-down") {
    // 2×2, 24-bit: rowSize = 8 (6 data + 2 pad). All channel bytes known.
    def bmp(height: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(54 + 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + 16).putInt(0).putInt(54)
        .putInt(40).putInt(2).putInt(height).putShort(1).putShort(24)
        .putInt(0).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
      // row 0: pixels (10,20,30)(40,50,60) + 2 pad; row 1: (1,2,3)(4,5,6)
      bb.put(Array[Byte](10, 20, 30, 40, 50, 60, 0, 0))
        .put(Array[Byte](1, 2, 3, 4, 5, 6, 0, 0))
      bb.array()
    }
    val expected = (10 + 20 + 30 + 40 + 50 + 60 + 1 + 2 + 3 + 4 + 5 + 6) / 12.0
    val out = Multimodal.decode(mediaDF(0L -> bmp(2), 1L -> bmp(-2)))
      .collect().map(d => d.doc_id -> d).toMap
    for (id <- Seq(0L, 1L)) {
      assert(out(id).format === "bmp" && out(id).width === Some(2) &&
        out(id).height === Some(2) && out(id).n_samples === 4L &&
        out(id).mean_value === expected, s"doc $id")
    }
  }

  test("PPM P6 decode: comments in header, exact raster mean") {
    val header = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII")
    val raster = Array[Byte](100, 110, 120, (200 - 256).toByte, 10, 0)
    val out = Multimodal.decode(mediaDF(0L -> (header ++ raster))).collect().head
    assert(out.format === "ppm" && out.width === Some(2) && out.height === Some(1))
    assert(out.n_samples === 2L)
    assert(out.mean_value === (100 + 110 + 120 + 200 + 10 + 0) / 6.0)
  }

  test("resize on WAV payloads is a REAL resample: valid WAV out, decimated frames") {
    // 8-bit mono, samples 0..99 — resize to ~72 bytes → factor 2
    val wav = Multimodal.wavHeaderPcm8Mono(100) ++ (0 until 100).map(_.toByte)
    val media = mediaDF(0L -> wav)
    val thumb = Multimodal.resize(media, targetLen = 72).collect().head.thumb
    // the thumb is itself a decodable WAV: 50 frames at half the rate,
    // samples 0,2,4,…,98 → mean 49
    val d = Multimodal.decode(mediaDF(0L -> thumb)).collect().head
    assert(d.format === "wav" && d.n_samples === 50L &&
      d.sample_rate === Some(4000) && d.mean_value === 49.0)
    // non-WAV payloads keep the stub contract (strictly ≤ targetLen)
    val txt = ("z" * 300).getBytes("UTF-8")
    val t2 = Multimodal.resize(mediaDF(1L -> txt), targetLen = 64).collect().head.thumb
    assert(t2.length <= 64)
  }

  test("decode plans zero exchanges: partition-local at any scale") {
    val wav = Multimodal.wavHeaderPcm8Mono(10) ++ (0 until 10).map(_.toByte)
    val plan = Multimodal.decode(mediaDF(0L -> wav))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  test("malformed media degrade to the unknown fallback, never throw") {
    val truncatedWav = Multimodal.wavHeaderPcm8Mono(100).take(30)  // torn header
    val lyingWav = Multimodal.wavHeaderPcm8Mono(1000) ++ Array[Byte](1, 2)  // declares 1000, has 2
    val nonPcm = {
      val b = Multimodal.wavHeaderPcm8Mono(4) ++ Array[Byte](1, 2, 3, 4)
      b(20) = 85.toByte   // audioFormat := 0x55 (MP3), not PCM
      b
    }
    val badPpm = "P6\n0 5\n255\n".getBytes("US-ASCII")   // zero width
    val plainText = "just some text".getBytes("UTF-8")
    // Int-overflow attacks: a RIFF chunk declaring a ~2^31 size used to
    // wrap `o + 8 + sz` negative and walk past the array; a BMP width
    // near 2^29 used to wrap `24*w` so rowSize=0 defeated the bounds
    // check. Both must degrade, not throw.
    val hugeChunkWav = {
      val bb = java.nio.ByteBuffer.allocate(60)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
        .put("data".getBytes).putInt(0x7FFFFFF4)
      bb.array()
    }
    val hugeWidthBmp = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
        .putInt(40).putInt(0x20000000).putInt(1).putShort(1).putShort(24)
        .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val rows = Multimodal.decode(mediaDF(
        0L -> truncatedWav, 1L -> lyingWav, 2L -> nonPcm,
        3L -> badPpm, 4L -> plainText, 5L -> hugeChunkWav, 6L -> hugeWidthBmp))
      .collect().map(d => d.doc_id -> d).toMap
    rows.values.foreach { d =>
      assert(d.format === "unknown", s"doc ${d.doc_id} decoded as ${d.format}")
    }
    assert(rows(4L).n_samples === plainText.length.toLong)
  }

  test("PPM header attacks: 20-digit dimension and non-whitespace separator are malformed") {
    // 2^64 + 1 wraps a naive Long accumulator to 1 — without the clamp
    // this header reads as a valid 1x1 image
    val wrapPpm = "P6\n18446744073709551617 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    // the single byte after maxval must BE whitespace; 'X' is a
    // spec-invalid separator that blind skipping would accept
    val badSep = "P6\n1 1\n255X".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    // control: the same raster with a legal separator still decodes
    val good = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    val rows = Multimodal.decode(mediaDF(0L -> wrapPpm, 1L -> badSep, 2L -> good))
      .collect().map(d => d.doc_id -> d).toMap
    assert(rows(0L).format === "unknown", "wrapped dimension must not decode")
    assert(rows(1L).format === "unknown", "non-whitespace separator must not decode")
    assert(rows(2L).format === "ppm" && rows(2L).mean_value === 2.0)
  }

  test("WAV resize factor sizes on the DATA chunk, not payload incl. header") {
    // 100 data bytes + 44-byte header. targetLen=50: factor must be
    // ceil(100/50)=2 (50 frames kept) — sizing on the 144-byte payload
    // would over-decimate to factor 3 (34 frames).
    val wav = Multimodal.wavHeaderPcm8Mono(100) ++ (0 until 100).map(_.toByte)
    val thumb = Multimodal.resize(mediaDF(0L -> wav), targetLen = 50)
      .collect().head.thumb
    val d = Multimodal.decode(mediaDF(0L -> thumb)).collect().head
    assert(d.format === "wav" && d.n_samples === 50L, "factor must come from data-chunk length")
    // documented bound: targetLen + 44-byte header + (blockAlign - 1)
    assert(thumb.length <= 50 + 44, s"thumb ${thumb.length} exceeds documented bound")
  }

  private def ppm(w: Int, h: Int, px: Int => Int): Array[Byte] = {
    val hdr = s"P6 $w $h 255\n".getBytes("US-ASCII")
    hdr ++ Array.tabulate(w * h * 3)(i => px(i).toByte)
  }

  test("imageDHash: identical rasters equal; small edits Hamming-close; reversed gradient far") {
    val base = ppm(9, 8, i => (i * 7) % 251)
    // a one-pixel perturbation on a monotone gradient flips at most the
    // two adjacent comparisons — and often none: that robustness IS the
    // perceptual-hash property
    val edited = base.clone()
    edited(base.length - 100) = ((base(base.length - 100) & 0xff) ^ 0x7f).toByte
    val reversed = ppm(9, 8, i => 250 - (i * 7) % 251)
    val rows = Multimodal.imageDHash(mediaDF(1L -> base, 2L -> base.clone(),
        3L -> edited, 4L -> reversed))
      .collect().map(r => r.doc_id -> ((r.dhash_hi, r.dhash_lo))).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(rows(1L) === rows(2L))
    assert(ham(rows(1L), rows(3L)) <= 2, "one-pixel edit must stay Hamming-close")
    assert(ham(rows(1L), rows(4L)) >= 32, "a reversed gradient must flip most bits")
  }

  test("grayGrid: non-identity resize equals a naive block-average reference") {
    val w = 18; val h = 16
    val img = ppm(w, h, i => (i * 13) % 256)
    val Some((pw, ph, off)) = Multimodal.ppmRaster(img)
    assert((pw, ph) === ((w, h)))
    val got = Multimodal.grayGrid(img, w, h, off, tw = 9, th = 8)
    // naive reference: each target cell averages its exact source block
    for (i <- 0 until 8; j <- 0 until 9) {
      val (r0, r1) = (i * h / 8, (i + 1) * h / 8)
      val (c0, c1) = (j * w / 9, (j + 1) * w / 9)
      val vals = for (r <- r0 until r1; c <- c0 until c1) yield {
        val p = off + (r * w + c) * 3
        ((img(p) & 0xff) + (img(p + 1) & 0xff) + (img(p + 2) & 0xff)) / 3
      }
      assert(got(i * 9 + j) === vals.sum / vals.size, s"cell ($i,$j)")
    }
  }

  // ===== baseline JPEG (pure-JVM Huffman + IDCT) =====

  import graft.operators.Jpeg

  test("jpeg: constant 8x8 blocks at quality 100 roundtrip EXACTLY") {
    // DC-only blocks, all-ones quant table: the device the served
    // oracle leans on — decoded pixels must equal the source bytes
    val blocks = Array(0, 1, 17, 128, 200, 254, 255, 73)
    val w = 8 * blocks.length; val h = 8
    val px = Array.tabulate(w * h)(i => blocks((i % w) / 8))
    val enc = Jpeg.encodeGray(px, w, h, quality = 100)
    val dec = Jpeg.decode(enc).get
    assert(dec.width === w && dec.height === h && dec.nComp === 1)
    assert(dec.gray.toSeq === px.toSeq)
  }

  test("jpeg: gray gradient decode agrees with the JDK's independent ImageIO reader (±1)") {
    // ImageIO's JPEG reader is an INDEPENDENT implementation (libjpeg
    // lineage, integer IDCT) — per-pixel agreement within ±1 is the
    // cross-codec contract for a float-IDCT baseline decoder
    val w = 40; val h = 24
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.min(255, 3 * x + 5 * y + ((x * y) % 7))
    }
    val enc = Jpeg.encodeGray(px, w, h, quality = 85)
    val dec = Jpeg.decode(enc).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null, "ImageIO could not parse our encoder's output")
    assert(img.getWidth === w && img.getHeight === h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val ref = img.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(dec.gray(y * w + x) - ref))
    }
    assert(maxDiff <= 1, s"max per-pixel diff vs ImageIO: $maxDiff")
  }

  test("jpeg: 4:4:4 color decode agrees with ImageIO (±2 per channel)") {
    val w = 24; val h = 16
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val c = i % 3
      ((p * (c + 3) * 11) % 200) + 20
    }
    val enc = Jpeg.encodeRgb444(rgb, w, h, quality = 90)
    val dec = Jpeg.decode(enc).get
    assert(dec.nComp === 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val refs = Array((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      for (c <- 0 until 3)
        maxDiff = math.max(maxDiff,
          math.abs(dec.rgb((y * w + x) * 3 + c) - refs(c)))
    }
    assert(maxDiff <= 2, s"max per-channel diff vs ImageIO: $maxDiff")
  }

  test("jpeg: decodes ImageIO-ENCODED subsampled color (the wild-file direction)") {
    // the JDK writer emits 4:2:0 chroma subsampling by default — the
    // dominant wild format; our nearest upsample vs its smooth upsample
    // differ most at chroma edges, so a smooth image + a loose bound
    val w = 32; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + 4 * x; val g = 30 + 4 * y; val b = 60 + 2 * (x + y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val enc = bos.toByteArray
    val dec = Jpeg.decode(enc).getOrElse(
      fail("our decoder rejected a JDK-written baseline JPEG"))
    assert(dec.width === w && dec.height === h && dec.nComp === 3)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val argb = ref.getRGB(x, y)
      val rv = c match { case 0 => (argb >> 16) & 0xff
                         case 1 => (argb >> 8) & 0xff
                         case _ => argb & 0xff }
      val d = math.abs(dec.rgb((y * w + x) * 3 + c) - rv)
      sumDiff += d; maxDiff = math.max(maxDiff, d)
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(meanDiff <= 2.0, s"mean per-channel diff vs ImageIO: $meanDiff")
    assert(maxDiff <= 16, s"max per-channel diff vs ImageIO: $maxDiff")
  }

  test("jpeg: poison payloads return None, never throw") {
    assert(Jpeg.decode(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(Jpeg.decode("not a jpeg at all".getBytes).isEmpty)
    // truncate a valid stream at every 16th byte — all must degrade
    val enc = Jpeg.encodeGray(Array.tabulate(64)(i => i * 4), 8, 8, 90)
    for (cut <- 2 until enc.length by 16)
      assert(Jpeg.decode(enc.take(cut)).isEmpty, s"cut=$cut should be None")
    // progressive-marker stream (SOF2) must be rejected, not garbled
    val prog = enc.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }

  test("jpeg: Multimodal.decode sniffs and decodes jpeg payloads in-line") {
    val px = Array.tabulate(64)(i => (i * 3) % 256)
    val enc = Jpeg.encodeGray(px, 8, 8, quality = 100)
    val media = Seq((7L, "image", enc.length.toLong, enc))
      .toDF("doc_id", "modality", "byte_len", "payload")
    val r = Multimodal.decode(media).collect().head
    assert(r.format === "jpeg")
    assert(r.width === Some(8) && r.height === Some(8))
    assert(r.n_samples === 64L)
    assert(math.abs(r.mean_value - px.sum.toDouble / 64) < 1e-9)
  }
}
