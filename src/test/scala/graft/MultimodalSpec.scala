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

  test("WAV decode: 24/32-bit PCM, float32/64, EXTENSIBLE wrapper — javax.sound agrees on the layout") {
    import java.nio.{ByteBuffer, ByteOrder}
    // 24-bit stereo PCM: samples ±2^20-ish with sign extension in play
    val s24 = Seq(-1048576, 1048575, -3, 2) // 2 frames
    val b24 = {
      val bb = ByteBuffer.allocate(44 + 6 * 2).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(Multimodal.wavHeaderPcm(2, 48000, 24, 12))
      s24.foreach { v => bb.put((v & 0xff).toByte)
        bb.put(((v >> 8) & 0xff).toByte); bb.put(((v >> 16) & 0xff).toByte) }
      bb.array()
    }
    // 32-bit mono PCM
    val s32 = Seq(Int.MinValue / 2, 7, -7, Int.MaxValue / 2)
    val b32 = {
      val bb = ByteBuffer.allocate(44 + 16).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(Multimodal.wavHeaderPcm(1, 16000, 32, 16))
      s32.foreach(bb.putInt)
      bb.array()
    }
    // float32 mono (format code 3)
    val sf = Seq(-1.5f, 0.25f, 2.75f, 0.5f)
    val bf = {
      val bb = ByteBuffer.allocate(44 + 16).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 16).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16).putShort(3).putShort(1)
        .putInt(8000).putInt(8000 * 4).putShort(4).putShort(32)
        .put("data".getBytes).putInt(16)
      sf.foreach(bb.putFloat)
      bb.array()
    }
    // float64 mono
    val sd = Seq(-0.125, 3.5)
    val bd = {
      val bb = ByteBuffer.allocate(44 + 16).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 16).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16).putShort(3).putShort(1)
        .putInt(8000).putInt(8000 * 8).putShort(8).putShort(64)
        .put("data".getBytes).putInt(16)
      sd.foreach(bb.putDouble)
      bb.array()
    }
    // EXTENSIBLE wrapper resolving to integer PCM 16-bit stereo
    val se = Seq[Short](-100, 300, 5, -5)
    val be = {
      val bb = ByteBuffer.allocate(12 + 8 + 40 + 8 + 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(4 + 48 + 16).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(40)
        .putShort(0xfffe.toShort).putShort(2).putInt(44100)
        .putInt(44100 * 4).putShort(4).putShort(16)
        .putShort(22).putShort(16).putInt(0x3) // cbSize, validBits, mask
        .putShort(1) // SubFormat GUID word: PCM
        .put(Array[Byte](0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
          0x80.toByte, 0x00, 0x00, 0xaa.toByte, 0x00, 0x38, 0x9b.toByte, 0x71))
        .put("data".getBytes).putInt(8)
      se.foreach(bb.putShort)
      bb.array()
    }
    val out = Multimodal.decode(mediaDF(
      0L -> b24, 1L -> b32, 2L -> bf, 3L -> bd, 4L -> be))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(0L).channels === Some(2) && out(0L).n_samples === 2L)
    assert(out(0L).mean_value === s24.map(_.toDouble).sum / 4)
    assert(out(1L).n_samples === 4L)
    assert(out(1L).mean_value === s32.map(_.toDouble).sum / 4)
    assert(out(2L).mean_value === sf.map(_.toDouble).sum / 4)
    assert(out(3L).mean_value === sd.sum / 2)
    assert(out(4L).channels === Some(2) && out(4L).n_samples === 2L &&
      out(4L).mean_value === se.map(_.toDouble).sum / 4)
    // the JDK's INDEPENDENT RIFF parser agrees on every layout field
    for ((bytes, wantCh, wantRate, wantBits) <- Seq(
        (b24, 2, 48000f, 24), (b32, 1, 16000f, 32), (bf, 1, 8000f, 32),
        (bd, 1, 8000f, 64), (be, 2, 44100f, 16))) {
      val af = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes)).getFormat
      assert(af.getChannels === wantCh)
      assert(af.getSampleRate === wantRate)
      assert(af.getSampleSizeInBits === wantBits)
    }
    // float WAVs keep the REAL resample path OFF (the re-encode header
    // mints integer PCM): resize must fall back to the stub, not corrupt
    val thumb = Multimodal.resize(mediaDF(9L -> bf), targetLen = 8)
      .collect().head.thumb
    assert(thumb.length <= 8, "float WAV must take the stub fallback")
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

  test("BMP decode: 8-bit palette, uncompressed AND RLE8 — means match ImageIO exactly") {
    import java.awt.image.BufferedImage
    val w = 27; val h = 11
    val pal = Array.tabulate(64)(i => (i * 37 % 256, i * 91 % 256, i * 53 % 256))
    val icm = new java.awt.image.IndexColorModel(8, 64,
      pal.map(_._1.toByte), pal.map(_._2.toByte), pal.map(_._3.toByte))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      // long horizontal runs so RLE8 genuinely compresses
      img.getRaster.setSample(x, y, 0, ((x / 9) * 3 + y * 5) % 64)
    for (rle <- Seq(false, true)) {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("bmp").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionType(if (rle) "BI_RLE8" else "BI_RGB")
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val enc = bos.toByteArray
      // the device must bite: 8 bits at offset 28, compression at 30
      assert((enc(28) & 0xff) === 8, s"rle=$rle not 8-bit")
      assert((enc(30) & 0xff) === (if (rle) 1 else 0), s"rle=$rle compression")
      val media = Seq((1L, "image", enc.length.toLong, enc))
        .toDF("doc_id", "modality", "byte_len", "payload")
      val r = Multimodal.decode(media).collect().head
      assert(r.format === "bmp", s"rle=$rle")
      assert(r.width === Some(w) && r.height === Some(h))
      // exact ground truth: channel-byte sum from ImageIO's readback
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val argb = ref.getRGB(x, y)
        sum += ((argb >> 16) & 0xff) + ((argb >> 8) & 0xff) + (argb & 0xff)
      }
      assert(math.abs(r.mean_value * (w * h * 3) - sum) < 1e-6,
        s"rle=$rle mean mismatch")
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

  private def hasMarker(b: Array[Byte], m: Int): Boolean =
    b.indices.dropRight(1).exists(i =>
      (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m)

  private def writeProgressiveJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("jpeg: progressive (SOF2) gray — decodes the JDK's own multi-scan output within ±1") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0,
        math.min(255, 3 * x + 5 * y + ((x * y) % 7)))
    val enc = writeProgressiveJpeg(img)
    // the device must bite: an SOF2 marker, and MULTIPLE scans (the
    // whole point of progressive — DC first, AC bands, refinements)
    assert(hasMarker(enc, 0xc2), "JDK writer did not emit SOF2 — test void")
    val nScans = enc.indices.dropRight(1).count(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xda)
    assert(nScans >= 3, s"expected a multi-scan progressive stream, got $nScans")
    val dec = Jpeg.decode(enc).getOrElse(fail("rejected a JDK progressive JPEG"))
    assert(dec.width === w && dec.height === h && dec.nComp === 1)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(dec.gray(y * w + x) - ref.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 1, s"max per-pixel diff vs ImageIO on progressive: $maxDiff")
  }

  test("jpeg: progressive color (SOF2, subsampled) agrees with ImageIO like the baseline bound") {
    val w = 32; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + 4 * x; val g = 30 + 4 * y; val b = 60 + 2 * (x + y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val enc = writeProgressiveJpeg(img)
    assert(hasMarker(enc, 0xc2), "JDK writer did not emit SOF2 — test void")
    val dec = Jpeg.decode(enc).getOrElse(
      fail("rejected a JDK progressive color JPEG"))
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

  test("jpeg: progressive decode is BIT-IDENTICAL to baseline of the same image") {
    // progressive is a different entropy SERIALIZATION of the same
    // quantized coefficients — the JDK writer emits identical DCT data
    // both ways, so our two entropy paths must converge to the same
    // coefficients and (through the shared StrictMath IDCT) the same
    // pixels EXACTLY. No tolerance: any refinement-bit or EOB-run slip
    // shows up as a nonzero diff here.
    for (gray <- Seq(true, false)) {
      val w = 40; val h = 24
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        if (gray) img.getRaster.setSample(x, y, 0,
          math.min(255, 3 * x + 5 * y + ((x * y) % 7)))
        else img.setRGB(x, y, (((x * 13) % 256) << 16) |
          (((y * 29) % 256) << 8) | ((x * y + 3) % 256))
      }
      val prog = writeProgressiveJpeg(img)
      assert(hasMarker(prog, 0xc2))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      val base = bos.toByteArray
      assert(hasMarker(base, 0xc0) && !hasMarker(base, 0xc2))
      val db = Jpeg.decode(base).get
      val dp = Jpeg.decode(prog).get
      if (gray) assert(db.gray.toSeq === dp.gray.toSeq, "gray")
      else assert(db.rgb.toSeq === dp.rgb.toSeq, "color")
    }
  }

  test("jpeg: truncated progressive streams return None, never throw or hang") {
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 24)
      img.getRaster.setSample(x, y, 0, (x * 11 + y * 7) % 256)
    val enc = writeProgressiveJpeg(img)
    assert(Jpeg.decode(enc).nonEmpty) // the base is valid
    for (cut <- 2 until enc.length by 13)
      assert(Jpeg.decode(enc.take(cut)).isEmpty, s"cut=$cut should be None")
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

  // ===== PNG (pure-JVM Inflater + defilter — LOSSLESS, so every
  // cross-check below is EXACT equality, no tolerance) =====

  import graft.operators.Png

  /** Test-local PNG builder: hand-assemble a file from an already-
    * FILTERED raw scanline stream, so tests control every byte the
    * decoder sees (filters, depth, interlace flag, chunk split). */
  private def pngChunk(out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    def w32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    w32(data.length)
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(tb, 0, 4); crc.update(data, 0, data.length)
    w32(crc.getValue.toInt)
  }

  private def mkPng(w: Int, h: Int, colorType: Int, raw: Array[Byte],
      plte: Array[Byte] = null, depth: Int = 8, interlace: Int = 0,
      idatSplit: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
    val ih = java.nio.ByteBuffer.allocate(13)
    ih.putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
    pngChunk(out, "IHDR", ih.array())
    if (plte != null) pngChunk(out, "PLTE", plte)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    val z = bos.toByteArray
    if (idatSplit > 0 && idatSplit < z.length) {
      pngChunk(out, "IDAT", z.take(idatSplit))
      pngChunk(out, "IDAT", z.drop(idatSplit))
    } else pngChunk(out, "IDAT", z)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Forward scanline filter (RFC 2083 §6) — the encoder side of the
    * decoder's defilter, so filter tests assert a true roundtrip. */
  private def filterRow(ft: Int, cur: Array[Int], prev: Array[Int],
      bpp: Int): Array[Byte] = {
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val outRow = new Array[Byte](cur.length + 1)
    outRow(0) = ft.toByte
    for (x <- cur.indices) {
      val left = if (x >= bpp) cur(x - bpp) else 0
      val up = if (prev != null) prev(x) else 0
      val corner = if (prev != null && x >= bpp) prev(x - bpp) else 0
      val pred = ft match {
        case 0 => 0
        case 1 => left
        case 2 => up
        case 3 => (left + up) / 2
        case 4 => paeth(left, up, corner)
      }
      outRow(x + 1) = ((cur(x) - pred) & 0xff).toByte
    }
    outRow
  }

  test("png: encoder→decoder roundtrip is EXACT (gray and RGB)") {
    val w = 23; val h = 9 // non-multiple-of-anything dims
    val gray = Array.tabulate(w * h)(i => (i * 7 + 13) % 256)
    val dg = Png.decode(Png.encodeGray(gray, w, h)).get
    assert(dg.width === w && dg.height === h && dg.nComp === 1)
    assert(dg.gray.toSeq === gray.toSeq)
    val rgb = Array.tabulate(w * h * 3)(i => (i * 31 + 5) % 256)
    val dc = Png.decode(Png.encodeRgb(rgb, w, h)).get
    assert(dc.nComp === 3)
    assert(dc.rgb.toSeq === rgb.toSeq)
  }

  test("png: our encoder's output reads back EXACTLY in the JDK's independent ImageIO reader") {
    val w = 17; val h = 11
    val gray = Array.tabulate(w * h)(i => (i * 41) % 256)
    val gi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encodeGray(gray, w, h)))
    assert(gi != null && gi.getWidth === w && gi.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(gi.getRaster.getSample(x, y, 0) === gray(y * w + x), s"($x,$y)")
    val rgb = Array.tabulate(w * h * 3)(i => (i * 29 + 3) % 256)
    val ci = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encodeRgb(rgb, w, h)))
    assert(ci != null && ci.getWidth === w && ci.getHeight === h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(ci.getRaster.getSample(x, y, c) === rgb((y * w + x) * 3 + c),
        s"($x,$y,$c)")
  }

  test("png: decodes ImageIO-ENCODED gray / RGB / palette / RGBA EXACTLY (the wild-file direction)") {
    import java.awt.image.BufferedImage
    val w = 19; val h = 13
    // color type 0: TYPE_BYTE_GRAY writes an 8-bit grayscale PNG
    val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g.getRaster.setSample(x, y, 0, (x * 13 + y * 7) % 256)
    // color type 2: TYPE_3BYTE_BGR writes truecolor
    val c2 = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      c2.setRGB(x, y, (((x * 11) % 256) << 16) | (((y * 17) % 256) << 8) |
        ((x + y * 3) % 256))
    // color type 3: an explicit IndexColorModel controls the PLTE.
    // >16 entries matters: the JDK writer picks 4-bit depth for tiny
    // palettes, and the decoder's scope is depth 8 only
    val pal = Array.tabulate(200)(i => (i * 37 % 256, i * 91 % 256, i * 53 % 256))
    val icm = new java.awt.image.IndexColorModel(8, 200,
      pal.map(_._1.toByte), pal.map(_._2.toByte), pal.map(_._3.toByte))
    val c3 = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      c3.getRaster.setSample(x, y, 0, (x * 29 + y * 7) % 200)
    // color type 6: TYPE_INT_ARGB (varied alpha — decode drops it)
    val c6 = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val a = 128 + (x + y) % 128 // nonzero: zero-alpha RGB is writer's choice
      c6.setRGB(x, y, (a << 24) | (((y * 23) % 256) << 16) |
        (((x * 19) % 256) << 8) | ((x * y + 7) % 256))
    }
    for ((img, label) <- Seq((g, "gray"), (c2, "rgb"), (c3, "palette"),
        (c6, "rgba"))) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos), label)
      val enc = bos.toByteArray
      val dec = Png.decode(enc).getOrElse(
        fail(s"our decoder rejected a JDK-written $label PNG"))
      assert(dec.width === w && dec.height === h, label)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      for (y <- 0 until h; x <- 0 until w) {
        if (dec.nComp == 1) {
          assert(dec.gray(y * w + x) === ref.getRaster.getSample(x, y, 0),
            s"$label ($x,$y)")
        } else {
          val argb = ref.getRGB(x, y)
          val want = Seq((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
          val got = Seq(dec.rgb((y * w + x) * 3), dec.rgb((y * w + x) * 3 + 1),
            dec.rgb((y * w + x) * 3 + 2))
          assert(got === want, s"$label ($x,$y)")
        }
      }
    }
  }

  test("png: all five scanline filters defilter EXACTLY, cross-checked vs ImageIO") {
    // gray image tall enough that every filter type gets rows with and
    // without an above-neighbor influence; row y uses filter y % 5
    val w = 16; val h = 10; val bpp = 1
    val px = Array.tabulate(w * h)(i => (i * i * 3 + i * 5 + 1) % 256)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val cur = Array.tabulate(w)(x => px(y * w + x))
      val prev = if (y > 0) Array.tabulate(w)(x => px((y - 1) * w + x)) else null
      raw.write(filterRow(y % 5, cur, prev, bpp))
    }
    val enc = mkPng(w, h, colorType = 0, raw.toByteArray)
    val dec = Png.decode(enc).get
    assert(dec.gray.toSeq === px.toSeq)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(ref != null, "ImageIO could not parse the hand-built stream")
    for (y <- 0 until h; x <- 0 until w)
      assert(ref.getRaster.getSample(x, y, 0) === px(y * w + x), s"($x,$y)")
    // and an RGB run (bpp=3: the left/corner neighbor is 3 bytes back)
    val rgb = Array.tabulate(w * h * 3)(i => (i * 7 + 11) % 256)
    val rraw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val cur = Array.tabulate(w * 3)(x => rgb(y * w * 3 + x))
      val prev = if (y > 0) Array.tabulate(w * 3)(x => rgb((y - 1) * w * 3 + x)) else null
      rraw.write(filterRow(y % 5, cur, prev, 3))
    }
    val renc = mkPng(w, h, colorType = 2, rraw.toByteArray)
    assert(Png.decode(renc).get.rgb.toSeq === rgb.toSeq)
    val rref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(renc))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(rref.getRaster.getSample(x, y, c) === rgb((y * w + x) * 3 + c),
        s"($x,$y,$c)")
  }

  test("png: gray+alpha (color type 4) resolves to replicated gray, alpha dropped") {
    val w = 8; val h = 6
    val gray = Array.tabulate(w * h)(i => (i * 43 + 9) % 256)
    val alpha = Array.tabulate(w * h)(i => (i * 67 + 1) % 256)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(0) // filter None
      for (x <- 0 until w) { raw.write(gray(y * w + x)); raw.write(alpha(y * w + x)) }
    }
    val enc = mkPng(w, h, colorType = 4, raw.toByteArray)
    val dec = Png.decode(enc).get
    assert(dec.nComp === 3)
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(dec.rgb(3 * i + c) === gray(i), s"px $i ch $c")
    // ImageIO reads the same stream: its gray band must match ours
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(ref != null)
    for (y <- 0 until h; x <- 0 until w) {
      assert(ref.getRaster.getSample(x, y, 0) === gray(y * w + x), s"($x,$y) gray")
      assert(ref.getRaster.getSample(x, y, 1) === alpha(y * w + x), s"($x,$y) alpha")
    }
  }

  test("png: multiple IDAT chunks concatenate per spec") {
    val w = 12; val h = 12
    val px = Array.tabulate(w * h)(i => (i * 101 + 17) % 256)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(0)
      for (x <- 0 until w) raw.write(px(y * w + x))
    }
    // split the deflate stream mid-way across two IDATs — byte-identical
    // result to the single-chunk file
    val single = mkPng(w, h, 0, raw.toByteArray)
    val split = mkPng(w, h, 0, raw.toByteArray, idatSplit = 10)
    assert(split.length > single.length) // actually two chunks
    val d1 = Png.decode(single).get; val d2 = Png.decode(split).get
    assert(d1.gray.toSeq === px.toSeq)
    assert(d2.gray.toSeq === px.toSeq)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(split))
    for (y <- 0 until h; x <- 0 until w)
      assert(ref.getRaster.getSample(x, y, 0) === px(y * w + x))
  }

  test("png: poison payloads return None, never throw — and never hang") {
    assert(Png.decode(Array.emptyByteArray).isEmpty)
    assert(Png.decode("not a png".getBytes).isEmpty)
    val good = Png.encodeGray(Array.tabulate(64)(i => i * 3), 8, 8)
    assert(Png.decode(good).nonEmpty) // the base is valid
    // truncation at every 7th byte degrades to None
    for (cut <- 8 until good.length by 7)
      assert(Png.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // corrupted IDAT byte → CRC mismatch → None (not garbled pixels)
    val bad = good.clone()
    bad(good.length - 16) = (bad(good.length - 16) ^ 0x5a).toByte
    assert(Png.decode(bad).isEmpty)
    // hostile header: a ~60-byte file claiming 40000×40000 must be
    // rejected by the sample cap BEFORE any allocation
    val huge = mkPng(40000, 40000, 0, Array[Byte](0))
    assert(Png.decode(huge).isEmpty)
    // FDICT zlib header: Inflater stalls needing a preset dictionary no
    // PNG may use — must be malformed-None, not an infinite loop
    // (0x78 0x20: CMF/FLG checksum valid, FDICT bit set)
    val fdict = mkPngRawIdat(8, 8, Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0))
    assert(Png.decode(fdict).isEmpty)
    // unsupported on purpose: 16-bit depth, interlace, filter byte 5,
    // palette image with no PLTE
    val raw = Array.tabulate(8 * 8 + 8)(_ => 0.toByte)
    assert(Png.decode(mkPng(8, 8, 0, raw, depth = 16)).isEmpty)
    assert(Png.decode(mkPng(8, 8, 0, raw, interlace = 1)).isEmpty)
    val badFilter = raw.clone(); badFilter(0) = 5
    assert(Png.decode(mkPng(8, 8, 0, badFilter)).isEmpty)
    assert(Png.decode(mkPng(8, 8, 3, raw)).isEmpty) // type 3, no PLTE
  }

  /** A PNG whose IDAT holds the given bytes VERBATIM (no deflate) —
    * for zlib-header attack payloads. */
  private def mkPngRawIdat(w: Int, h: Int, idat: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
    val ih = java.nio.ByteBuffer.allocate(13)
    ih.putInt(w).putInt(h).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    pngChunk(out, "IHDR", ih.array())
    pngChunk(out, "IDAT", idat)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private val adam7Grid = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Build the Adam7 filtered raw stream for an 8-bit raster; row
    * filter = (pass + row) % 5 so every pass exercises several filter
    * types against its OWN pass-local neighbors. */
  private def adam7Raw(px: Array[Int], w: Int, h: Int, bpp: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (((x0, y0, dx, dy), pi) <- adam7Grid.zipWithIndex) {
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        var prev: Array[Int] = null
        for (py <- 0 until ph) {
          val cur = new Array[Int](pw * bpp)
          for (pxi <- 0 until pw; s <- 0 until bpp)
            cur(pxi * bpp + s) = px(((y0 + py * dy) * w + (x0 + pxi * dx)) * bpp + s)
          out.write(filterRow((pi + py) % 5, cur, prev, bpp))
          prev = cur
        }
      }
    }
    out.toByteArray
  }

  test("png: hand-built Adam7 interlace decodes EXACTLY (all filters per pass), incl. odd sizes") {
    // sizes straddling the 8x8 grid: sub-tile, non-multiples, degenerate
    for ((w, h) <- Seq((1, 1), (3, 3), (5, 5), (8, 8), (13, 11), (17, 6))) {
      val gray = Array.tabulate(w * h)(i => (i * 53 + w * 7 + h) % 256)
      val enc = mkPng(w, h, 0, adam7Raw(gray, w, h, 1), interlace = 1)
      val dec = Png.decode(enc).getOrElse(fail(s"rejected Adam7 ${w}x$h"))
      assert(dec.gray.toSeq === gray.toSeq, s"${w}x$h")
      // ImageIO reads the same interlaced stream — independent agreement
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      assert(ref != null, s"ImageIO rejected the hand-built Adam7 ${w}x$h")
      for (y <- 0 until h; x <- 0 until w)
        assert(ref.getRaster.getSample(x, y, 0) === gray(y * w + x),
          s"${w}x$h ($x,$y)")
    }
    // and an RGB Adam7 run (bppBytes=3 neighbors inside each pass)
    val w = 12; val h = 9
    val rgb = Array.tabulate(w * h * 3)(i => (i * 19 + 7) % 256)
    val enc = mkPng(w, h, 2, adam7Raw(rgb, w, h, 3), interlace = 1)
    assert(Png.decode(enc).get.rgb.toSeq === rgb.toSeq)
  }

  test("png: decodes the JDK writer's OWN Adam7 output (progressive mode) EXACTLY") {
    import java.awt.image.BufferedImage
    val w = 21; val h = 14
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((x * 31) % 256) << 16) | (((y * 41) % 256) << 8) |
        ((x * y + 13) % 256))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val enc = bos.toByteArray
    // the device must bite: IHDR's interlace byte (file offset 28) is 1
    assert((enc(28) & 0xff) === 1, "JDK writer did not emit Adam7 — test void")
    val dec = Png.decode(enc).getOrElse(fail("rejected a JDK Adam7 PNG"))
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      assert(dec.rgb((y * w + x) * 3) === ((argb >> 16) & 0xff), s"($x,$y) r")
      assert(dec.rgb((y * w + x) * 3 + 1) === ((argb >> 8) & 0xff), s"($x,$y) g")
      assert(dec.rgb((y * w + x) * 3 + 2) === (argb & 0xff), s"($x,$y) b")
    }
  }

  test("png: 16-bit depth reduces to the high byte — exactly ImageIO's raster >> 8") {
    import java.awt.image.BufferedImage
    // the JDK's 16-bit gray writer: our 8-bit reduction must equal its
    // 16-bit raster's high byte on every pixel
    val w = 15; val h = 9
    val img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 4099 + y * 257 + 11) % 65536)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val enc = bos.toByteArray
    assert((enc(24) & 0xff) === 16, "JDK writer did not emit depth 16 — test void")
    val dec = Png.decode(enc).getOrElse(fail("rejected a JDK 16-bit PNG"))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    for (y <- 0 until h; x <- 0 until w) {
      assert(dec.gray(y * w + x) === (ref.getRaster.getSample(x, y, 0) >> 8),
        s"($x,$y)")
      assert(dec.gray(y * w + x) === (img.getRaster.getSample(x, y, 0) >> 8),
        s"($x,$y) vs source")
    }
    // hand-built 16-bit RGB with non-trivial filters: the filter
    // distance is bppBytes = 6, and low bytes must not leak into output
    val w2 = 7; val h2 = 5
    val hi = Array.tabulate(w2 * h2 * 3)(i => (i * 37 + 5) % 256)
    val lo = Array.tabulate(w2 * h2 * 3)(i => (i * 101 + 77) % 256)
    val raw = new java.io.ByteArrayOutputStream()
    var prev: Array[Int] = null
    for (y <- 0 until h2) {
      val cur = new Array[Int](w2 * 6)
      for (x <- 0 until w2; s <- 0 until 3) {
        cur(x * 6 + 2 * s) = hi((y * w2 + x) * 3 + s)
        cur(x * 6 + 2 * s + 1) = lo((y * w2 + x) * 3 + s)
      }
      raw.write(filterRow(y % 5, cur, prev, 6))
      prev = cur
    }
    val enc2 = mkPng(w2, h2, 2, raw.toByteArray, depth = 16)
    val dec2 = Png.decode(enc2).getOrElse(fail("rejected hand-built 16-bit RGB"))
    assert(dec2.rgb.toSeq === hi.toSeq)
    // ImageIO agrees on the same bytes (its 16-bit raster >> 8)
    val ref2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc2))
    for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3)
      assert((ref2.getRaster.getSample(x, y, c) >> 8)
        === hi((y * w2 + x) * 3 + c), s"($x,$y,$c)")
    // 16-bit palette is spec-invalid: must be None, not garbled
    val palRaw = Array.tabulate(8 * 8 + 8)(_ => 0.toByte)
    val plte = Array.tabulate(12)(i => (i * 3).toByte)
    assert(Png.decode(mkPng(8, 8, 3, palRaw, plte = plte, depth = 16)).isEmpty)
    // truncated Adam7: cut the interlaced stream at several points
    val g3 = Array.tabulate(13 * 11)(i => i % 256)
    val full = mkPng(13, 11, 0, adam7Raw(g3, 13, 11, 1), interlace = 1)
    for (cut <- 8 until full.length by 23)
      assert(Png.decode(full.take(cut)).isEmpty, s"cut=$cut")
  }

  test("png: Multimodal.decode sniffs and decodes png payloads in-line") {
    val px = Array.tabulate(60)(i => (i * 9 + 2) % 256)
    val enc = Png.encodeGray(px, 12, 5)
    val media = Seq((9L, "image", enc.length.toLong, enc))
      .toDF("doc_id", "modality", "byte_len", "payload")
    val r = Multimodal.decode(media).collect().head
    assert(r.format === "png")
    assert(r.width === Some(12) && r.height === Some(5))
    assert(r.n_samples === 60L)
    assert(math.abs(r.mean_value - px.sum.toDouble / 60) < 1e-9)
  }

  // ===== GIF (pure-JVM LZW + palette — LOSSLESS, exact cross-checks) =====

  import graft.operators.Gif

  test("gif: encoder→decoder roundtrip is EXACT, incl. rasters crossing the CLEAR cadence") {
    // > 250 pixels forces the encoder's mid-stream CLEAR codes and the
    // decoder's dictionary reset handling
    val w = 23; val h = 17 // 391 px
    val px = Array.tabulate(w * h)(i => (i * 7 + 13) % 256)
    val dec = Gif.decode(Gif.encodeGray(px, w, h)).get
    assert(dec.width === w && dec.height === h)
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(dec.rgb(3 * i + c) === px(i), s"px $i ch $c")
  }

  test("gif: our encoder's output reads back EXACTLY in the JDK's independent ImageIO reader") {
    val w = 19; val h = 11
    val px = Array.tabulate(w * h)(i => (i * 41 + 5) % 256)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Gif.encodeGray(px, w, h)))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val v = px(y * w + x)
      assert(((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
        === ((v, v, v)), s"($x,$y)")
    }
  }

  test("gif: decodes ImageIO-ENCODED palette images EXACTLY — sequential AND interlaced") {
    import java.awt.image.BufferedImage
    val w = 21; val h = 13
    // explicit palette so the writer preserves indices verbatim
    val pal = Array.tabulate(64)(i => (i * 37 % 256, i * 91 % 256, i * 53 % 256))
    val icm = new java.awt.image.IndexColorModel(8, 64,
      pal.map(_._1.toByte), pal.map(_._2.toByte), pal.map(_._3.toByte))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 29 + y * 7) % 64)
    def write(progressive: Boolean): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val param = writer.getDefaultWriteParam
      // the JDK GIF writer interlaces by default — force each mode
      param.setProgressiveMode(
        if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
        else javax.imageio.ImageWriteParam.MODE_DISABLED)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    for (progressive <- Seq(false, true)) {
      val enc = write(progressive)
      val dec = Gif.decode(enc).getOrElse(
        fail(s"rejected a JDK GIF (progressive=$progressive)"))
      assert(dec.width === w && dec.height === h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      for (y <- 0 until h; x <- 0 until w) {
        val argb = ref.getRGB(x, y)
        val got = (dec.rgb((y * w + x) * 3), dec.rgb((y * w + x) * 3 + 1),
          dec.rgb((y * w + x) * 3 + 2))
        assert(got === (((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)),
          s"progressive=$progressive ($x,$y)")
      }
    }
    // the interlace device must bite: find the image descriptor and
    // check its interlace flag differs between the two writes
    def interlaceFlag(enc: Array[Byte]): Boolean = {
      var p = 13 + (if ((enc(10) & 0x80) != 0) 3 * (2 << (enc(10) & 7)) else 0)
      while ((enc(p) & 0xff) == 0x21) { // skip extensions
        p += 2
        var len = enc(p) & 0xff
        while (len != 0) { p += 1 + len; len = enc(p) & 0xff }
        p += 1
      }
      assert((enc(p) & 0xff) === 0x2c)
      (enc(p + 9) & 0x40) != 0
    }
    assert(!interlaceFlag(write(false)))
    assert(interlaceFlag(write(true)), "JDK writer did not interlace — test void")
  }

  test("gif: animated stream decodes its FIRST frame, matching ImageIO.read") {
    // hand-build a two-frame stream: our single-frame gray encoder's
    // body plus a second image block with different pixels
    val w = 9; val h = 6
    val f1 = Array.tabulate(w * h)(i => (i * 11 + 3) % 256)
    val f2 = Array.tabulate(w * h)(i => 255 - (i % 256))
    val one = Gif.encodeGray(f1, w, h)
    val two = Gif.encodeGray(f2, w, h)
    // splice: drop frame-1's trailer (last byte), append frame-2's image
    // block (everything between its palette end and its trailer)
    val palEnd = 13 + 3 * 256
    val spliced = one.dropRight(1) ++ two.slice(palEnd, two.length)
    val dec = Gif.decode(spliced).get
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(dec.rgb(3 * i + c) === f1(i), s"first frame px $i")
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(spliced))
    assert(ref != null)
    for (y <- 0 until h; x <- 0 until w)
      assert((ref.getRGB(x, y) & 0xff) === f1(y * w + x), s"($x,$y)")
  }

  test("gif: sub-rect frame composites at (left,top) over the background color") {
    // hand-build: 8×6 canvas, bg index 200, one 3×2 frame at (2,1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(8); w16(6); out.write(0xf7); out.write(200); out.write(0)
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2c); w16(2); w16(1); w16(3); w16(2); out.write(0)
    out.write(8)
    val lzw = new java.io.ByteArrayOutputStream()
    var acc = 0; var nb = 0
    def put(c: Int): Unit = {
      acc |= c << nb; nb += 9
      while (nb >= 8) { lzw.write(acc & 0xff); acc >>>= 8; nb -= 8 }
    }
    put(256); Seq(10, 20, 30, 40, 50, 60).foreach(put); put(257)
    if (nb > 0) lzw.write(acc & 0xff)
    val z = lzw.toByteArray
    out.write(z.length); out.write(z, 0, z.length); out.write(0); out.write(0x3b)
    val enc = out.toByteArray
    val dec = Gif.decode(enc).get
    assert(dec.width === 8 && dec.height === 6)
    def px(x: Int, y: Int) = dec.rgb((y * 8 + x) * 3)
    assert(px(0, 0) === 200) // background
    assert(px(2, 1) === 10 && px(3, 1) === 20 && px(4, 1) === 30)
    assert(px(2, 2) === 40 && px(4, 2) === 60)
    assert(px(5, 1) === 200 && px(2, 3) === 200) // outside the frame
    // ImageIO returns the bare FRAME (it does not composite onto the
    // logical screen) — its 3×2 image must equal our composite at the
    // (left, top) offset
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(ref.getWidth === 3 && ref.getHeight === 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert((ref.getRGB(x, y) & 0xff) === px(2 + x, 1 + y), s"($x,$y)")
  }

  test("gif: poison payloads return None, never throw — and never hang") {
    assert(Gif.decode(Array.emptyByteArray).isEmpty)
    assert(Gif.decode("GIF89a".getBytes).isEmpty)
    assert(Gif.decode("not a gif at all".getBytes).isEmpty)
    val good = Gif.encodeGray(Array.tabulate(64)(i => i * 3), 8, 8)
    assert(Gif.decode(good).nonEmpty)
    for (cut <- 6 until good.length by 11)
      assert(Gif.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // hostile header: huge canvas must be rejected before allocation
    val huge = good.clone()
    huge(6) = 0x40.toByte; huge(7) = 0x9c.toByte // w = 40000
    huge(8) = 0x40.toByte; huge(9) = 0x9c.toByte // h = 40000
    assert(Gif.decode(huge).isEmpty)
    // LZW violation: a code beyond the dictionary is malformed, and a
    // palette index past the table is malformed (64-entry table, idx 99)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(2); w16(1); out.write(0x85) // global table, 64 entries
    out.write(0); out.write(0)
    for (i <- 0 until 64) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2c); w16(0); w16(0); w16(2); w16(1); out.write(0); out.write(8)
    val lzw = new java.io.ByteArrayOutputStream()
    var acc = 0; var nb = 0
    def put(c: Int): Unit = {
      acc |= c << nb; nb += 9
      while (nb >= 8) { lzw.write(acc & 0xff); acc >>>= 8; nb -= 8 }
    }
    put(256); put(99); put(99); put(257) // idx 99 ≥ table size 64
    if (nb > 0) lzw.write(acc & 0xff)
    val z = lzw.toByteArray
    out.write(z.length); out.write(z, 0, z.length); out.write(0); out.write(0x3b)
    assert(Gif.decode(out.toByteArray).isEmpty)
  }

  test("gif: Multimodal.decode sniffs and decodes gif payloads in-line") {
    val px = Array.tabulate(45)(i => (i * 17 + 4) % 256)
    val enc = Gif.encodeGray(px, 9, 5)
    val media = Seq((11L, "image", enc.length.toLong, enc))
      .toDF("doc_id", "modality", "byte_len", "payload")
    val r = Multimodal.decode(media).collect().head
    assert(r.format === "gif")
    assert(r.width === Some(9) && r.height === Some(5))
    assert(r.n_samples === 45L)
    assert(math.abs(r.mean_value - px.sum.toDouble / 45) < 1e-9)
  }

  // ===== TIFF (pure-JVM IFD walk + strip decompression — lossless) =====

  import graft.operators.Tif

  test("tiff: encoder→decoder roundtrip is EXACT; ImageIO reads our output EXACTLY") {
    val w = 19; val h = 7 // odd pixel count exercises the IFD pad byte
    val px = Array.tabulate(w * h)(i => (i * 23 + 9) % 256)
    val enc = Tif.encodeGray(px, w, h)
    val dec = Tif.decode(enc).get
    assert(dec.width === w && dec.height === h && dec.nComp === 1)
    assert(dec.gray.toSeq === px.toSeq)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(ref != null && ref.getWidth === w && ref.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(ref.getRaster.getSample(x, y, 0) === px(y * w + x), s"($x,$y)")
  }

  test("tiff: decodes ImageIO-ENCODED gray and RGB EXACTLY under None/LZW/Deflate/PackBits") {
    import java.awt.image.BufferedImage
    val w = 33; val h = 21 // multiple strips likely; > 1 row per strip
    val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g.getRaster.setSample(x, y, 0, (x * 13 + y * 7) % 256)
    val c = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      c.setRGB(x, y, (((x * 11) % 256) << 16) | (((y * 17) % 256) << 8) |
        ((x + y * 3) % 256))
    for (img <- Seq(g, c); comp <- Seq(None, Some("LZW"), Some("Deflate"),
        Some("PackBits"))) {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      comp match {
        case Some(n) =>
          param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          param.setCompressionType(n)
        case None =>
          param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val enc = bos.toByteArray
      val label = s"${if (img eq g) "gray" else "rgb"}/${comp.getOrElse("none")}"
      val dec = Tif.decode(enc).getOrElse(fail(s"rejected a JDK TIFF: $label"))
      assert(dec.width === w && dec.height === h, label)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      for (y <- 0 until h; x <- 0 until w) {
        if (dec.nComp == 1)
          assert(dec.gray(y * w + x) === ref.getRaster.getSample(x, y, 0),
            s"$label ($x,$y)")
        else for (ch <- 0 until 3)
          assert(dec.rgb((y * w + x) * 3 + ch)
            === ref.getRaster.getSample(x, y, ch), s"$label ($x,$y,$ch)")
      }
    }
  }

  test("tiff: palette photometric, big-endian layout, and white-is-zero inversion") {
    import java.awt.image.BufferedImage
    // palette via the JDK writer (TYPE_BYTE_INDEXED → photometric 3)
    val w = 14; val h = 9
    val pal = Array.tabulate(200)(i => (i * 41 % 256, i * 73 % 256, i * 97 % 256))
    val icm = new java.awt.image.IndexColorModel(8, 200,
      pal.map(_._1.toByte), pal.map(_._2.toByte), pal.map(_._3.toByte))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 31 + y * 11) % 200)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos))
    val enc = bos.toByteArray
    val dec = Tif.decode(enc).getOrElse(fail("rejected a JDK palette TIFF"))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      val got = (dec.rgb((y * w + x) * 3), dec.rgb((y * w + x) * 3 + 1),
        dec.rgb((y * w + x) * 3 + 2))
      assert(got === (((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)),
        s"($x,$y)")
    }
    // big-endian + white-is-zero: hand-build an MM-order gray TIFF with
    // photometric 0 — decoded gray must be the INVERTED raster
    val w2 = 5; val h2 = 3
    val px = Array.tabulate(w2 * h2)(i => (i * 19 + 7) % 256)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Int): Unit = { w16((v >>> 16) & 0xffff); w16(v & 0xffff) }
    out.write('M'); out.write('M'); w16(42)
    val pad = px.length & 1
    w32(8 + px.length + pad)
    px.foreach(v => out.write(v & 0xff))
    if (pad == 1) out.write(0)
    val tags = Seq((256, w2), (257, h2), (258, 8), (259, 1), (262, 0),
      (273, 8), (278, h2), (279, px.length))
    w16(tags.length)
    tags.foreach { case (tag, value) =>
      w16(tag)
      if (tag == 273 || tag == 279) { w16(4); w32(1); w32(value) }
      else { w16(3); w32(1); w16(value); w16(0) }
    }
    w32(0)
    val be = out.toByteArray
    val dbe = Tif.decode(be).getOrElse(fail("rejected hand-built BE TIFF"))
    assert(dbe.gray.toSeq === px.map(255 - _).toSeq)
    val rbe = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(be))
    assert(rbe != null)
    for (y <- 0 until h2; x <- 0 until w2)
      assert(rbe.getRaster.getSample(x, y, 0) === 255 - px(y * w2 + x), s"($x,$y)")
  }

  test("tiff: poison payloads return None, never throw") {
    assert(Tif.decode(Array.emptyByteArray).isEmpty)
    assert(Tif.decode("II*".getBytes).isEmpty)
    assert(Tif.decode("not a tiff".getBytes).isEmpty)
    val good = Tif.encodeGray(Array.tabulate(64)(i => i * 2), 8, 8)
    assert(Tif.decode(good).nonEmpty)
    for (cut <- 4 until good.length by 9)
      assert(Tif.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // hostile dims: reject before allocation (tags 256/257 at 40000)
    val huge = Tif.encodeGray(Array.tabulate(4)(identity), 2, 2)
    // find the IFD and patch width/height SHORT values
    val ifd = ((huge(4) & 0xff) | ((huge(5) & 0xff) << 8) |
      ((huge(6) & 0xff) << 16) | ((huge(7) & 0xff) << 24))
    for (t <- 0 until 8) {
      val o = ifd + 2 + 12 * t
      val tag = (huge(o) & 0xff) | ((huge(o + 1) & 0xff) << 8)
      if (tag == 256 || tag == 257) {
        huge(o + 8) = 0x40.toByte; huge(o + 9) = 0x9c.toByte // 40000
      }
    }
    assert(Tif.decode(huge).isEmpty)
  }

  test("tiff: Multimodal.decode sniffs and decodes tiff payloads in-line") {
    val px = Array.tabulate(40)(i => (i * 21 + 6) % 256)
    val enc = Tif.encodeGray(px, 8, 5)
    val media = Seq((13L, "image", enc.length.toLong, enc))
      .toDF("doc_id", "modality", "byte_len", "payload")
    val r = Multimodal.decode(media).collect().head
    assert(r.format === "tiff")
    assert(r.width === Some(8) && r.height === Some(5))
    assert(r.n_samples === 40L)
    assert(math.abs(r.mean_value - px.sum.toDouble / 40) < 1e-9)
  }

  // ------------------------------------------------------------- FLAC
  import graft.operators.Flac

  test("flac: encoder→decoder roundtrip is EXACT across waveforms, sizes, bps") {
    val rnd = new scala.util.Random(0xf1ac)
    val shapes: Seq[(String, Int => Array[Int])] = Seq(
      ("const", n => Array.fill(n)(123)),
      ("ramp", n => Array.tabulate(n)(i => i * 3 - 50)),          // fixed-1/2 wins
      ("rand", n => Array.fill(n)(rnd.nextInt(256) - 128)),       // verbatim-ish
      ("sine", n => Array.tabulate(n)(i => (1000 * math.sin(i * 0.1)).toInt)),
      ("steps", n => Array.tabulate(n)(i => (i / 7) * 100)),
      ("text", n => Array.tabulate(n)(i => (i * 37 + 11) % 95 + 32)))
    for ((nm, f) <- shapes; n <- Seq(1, 2, 15, 16, 17, 100, 5000);
         bps <- Seq(8, 16)) {
      val lim = 1 << (bps - 1)
      val src = f(n).map(v => math.max(-lim, math.min(lim - 1, v)))
      val enc = Flac.encodeMono(src, 8000, bps, blockSize = 64)
      val d = Flac.decode(enc).getOrElse(fail(s"$nm n=$n bps=$bps: decode failed"))
      assert(d.samples.toSeq === src.toSeq, s"$nm n=$n bps=$bps")
      assert(d.channels === 1 && d.bps === bps && d.sampleRate === 8000)
    }
  }

  test("flac: all four stereo layouts (independent + 3 decorrelations) roundtrip EXACTLY") {
    val rnd = new scala.util.Random(0x57e5e0)
    for (mode <- Seq(0, 8, 9, 10); n <- Seq(1, 33, 500)) {
      val src = Array.fill(n * 2)(rnd.nextInt(65536) - 32768)
      val enc = Flac.encodeStereo(src, 44100, 16, blockSize = 128, stereoMode = mode)
      val d = Flac.decode(enc).getOrElse(fail(s"mode=$mode n=$n: decode failed"))
      assert(d.samples.toSeq === src.toSeq, s"mode=$mode n=$n")
      assert(d.channels === 2)
    }
  }

  test("flac: fixed predictors + rice actually engage — smooth signal compresses") {
    // not just a verbatim container: a smooth 16-bit signal must come
    // out far below raw size, and still decode EXACTLY
    val smooth = Array.tabulate(8000)(i => (3000 * math.sin(i * 0.01)).toInt)
    val enc = Flac.encodeMono(smooth, 8000, 16)
    assert(enc.length < smooth.length * 2 * 0.4,
      s"no compression: ${enc.length} vs raw ${smooth.length * 2}")
    assert(Flac.decode(enc).get.samples.toSeq === smooth.toSeq)
  }

  /** Test-local MSB-first bit writer for hand-building decoder-only
    * feature streams (LPC, escape partitions, wasted bits). */
  private final class Bw {
    val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def put(bits: Int, v: Long): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (n > 0) put(8 - n, 0L)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** Hand-build a complete one-frame mono FLAC stream around the given
    * subframe-writer (which sees the block size). */
  private def mkFlac(blockSize: Int, bps: Int, subframe: Bw => Unit): Array[Byte] = {
    val head = new java.io.ByteArrayOutputStream()
    head.write('f'); head.write('L'); head.write('a'); head.write('C')
    val si = new Bw
    si.put(16, blockSize); si.put(16, blockSize)
    si.put(24, 0); si.put(24, 0)
    si.put(20, 8000); si.put(3, 0); si.put(5, bps - 1)
    si.put(36, blockSize)
    for (_ <- 0 until 16) si.put(8, 0)
    val siB = si.bytes
    head.write(0x80); head.write(0); head.write(0); head.write(siB.length)
    head.write(siB, 0, siB.length)
    val fh = new Bw
    fh.put(14, 0x3ffe); fh.put(1, 0); fh.put(1, 0)
    fh.put(4, 7); fh.put(4, 0)          // 16-bit bs follows; rate from SI
    fh.put(4, 0)                          // mono
    fh.put(3, bps match { case 8 => 1; case 16 => 4; case _ => 0 })
    fh.put(1, 0)
    fh.put(8, 0)                          // frame number 0
    fh.put(16, blockSize - 1)
    val fhB = fh.bytes
    val body = new Bw
    fhB.foreach(x => body.put(8, x & 0xff))
    body.put(8, Flac.crc8(fhB, 0, fhB.length))
    subframe(body)
    body.align()
    val bodyB = body.bytes
    val full = new Bw
    bodyB.foreach(x => full.put(8, x & 0xff))
    full.put(16, Flac.crc16(bodyB, 0, bodyB.length))
    head.write(full.bytes, 0, full.bytes.length)
    head.toByteArray
  }

  test("flac: hand-built LPC subframe decodes to the spec recurrence exactly") {
    // order-2 LPC, precision 6, shift 4, coefs (30, -14): the decoder
    // must reproduce x[i] = res[i] + ((30·x[i-1] − 14·x[i-2]) >> 4)
    val bs = 32; val coefs = Array(30, -14); val shift = 4
    val warm = Array(100, 103)
    val res = Array.tabulate(bs - 2)(i => (i % 7) - 3)
    val enc = mkFlac(bs, 16, { w =>
      w.put(1, 0); w.put(6, 32 + 1)      // LPC, order 2 (code 100001)
      w.put(1, 0)                          // no wasted bits
      warm.foreach(v => w.put(16, v.toLong & 0xffff))
      w.put(4, 6 - 1)                      // precision 6
      w.put(5, shift.toLong & 0x1f)
      coefs.foreach(c => w.put(6, c.toLong & 0x3f))
      w.put(2, 0); w.put(4, 0)            // rice method 0, partition order 0
      w.put(4, 3)                          // rice param 3
      res.foreach { v =>
        val u = ((v.toLong << 1) ^ (v.toLong >> 63))
        w.put(((u >>> 3) + 1).toInt, 1L)  // q zeros + stop bit
        w.put(3, u & 7)
      }
    })
    val want = new Array[Int](bs)
    want(0) = 100; want(1) = 103
    for (i <- 2 until bs)
      want(i) = res(i - 2) + ((30L * want(i - 1) - 14L * want(i - 2)) >> 4).toInt
    val d = Flac.decode(enc).getOrElse(fail("LPC stream rejected"))
    assert(d.samples.toSeq === want.toSeq)
  }

  test("flac: escape (raw) partitions and wasted bits decode per spec") {
    // verbatim-coded residual partition (escape param) under fixed-0,
    // plus a wasted-bits subframe: both decoder-only paths
    val bs = 16
    val vals = Array.tabulate(bs)(i => i * 5 - 40)
    val escEnc = mkFlac(bs, 16, { w =>
      w.put(1, 0); w.put(6, 8)            // FIXED order 0
      w.put(1, 0)
      w.put(2, 0); w.put(4, 0)            // method 0, po 0
      w.put(4, 15)                          // ESCAPE
      w.put(5, 9)                           // raw 9-bit residuals
      vals.foreach(v => w.put(9, v.toLong & 0x1ff))
    })
    assert(Flac.decode(escEnc).get.samples.toSeq === vals.toSeq)
    // wasted bits: constant subframe, 1 wasted bit → value << 1
    val wastedEnc = mkFlac(bs, 16, { w =>
      w.put(1, 0); w.put(6, 0)            // CONSTANT
      w.put(1, 1); w.put(1, 1)            // wasted flag; unary 0 → wasted=1
      w.put(15, 21L)                        // eff bps = 15
    })
    assert(Flac.decode(wastedEnc).get.samples.toSeq === Array.fill(bs)(42).toSeq)
  }

  test("flac: poison payloads return None, never throw — and never hang") {
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
    assert(Flac.decode("not a flac".getBytes).isEmpty)
    val src = Array.tabulate(100)(i => (i * 37 + 11) % 95 + 32)
    val good = Flac.encodeMono(src, 8000, 16, blockSize = 32)
    assert(Flac.decode(good).nonEmpty)
    // truncation at every 7th byte degrades to None
    for (cut <- 4 until good.length by 7)
      assert(Flac.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // corrupted frame byte → CRC mismatch → None (not wrong samples)
    val bad = good.clone()
    bad(good.length - 9) = (bad(good.length - 9) ^ 0x5a).toByte
    assert(Flac.decode(bad).isEmpty)
    // hostile stream: a small file whose repeated cheap frames claim
    // ~400M samples must trip the cap, not allocate per its headers
    val one = Flac.encodeMono(Array.fill(65535)(7), 8000, 16, blockSize = 65535)
    val siLen = 4 + 4 + 34
    val frame = one.drop(siLen)
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(one, 0, siLen)
    for (_ <- 0 until 3000) bomb.write(frame, 0, frame.length)
    val t0 = System.nanoTime()
    assert(Flac.decode(bomb.toByteArray).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 10.0, "cap must trip fast")
  }

  test("flac: Multimodal.decode sniffs and decodes flac payloads in-line") {
    val px = Array.tabulate(48)(i => (i * 21 + 6) % 256)
    val enc = Flac.encodeMono(px, 8000, 16)
    val media = Seq((14L, "audio", enc.length.toLong, enc))
      .toDF("doc_id", "modality", "byte_len", "payload")
    val r = Multimodal.decode(media).collect().head
    assert(r.format === "flac")
    assert(r.channels === Some(1) && r.sample_rate === Some(8000))
    assert(r.n_samples === 48L)
    assert(math.abs(r.mean_value - px.sum.toDouble / 48) < 1e-9)
  }
}
