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
  * Two decode tiers:
  *  - [[decode]] REALLY decodes the public formats implementable in
  *    plain JVM byte math with no codec library — WAV/PCM audio (RIFF),
  *    uncompressed 24-bit BMP, binary PPM (P6), baseline JPEG
  *    ([[Jpeg]]: full Huffman entropy decode + dequant + IDCT,
  *    baseline AND progressive, grayscale/4:4:4/4:2:2/4:2:0, restart
  *    markers), PNG ([[Png]]: JDK-Inflater zlib + all five scanline
  *    filters + palette, both non-interlaced and Adam7-interlaced,
  *    depths 8 and 16), GIF ([[Gif]]: LZW + palette, interlace, first
  *    frame), baseline TIFF ([[Tif]]: IFD walk, strips,
  *    none/LZW/deflate/PackBits, predictor, gray/RGB/palette, both
  *    byte orders) — the four most common raster formats — FLAC
  *    ([[Flac]]: rice residuals, fixed/LPC predictors, stereo
  *    decorrelation, CRC-verified frames), lossless compressed audio,
  *    and the compressed TELEPHONY codecs ([[Pcm]]): G.711 µ-law/A-law
  *    companding and IMA/DVI ADPCM (WAVE tags 7/6/0x11).
  *  - Formats needing an external codec (MP3/H.264…) fall back to the
  *    DETERMINISTIC STUB kernels; every stub is marked `STUB:` and has
  *    the exact signature, batching shape, and partitioning a real
  *    codec (JNI/FFI or subprocess) would use, so swapping one in
  *    changes no plan.
  *
  * ==MP3/H.264: OUT OF SCOPE, permanently (decided r16)==
  * The stub tier is the FINAL answer for perceptual entropy codecs,
  * not a pending item. Rationale: the codec layer exists to prove the
  * ENGINE-side semantics — container sniffing, partition-local decode
  * batching, poison containment, md5-pinned decode oracles — and ten
  * shipped from-spec decoders (WAV/PCM variants, BMP, PPM, baseline +
  * progressive JPEG, PNG, GIF, TIFF, FLAC, G.711, ADPCM) already prove
  * every one of those properties across both raster and audio entropy
  * coding. A pure-JVM MPEG-1 Layer III or H.264 decoder adds hundreds
  * of lines of psychoacoustic-filterbank/CABAC table work while
  * exercising ZERO new distributed-engine behavior; and in production
  * these formats ride a subprocess/JNI codec (the ffmpeg reality)
  * whose integration contract — signature, per-partition batching,
  * degrade-don't-throw — the stubs pin exactly. Delivering them would
  * be codec engineering, not engine engineering.
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
    * streaming, no shuffle). WAV payloads take the REAL path
    * ([[resampleWavToTarget]]: decimate frames by ⌈dataLen/target⌉, emit
    * a VALID lower-rate WAV — which keeps its 44-byte header and rounds
    * frames up, so a WAV thumb may exceed `targetLen` by up to the
    * header size plus one frame, i.e. 44 + blockAlign − 1 bytes);
    * everything else falls back to the byte-domain [[resizeStub]]
    * thumbnail (strictly ≤ targetLen). */
  def resize(media: DataFrame, targetLen: Int = 64): Dataset[MediaThumb] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "modality", "byte_len", "payload").as[MediaRow]
      .mapPartitions { it =>
        // a real decoder would open its codec context once, here
        it.map { r =>
          val p = if (r.payload == null) Array.emptyByteArray else r.payload
          val thumb =
            if (p.length <= targetLen) p
            else resampleWavToTarget(p, targetLen)
              .getOrElse(resizeStub(p, targetLen))
          MediaThumb(r.doc_id, r.modality, r.byte_len, thumb)
        }
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

  // ===== real decode: container-free formats, pure byte math =====

  /** One decoded media row. Audio fields are null for images and vice
    * versa; `format = "unknown"` rows carry the stub fallback (mean over
    * raw bytes, n_samples = byte length). */
  final case class MediaDecoded(
      doc_id: Long, format: String,
      channels: Option[Int], sample_rate: Option[Int],
      width: Option[Int], height: Option[Int],
      n_samples: Long, mean_value: Double)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def ascii(b: Array[Byte], o: Int, n: Int): String =
    new String(b, o, n, "US-ASCII")

  /** Raw RIFF/WAVE chunk walk: (format, channels, rate, bits,
    * blockAlign, dataOffset, dataLen) with the WAVE_FORMAT_EXTENSIBLE
    * wrapper (0xFFFE) resolved to its SubFormat code — no format-code
    * whitelist (callers filter). None on anything malformed/truncated. */
  private def wavChunks(b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int, Int)] = {
    if (b.length < 44 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      return None
    var o = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // (format, ch, rate, bits, blockAlign)
    var data: Option[(Int, Int)] = None               // (offset, len)
    while (o + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = ascii(b, o, 4); val sz = le32(b, o + 4)
      // bounds math in LONG: a crafted 2 GB-ish declared size overflows
      // Int and would walk o past the array (a crash, not a fallback)
      if (sz < 0 || o.toLong + 8 + sz > b.length) return None   // torn chunk
      if (id == "fmt " && sz >= 16) {
        var code = le16(b, o + 8)
        if (code == 0xfffe) {
          // EXTENSIBLE: the real code is the SubFormat GUID's first word
          // (fmt is 40 bytes: 16 base + cbSize(2) + validBits(2) +
          // channelMask(4) + GUID at +24 from the fmt body)
          if (sz < 40) return None
          code = le16(b, o + 8 + 24)
        }
        fmt = Some((code, le16(b, o + 10), le32(b, o + 12), le16(b, o + 22),
          le16(b, o + 20)))
      } else if (id == "data") data = Some((o + 8, sz))
      o += 8 + sz + (sz & 1)                             // chunks are word-aligned
    }
    for { (code, ch, rate, bits, ba) <- fmt; (off, len) <- data }
      yield (code, ch, rate, bits, ba, off, len)
  }

  /** Parsed UNCOMPRESSED WAV layout: (format, channels, rate, bits,
    * dataOffset, dataLen) where format is 1 (integer PCM) or 3 (IEEE
    * float). None on anything malformed, truncated, or compressed
    * (compressed codes route through [[wavCompressedDecode]]). */
  private def wavParse(b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] =
    wavChunks(b).collect {
      case (code, ch, rate, bits, _, off, len)
        if ch > 0 && len % (ch * bits / 8).max(1) == 0 &&
          ((code == 1 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
           (code == 3 && (bits == 32 || bits == 64))) =>
        (code, ch, rate, bits, off, len)
    }

  /** COMPRESSED-WAV decode: G.711 µ-law (format tag 7) / A-law (6) at
    * 8 bits — each data byte expands through the public companding
    * formulas ([[Pcm]]) — and IMA/DVI ADPCM (0x11) at 4 bits, the
    * block-structured adaptive-delta state machine. Mean over the
    * decoded LINEAR samples (the codec's value domain), n_samples =
    * per-channel frames; format names the codec so corpus queries can
    * pin which decoder really ran. */
  private[operators] def wavCompressedDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] =
    wavChunks(b).flatMap {
      case (code, ch, rate, 8, _, off, len)
        if (code == 6 || code == 7) && ch > 0 && len % ch == 0 =>
        var s = 0.0
        var i = 0
        while (i < len) {
          val c = b(off + i) & 0xff
          s += (if (code == 7) Pcm.ulawToLinear(c) else Pcm.alawToLinear(c))
          i += 1
        }
        Some(MediaDecoded(doc, "g711", Some(ch), Some(rate), None, None,
          len.toLong / ch, if (len == 0) 0.0 else s / len))
      case (0x11, ch, rate, 4, blockAlign, off, len) =>
        Pcm.imaDecode(b, off, len, ch, blockAlign).map { samples =>
          var s = 0.0
          var i = 0
          while (i < samples.length) { s += samples(i); i += 1 }
          MediaDecoded(doc, "adpcm", Some(ch), Some(rate), None, None,
            samples.length.toLong / ch,
            if (samples.isEmpty) 0.0 else s / samples.length)
        }
      case _ => None
    }

  /** RIFF/WAVE decode (the format spec is public byte layout): integer
    * PCM at 8 (unsigned) / 16 / 24 / 32 bits (signed LE) and IEEE float
    * at 32 / 64 bits, any channel count, incl. the EXTENSIBLE wrapper.
    * Chunk-walks to `fmt ` and `data`; mean over samples (frames ×
    * channels) in each format's native value domain. */
  private[operators] def wavDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] =
    wavParse(b).map { case (code, ch, rate, bits, off, len) =>
      val bytes = bits / 8
      val n = len / bytes
      var s = 0.0
      var i = 0
      while (i < n) {
        val o = off + bytes * i
        s += ((code, bits) match {
          case (1, 8) => (b(o) & 0xff).toDouble
          case (1, 16) => le16(b, o).toShort.toDouble
          case (1, 24) => // sign-extend the 3-byte LE sample
            (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
              ((b(o + 2) & 0xff) << 16)) << 8 >> 8).toDouble
          case (1, _) => le32(b, o).toDouble
          case (3, 32) => java.lang.Float.intBitsToFloat(le32(b, o)).toDouble
          case _ => java.lang.Double.longBitsToDouble(
            (le32(b, o).toLong & 0xffffffffL) | (le32(b, o + 4).toLong << 32))
        })
        i += 1
      }
      MediaDecoded(doc, "wav", Some(ch), Some(rate), None, None,
        n / ch, if (n == 0) 0.0 else s / n)
    }

  /** Uncompressed 24-bit BMP decode: pixel rows padded to 4 bytes,
    * bottom-up (negative height = top-down; mean is order-invariant).
    * Mean over all RGB channel bytes. */
  private[operators] def bmpDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] = {
    if (b.length < 54 || ascii(b, 0, 2) != "BM") return None
    val off = le32(b, 10); val w = le32(b, 18); val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) return None
    val bits = le16(b, 28); val comp = le32(b, 30)
    if (bits == 24 && comp == 0) {
      // row math in LONG: a crafted width near 2^29 overflows 24*w in Int,
      // yielding rowSize 0/negative that defeats the bounds check below
      val rowSizeL = ((24L * w + 31) / 32) * 4
      if (off < 54 || off.toLong + rowSizeL * h > b.length) return None
      val rowSize = rowSizeL.toInt // fits: rowSize·h ≤ b.length ≤ Int.MaxValue
      var s = 0.0
      var r = 0
      while (r < h) {
        var i = 0
        while (i < w * 3) { s += (b(off + r * rowSize + i) & 0xff); i += 1 }
        r += 1
      }
      Some(MediaDecoded(doc, "bmp", None, None, Some(w), Some(h),
        w.toLong * h, s / (w.toLong * h * 3)))
    } else if (bits == 8 && (comp == 0 || comp == 1)) {
      // 8-bit palette, uncompressed or RLE8. The served statistic is
      // the MEAN over palette-resolved RGB bytes — order-invariant, so
      // a palette-index histogram decodes both layouts uniformly
      val hdrSize = le32(b, 14)
      if (hdrSize < 40) return None
      val colorsUsed = le32(b, 46)
      val palOff = 14L + hdrSize
      // colorsUsed == 0 nominally means "full 256" but real writers (the
      // JDK's included) store only the entries they use and point the
      // data offset right after them — the gap IS the palette size
      val gapEntries = ((off - palOff) / 4).toInt
      val nColors =
        if (colorsUsed > 0 && colorsUsed <= 256) math.min(colorsUsed, gapEntries)
        else math.min(256, gapEntries)
      if (nColors <= 0 || palOff + 4L * nColors > b.length) return None
      val hist = new Array[Long](256)
      if (comp == 0) {
        val rowSizeL = ((8L * w + 31) / 32) * 4
        if (off.toLong + rowSizeL * h > b.length) return None
        val rowSize = rowSizeL.toInt
        var r = 0
        while (r < h) {
          var x = 0
          while (x < w) {
            val v = b(off + r * rowSize + x) & 0xff
            if (v >= nColors) return None
            hist(v) += 1
            x += 1
          }
          r += 1
        }
      } else {
        // RLE8: (count, value) runs; escapes 0=EOL, 1=EOD, 2=delta
        // (rejected — its skipped pixels have writer-defined content),
        // n≥3 = literal run padded to a word boundary. Unwritten pixels
        // (early EOL/EOD) default to index 0 per common practice.
        val total = w.toLong * h
        var written = 0L
        var p = off
        var done = false
        while (!done) {
          if (p + 1 >= b.length) return None
          val c = b(p) & 0xff; val v = b(p + 1) & 0xff
          p += 2
          if (c > 0) {
            if (v >= nColors) return None
            if (written + c > total) return None
            hist(v) += c; written += c
          } else v match {
            case 0 => () // end of line: remainder of row stays index 0
            case 1 => done = true
            case 2 => return None // delta escape: content undefined
            case lit =>
              if (p + lit > b.length || written + lit > total) return None
              var i = 0
              while (i < lit) {
                val pv = b(p + i) & 0xff
                if (pv >= nColors) return None
                hist(pv) += 1
                i += 1
              }
              written += lit
              p += lit + (lit & 1) // literal runs pad to 2 bytes
          }
        }
        if (written < total) hist(0) += total - written
      }
      var s = 0.0
      var v = 0
      while (v < nColors) {
        // palette entries are BGRA; alpha (the 4th byte) is reserved
        val po = palOff.toInt + 4 * v
        s += hist(v) * ((b(po) & 0xff) + (b(po + 1) & 0xff) + (b(po + 2) & 0xff))
        v += 1
      }
      Some(MediaDecoded(doc, "bmp", None, None, Some(w), Some(h),
        w.toLong * h, s / (w.toLong * h * 3)))
    } else None
  }

  /** Binary PPM (P6) decode: ASCII header (`#` comments allowed) with
    * width, height, maxval ≤ 255, then a raw w·h·3 raster. */
  /** P6 header parse → (width, height, raster offset); shared by the
    * stats decoder and the perceptual-hash path so the two cannot drift
    * on header semantics. */
  private[graft] def ppmRaster(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 2 || ascii(b, 0, 2) != "P6") return None
    var o = 2
    def skipWs(): Boolean = {
      var progressed = false
      var going = true
      while (going && o < b.length) {
        val c = b(o) & 0xff
        if (c == '#') { while (o < b.length && b(o) != '\n') o += 1; progressed = true }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') { o += 1; progressed = true }
        else going = false
      }
      progressed
    }
    def int(): Option[Int] = {
      if (!skipWs()) return None
      val start = o
      var v = 0L
      while (o < b.length && (b(o) & 0xff) >= '0' && (b(o) & 0xff) <= '9') {
        // clamp instead of accumulate: a 20+-digit run would wrap the
        // Long past the > Int.MaxValue check below and read as small+valid
        if (v <= Int.MaxValue) v = v * 10 + (b(o) - '0')
        o += 1
      }
      if (o == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- int(); h <- int(); maxv <- int()
      if w > 0 && h > 0 && maxv > 0 && maxv <= 255
      // exactly ONE whitespace byte separates maxval from the raster —
      // and it must BE whitespace; a spec-invalid separator is malformed
      if o < b.length && {
        val c = b(o) & 0xff
        c == ' ' || c == '\t' || c == '\r' || c == '\n'
      } && { o += 1; o + w.toLong * h * 3 <= b.length }
    } yield (w, h, o)
  }

  private[operators] def ppmDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] =
    ppmRaster(b).map { case (w, h, o) =>
      var s = 0.0
      var i = 0
      val n = w * h * 3
      while (i < n) { s += (b(o + i) & 0xff); i += 1 }
      MediaDecoded(doc, "ppm", None, None, Some(w), Some(h), w.toLong * h, s / n)
    }

  /** Baseline JPEG decode ([[Jpeg.decode]] — pure-JVM Huffman + IDCT,
    * bit-deterministic via the StrictMath cosine table): mean over gray
    * pixels for 1-component images, over all RGB channel bytes for
    * color (the BMP convention). n_samples = pixel count. */
  private[operators] def jpegDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] =
    Jpeg.decode(b).map { d =>
      val (s, cnt) =
        if (d.nComp == 1) {
          var acc = 0.0; var i = 0
          while (i < d.gray.length) { acc += d.gray(i); i += 1 }
          (acc, d.gray.length)
        } else {
          var acc = 0.0; var i = 0
          while (i < d.rgb.length) { acc += d.rgb(i); i += 1 }
          (acc, d.rgb.length)
        }
      MediaDecoded(doc, "jpeg", None, None, Some(d.width), Some(d.height),
        d.width.toLong * d.height, if (cnt == 0) 0.0 else s / cnt)
    }

  /** PNG decode ([[Png.decode]] — JDK Inflater + defilter, lossless):
    * mean over gray pixels for color type 0, over RGB channel bytes
    * otherwise (palette resolved, alpha dropped). */
  private[operators] def pngDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] =
    Png.decode(b).map { d =>
      val arr = if (d.nComp == 1) d.gray else d.rgb
      var s = 0.0; var i = 0
      while (i < arr.length) { s += arr(i); i += 1 }
      MediaDecoded(doc, "png", None, None, Some(d.width), Some(d.height),
        d.width.toLong * d.height,
        if (arr.length == 0) 0.0 else s / arr.length)
    }

  /** GIF decode ([[Gif.decode]] — pure-JVM LZW + palette resolution,
    * lossless, first frame): mean over palette-resolved RGB channel
    * bytes; n_samples = pixel count. */
  private[operators] def gifDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] =
    Gif.decode(b).map { d =>
      var s = 0.0; var i = 0
      while (i < d.rgb.length) { s += d.rgb(i); i += 1 }
      MediaDecoded(doc, "gif", None, None, Some(d.width), Some(d.height),
        d.width.toLong * d.height,
        if (d.rgb.length == 0) 0.0 else s / d.rgb.length)
    }

  /** FLAC decode ([[Flac.decode]] — pure-JVM bit-math: frame walk,
    * rice residuals, fixed/LPC predictors, stereo decorrelation, CRC
    * verification; lossless): same statistic shape as [[wavDecode]] —
    * mean over ALL decoded samples, n_samples = per-channel frames. */
  private[operators] def flacDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] =
    Flac.decode(b).map { d =>
      var s = 0.0; var i = 0
      while (i < d.samples.length) { s += d.samples(i); i += 1 }
      MediaDecoded(doc, "flac", Some(d.channels), Some(d.sampleRate), None, None,
        d.samples.length.toLong / d.channels,
        if (d.samples.length == 0) 0.0 else s / d.samples.length)
    }

  /** TIFF decode ([[Tif.decode]] — pure-JVM IFD walk + strip
    * decompression, lossless): mean over gray pixels for 1-component
    * images, over RGB channel bytes otherwise. */
  private[operators] def tifDecode(doc: Long, b: Array[Byte]): Option[MediaDecoded] =
    Tif.decode(b).map { d =>
      val arr = if (d.nComp == 1) d.gray else d.rgb
      var s = 0.0; var i = 0
      while (i < arr.length) { s += arr(i); i += 1 }
      MediaDecoded(doc, "tiff", None, None, Some(d.width), Some(d.height),
        d.width.toLong * d.height,
        if (arr.length == 0) 0.0 else s / arr.length)
    }

  /** Real decode pass: sniffs the payload's magic bytes and decodes
    * WAV (incl. G.711/ADPCM compressed)/FLAC/BMP/PPM/JPEG/PNG/GIF/TIFF
    * with the pure byte-math decoders above;
    * any other (or malformed) payload degrades to the `"unknown"` stub
    * row instead of throwing — a poison payload must never kill a
    * 100 TB scan. Same partition-local, iterator-to-iterator batch
    * shape as [[extractFeatures]]. */
  def decode(media: DataFrame): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "modality", "byte_len", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val b = if (r.payload == null) Array.emptyByteArray else r.payload
          wavDecode(r.doc_id, b)
            .orElse(wavCompressedDecode(r.doc_id, b))
            .orElse(flacDecode(r.doc_id, b))
            .orElse(bmpDecode(r.doc_id, b))
            .orElse(ppmDecode(r.doc_id, b))
            .orElse(jpegDecode(r.doc_id, b))
            .orElse(pngDecode(r.doc_id, b))
            .orElse(gifDecode(r.doc_id, b))
            .orElse(tifDecode(r.doc_id, b))
            .getOrElse {
              val (mean, _) = decodeStub(b)
              MediaDecoded(r.doc_id, "unknown", None, None, None, None,
                b.length.toLong, mean)
            }
        }
      }
  }

  final case class MediaHash(doc_id: Long, width: Int, height: Int,
      dhash_hi: Long, dhash_lo: Long)

  /** Integer area-average resample of a PPM raster to a tw×th grayscale
    * grid: cell (i, j) averages gray = (r+g+b) div 3 over the source
    * rect [i·h div th, (i+1)·h div th) × [j·w div tw, (j+1)·w div tw) —
    * all integer division, so the grid (and everything derived from it)
    * is bit-deterministic. */
  private[graft] def grayGrid(b: Array[Byte], w: Int, h: Int, o: Int,
      tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var i = 0
    while (i < th) {
      val r0 = i * h / th; val r1 = math.max((i + 1) * h / th, r0 + 1)
      var j = 0
      while (j < tw) {
        val c0 = j * w / tw; val c1 = math.max((j + 1) * w / tw, c0 + 1)
        var s = 0L; var n = 0L
        var r = r0
        while (r < r1 && r < h) {
          var c = c0
          while (c < c1 && c < w) {
            val p = o + (r * w + c) * 3
            s += ((b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)) / 3
            c += 1; n += 1
          }
          r += 1
        }
        out(i * tw + j) = if (n == 0) 0 else (s / n).toInt
        j += 1
      }
      i += 1
    }
    out
  }

  /** Perceptual image fingerprint (dHash, 8×8 gradient bits over a 9×8
    * integer-resampled grayscale grid): bit (r, c) set iff
    * gray(r, c) < gray(r, c+1). Near-duplicate images — re-encodes,
    * minor edits — land at small Hamming distance; identical pixels
    * hash identically. Packed as two 32-bit halves (rows 0-3 / 4-7) so
    * both engines stay inside signed BIGINT. Non-PPM payloads are
    * dropped (the poison-payload contract of [[decode]]). Map-only. */
  def imageDHash(media: DataFrame): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "modality", "byte_len", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { rrow =>
          val b = if (rrow.payload == null) Array.emptyByteArray else rrow.payload
          ppmRaster(b).map { case (w, h, o) =>
            val g = grayGrid(b, w, h, o, tw = 9, th = 8)
            var hi = 0L; var lo = 0L
            var r = 0
            while (r < 8) {
              var bits = 0L
              var c = 0
              while (c < 8) {
                if (g(r * 9 + c) < g(r * 9 + c + 1)) bits |= (1L << c)
                c += 1
              }
              if (r < 4) hi |= bits << (8 * r) else lo |= bits << (8 * (r - 4))
              r += 1
            }
            MediaHash(rrow.doc_id, w, h, hi, lo)
          }
        }
      }
  }

  /** A valid 44-byte RIFF/WAVE PCM header (executable format
    * documentation; also used to re-encode after [[resampleWav]]). */
  def wavHeaderPcm(channels: Int, sampleRate: Int, bits: Int,
      dataLen: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)       // PCM
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** 8-bit mono convenience — mints real WAV payloads from arbitrary
    * byte columns (the served `q_multimodal_decode` uses it). */
  def wavHeaderPcm8Mono(dataLen: Int, sampleRate: Int = 8000): Array[Byte] =
    wavHeaderPcm(1, sampleRate, 8, dataLen)

  /** REAL audio resize: PCM decimation by integer `factor` (keep every
    * factor-th FRAME, all channels), re-encoded as a valid WAV at
    * rate/factor — decode → transform → re-encode, the full roundtrip a
    * production resampler performs (minus the anti-alias filter, which
    * needs no codec but is DSP out of scope; nearest-frame decimation is
    * the deterministic baseline). None for non-WAV payloads; float WAVs
    * also None — the re-encode header mints integer PCM, so re-labeling
    * float frames would corrupt, and the caller's stub fallback is the
    * honest degrade. */
  private[operators] def resampleWav(b: Array[Byte], factor: Int): Option[Array[Byte]] =
    wavParse(b).collect { case p if p._1 == 1 => decimate(b, p, factor) }

  /** [[resampleWav]] with the decimation factor computed from the DATA
    * CHUNK length (not the whole payload — sizing on payload length
    * counts the 44-byte header and over-decimates small WAVs). */
  private[operators] def resampleWavToTarget(b: Array[Byte], targetLen: Int): Option[Array[Byte]] =
    wavParse(b).collect { case parsed if parsed._1 == 1 =>
      val dataLen = parsed._6
      val tgt = math.max(1, targetLen)
      // factor 1 when the DATA already fits the target (only the 44-byte
      // header pushes the payload over): re-emit the frames unchanged
      // instead of halving the audio with a forced minimum factor.
      decimate(b, parsed, math.max(1, (dataLen + tgt - 1) / tgt))
    }

  private def decimate(b: Array[Byte],
      parsed: (Int, Int, Int, Int, Int, Int), factor: Int): Array[Byte] = {
    val (_, ch, rate, bits, off, len) = parsed
    val blockAlign = ch * bits / 8
    val frames = len / blockAlign
    val outFrames = (frames + factor - 1) / factor
    val out = new Array[Byte](outFrames * blockAlign)
    var f = 0
    while (f < outFrames) {
      System.arraycopy(b, off + f * factor * blockAlign,
        out, f * blockAlign, blockAlign)
      f += 1
    }
    wavHeaderPcm(ch, math.max(1, rate / factor), bits, out.length) ++ out
  }
}
