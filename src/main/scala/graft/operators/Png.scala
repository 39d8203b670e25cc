package graft.operators

/** PNG (RFC 2083 / W3C) in pure JVM byte math — the second dominant
  * real-world image format closed without an external codec: the only
  * non-byte-layout machinery PNG needs is zlib, and `java.util.zip`
  * (Inflater/Deflater/CRC32) ships with the JDK.
  *
  * ==Decoder scope==
  * Bit depths 8 and 16 (16-bit samples reduce to their high byte — the
  * standard 8-bit reduction, exactly the JDK raster's `sample >> 8`),
  * color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  * 6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth);
  * non-interlaced AND Adam7-interlaced raster layouts (each of the
  * seven passes is its own filtered sub-image — defiltered
  * independently, scattered onto the 8×8 grid); chunk CRCs VERIFIED
  * for the critical chunks; multiple IDAT chunks concatenated per
  * spec. 1/2/4-bit depths and malformed/truncated streams return
  * None — the poison-payload contract of [[Multimodal.decode]].
  * Hostile headers are rejected BEFORE any allocation they would
  * command ([[PoisonSampleCap]]; an IDAT arithmetically too small to
  * inflate to its raster is refused without buying the buffer), and a
  * zlib stream that stalls the Inflater (FDICT preset-dictionary
  * headers) is malformed, not a hang.
  * PNG is LOSSLESS, so unlike [[Jpeg]] the decode has no rounding
  * story at all: decoded bytes ARE the source bytes, which makes every
  * PNG-served oracle exactly SQL-replayable and lets the spec demand
  * EXACT equality against the JDK's independent ImageIO reader in both
  * directions.
  *
  * ==Encoder scope==
  * 8-bit grayscale or RGB, filter 0 scanlines, one deflated IDAT —
  * exists to MINT real PNG payloads for the served queries and specs.
  */
object Png {

  /** Decoded image: `gray` for color type 0 (w·h), `rgb` interleaved
    * w·h·3 for everything else (palette resolved, alpha dropped). */
  final case class Decoded(width: Int, height: Int, nComp: Int,
      gray: Array[Int], rgb: Array[Int])

  /** Poison-allocation cap, shared with [[Jpeg]]: a ~50-byte crafted
    * header must never command multi-GB buffers before any pixel data
    * is read (the resulting OutOfMemoryError is an Error, outside the
    * poison-contract catch). 2^26 SAMPLES (w·h·channels) bounds every
    * decode buffer — raw filtered bytes, defiltered ints, RGB output —
    * under ~270 MB while still admitting any realistic corpus image
    * (a 4096×4096 RGBA frame is 2^26 samples exactly). */
  private[operators] val PoisonSampleCap: Long = 1L << 26

  private val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  def decode(b: Array[Byte]): Option[Decoded] = {
    try decodeImpl(b)
    catch {
      case _: Exception => None
      // an allocation failure from a hostile header is an Error, not an
      // Exception; the PoisonSampleCap makes this unreachable in
      // practice, but the never-kill-a-scan contract covers it anyway
      case _: OutOfMemoryError => None
    }
  }

  /** Adam7 pass grid: (xStart, yStart, xStep, yStep) per pass. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def decodeImpl(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != Signature(i)) return None; i += 1 }
    var pos = 8
    var w = 0; var h = 0; var depth = 0; var colorType = -1
    var interlaced = false
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false
    var sawIend = false
    val crc = new java.util.zip.CRC32()
    while (pos + 12 <= b.length && !sawIend) {
      val len = be32(b, pos)
      if (len < 0 || pos.toLong + 12 + len > b.length) return None
      val ctype = new String(b, pos + 4, 4, "US-ASCII")
      // CRC covers type + data
      crc.reset()
      crc.update(b, pos + 4, 4 + len)
      val wantCrc = be32(b, pos + 8 + len)
      val crcOk = crc.getValue.toInt == wantCrc
      ctype match {
        case "IHDR" =>
          if (!crcOk || len != 13 || sawIhdr) return None
          sawIhdr = true
          w = be32(b, pos + 8); h = be32(b, pos + 12)
          depth = b(pos + 16) & 0xff
          colorType = b(pos + 17) & 0xff
          val compression = b(pos + 18) & 0xff
          val filter = b(pos + 19) & 0xff
          val interlace = b(pos + 20) & 0xff
          if (w <= 0 || h <= 0 || (depth != 8 && depth != 16) ||
              compression != 0 || filter != 0 || interlace > 1) return None
          interlaced = interlace == 1
          if (!Set(0, 2, 3, 4, 6).contains(colorType)) return None
          // palette indices are never 16-bit per spec
          if (colorType == 3 && depth == 16) return None
          // poison cap: bound EVERY buffer the decode will allocate
          // (raw filtered bytes at bpp/px, defiltered ints, RGB output
          // at 3/px) by total samples — a crafted IHDR claiming
          // 40000×40000 must be rejected HERE, before any allocation
          val bppHere = colorType match {
            case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case _ => 4
          }
          if (w.toLong * h * math.max(bppHere, 3) > PoisonSampleCap)
            return None
        case "PLTE" =>
          if (!crcOk || len % 3 != 0 || len > 256 * 3) return None
          palette = new Array[Int](len)
          var j = 0
          while (j < len) { palette(j) = b(pos + 8 + j) & 0xff; j += 1 }
        case "IDAT" =>
          if (!crcOk) return None
          idat.write(b, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks: skip (CRC not enforced)
      }
      pos += 12 + len
    }
    if (!sawIhdr || !sawIend || idat.size() == 0) return None
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    if (colorType == 3 && palette == null) return None
    val sampBytes = depth / 8        // 1 or 2 bytes per sample
    val bppBytes = bpp * sampBytes   // filter distance per spec
    // raster layout: one pass covering everything, or the seven Adam7
    // passes — each pass is an independent filtered sub-image whose
    // scanlines are concatenated in the inflated stream
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlaced) Adam7 else Array((0, 0, 1, 1))
    val dims = passes.map { case (x0, y0, dx, dy) =>
      (if (w > x0) (w - x0 + dx - 1) / dx else 0,
       if (h > y0) (h - y0 + dy - 1) / dy else 0)
    }
    val rawLenL = dims.foldLeft(0L) { case (acc, (pw, ph)) =>
      if (pw > 0 && ph > 0) acc + (pw.toLong * bppBytes + 1) * ph else acc
    }
    if (rawLenL == 0 || rawLenL > Int.MaxValue - 16) return None
    // plausibility before allocating `raw`: deflate expands at most
    // ~1032:1 (one 258-byte match per ~2 bits), so an IDAT too small to
    // possibly inflate to rawLen is truncated by arithmetic — reject
    // without paying the buffer
    if (rawLenL > idat.size().toLong * 1032L + 64L) return None
    // inflate the concatenated IDAT zlib stream
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](rawLenL.toInt)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // n == 0 with the stream unfinished is ALWAYS malformed here: the
      // whole input was set up front, so needsInput() means truncated,
      // and otherwise the inflater is stalled (an FDICT header asking
      // for a preset dictionary no PNG may use) — either way None, never
      // the infinite loop a stalled-but-unfinished state would spin
      if (n == 0 && !inf.finished()) { inf.end(); return None }
      got += n
    }
    inf.end()
    if (got != raw.length) return None
    // defilter each pass independently (per spec: neighbors are the
    // DEFILTERED bytes of the SAME pass), then scatter its pixels onto
    // the output grid; 16-bit samples keep their high byte
    val samples = new Array[Int](w * h * bpp)
    var off = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (pw, ph) = dims(pi)
      if (pw > 0 && ph > 0) {
        val stride = pw * bppBytes
        val pass = defilterPass(raw, off, stride, ph, bppBytes)
        if (pass == null) return None
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            val dest = ((y0 + py * dy) * w + (x0 + px * dx)) * bpp
            var s = 0
            while (s < bpp) {
              samples(dest + s) = pass(py * stride + px * bppBytes + s * sampBytes)
              s += 1
            }
            px += 1
          }
          py += 1
        }
        off += (stride + 1) * ph
      }
      pi += 1
    }
    val out = samples
    colorType match {
      case 0 =>
        Some(Decoded(w, h, 1, out, null))
      case 2 =>
        Some(Decoded(w, h, 3, null, out))
      case 3 =>
        val rgb = new Array[Int](w * h * 3)
        var i2 = 0
        while (i2 < w * h) {
          val idx = out(i2) * 3
          if (idx + 2 >= palette.length) return None
          rgb(3 * i2) = palette(idx)
          rgb(3 * i2 + 1) = palette(idx + 1)
          rgb(3 * i2 + 2) = palette(idx + 2)
          i2 += 1
        }
        Some(Decoded(w, h, 3, null, rgb))
      case 4 =>
        val rgb = new Array[Int](w * h * 3)
        var i2 = 0
        while (i2 < w * h) {
          val g = out(2 * i2)
          rgb(3 * i2) = g; rgb(3 * i2 + 1) = g; rgb(3 * i2 + 2) = g
          i2 += 1
        }
        Some(Decoded(w, h, 3, null, rgb))
      case 6 =>
        val rgb = new Array[Int](w * h * 3)
        var i2 = 0
        while (i2 < w * h) {
          rgb(3 * i2) = out(4 * i2)
          rgb(3 * i2 + 1) = out(4 * i2 + 1)
          rgb(3 * i2 + 2) = out(4 * i2 + 2)
          i2 += 1
        }
        Some(Decoded(w, h, 3, null, rgb))
      case _ => None
    }
  }

  /** Defilter `passH` scanlines of `stride` bytes starting at
    * `raw(off)`, each led by its filter byte. Neighbors (left/up/corner,
    * `bppBytes` back per spec) are the DEFILTERED bytes of this pass.
    * Returns the defiltered bytes, or null on an undefined filter type. */
  private def defilterPass(raw: Array[Byte], off: Int, stride: Int,
      passH: Int, bppBytes: Int): Array[Int] = {
    val out = new Array[Int](stride * passH)
    var y = 0
    while (y < passH) {
      val fo = off + y * (stride + 1)
      val filter = raw(fo) & 0xff
      var x = 0
      while (x < stride) {
        val cur = raw(fo + 1 + x) & 0xff
        val left = if (x >= bppBytes) out(y * stride + x - bppBytes) else 0
        val up = if (y > 0) out((y - 1) * stride + x) else 0
        val corner = if (y > 0 && x >= bppBytes) out((y - 1) * stride + x - bppBytes) else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val p = left + up - corner
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - corner)
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else corner)
          case _ => return null
        }
        out(y * stride + x) = v & 0xff
        x += 1
      }
      y += 1
    }
    out
  }

  // ===== encoder (fixture minting) =====

  private def chunk(out: java.io.ByteArrayOutputStream, ctype: String,
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
    crc.update(tb, 0, 4)
    crc.update(data, 0, data.length)
    w32(crc.getValue.toInt)
  }

  private def ihdr(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13)
    bb.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def encode(pixels: Array[Int], w: Int, h: Int, bpp: Int,
      colorType: Int): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h * bpp)
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = 0 // filter None
      var x = 0
      while (x < stride) {
        raw(y * (stride + 1) + 1 + x) = pixels(y * stride + x).toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    Signature.foreach(out.write)
    chunk(out, "IHDR", ihdr(w, h, colorType))
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode 8-bit grayscale (w·h raster, values 0-255). */
  def encodeGray(pixels: Array[Int], w: Int, h: Int): Array[Byte] =
    encode(pixels, w, h, bpp = 1, colorType = 0)

  /** Encode 8-bit RGB (interleaved w·h·3). */
  def encodeRgb(rgb: Array[Int], w: Int, h: Int): Array[Byte] =
    encode(rgb, w, h, bpp = 3, colorType = 2)
}
