package graft.operators

/** Baseline TIFF (TIFF 6.0) in pure JVM byte math — the fourth common
  * raster format closed without a codec library. TIFF is a tag soup,
  * but its baseline raster path needs nothing beyond byte layout plus
  * three public decompressors (PackBits run-length, the TIFF variant of
  * LZW, zlib deflate — the JDK ships the last).
  *
  * ==Decoder scope==
  * Both byte orders (II little / MM big endian), first IFD, chunky
  * planar config, 8-bit samples, photometric 0 (white-is-zero, gray
  * inverted), 1 (black-is-zero gray), 2 (RGB, extra samples dropped)
  * and 3 (palette, 16-bit colormap reduced by `>> 8`), strip layout
  * (any RowsPerStrip), compressions 1 (none), 5 (LZW — MSB-first
  * packing with the spec's EARLY code-width change, horizontal
  * differencing predictor tag 317), 8/32946 (deflate) and 32773
  * (PackBits). Tiled layouts, 16-bit samples, planar config 2, and
  * malformed/truncated streams return None — the poison contract of
  * [[Multimodal.decode]]; hostile headers are rejected by
  * [[Png.PoisonSampleCap]] BEFORE any allocation they would command.
  *
  * ==Encoder scope==
  * 8-bit grayscale, uncompressed, one strip, little-endian — MINTS real
  * TIFF payloads for served queries and specs.
  */
object Tif {

  /** Decoded image: `gray` (w·h) for 1-sample images, `rgb`
    * (interleaved w·h·3) otherwise — the [[Png.Decoded]] contract. */
  final case class Decoded(width: Int, height: Int, nComp: Int,
      gray: Array[Int], rgb: Array[Int])

  def decode(b: Array[Byte]): Option[Decoded] = {
    try decodeImpl(b)
    catch {
      case _: Exception => None
      case _: OutOfMemoryError => None // poison contract; cap makes this moot
    }
  }

  private def decodeImpl(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 8) return None
    val le = (b(0) & 0xff) == 'I' && (b(1) & 0xff) == 'I'
    val be = (b(0) & 0xff) == 'M' && (b(1) & 0xff) == 'M'
    if (!le && !be) return None
    def u16(o: Int): Int =
      if (o + 2 > b.length) -1
      else if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > b.length) -1L
      else if (le) ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val nTags = u16(ifd.toInt)
    if (nTags <= 0 || ifd + 2 + 12L * nTags > b.length) return None

    // tag values as Long arrays (types BYTE/SHORT/LONG; inline or
    // offset-stored per the 4-byte rule)
    def tagValues(tag: Int): Option[Array[Long]] = {
      var i = 0
      while (i < nTags) {
        val o = ifd.toInt + 2 + 12 * i
        if (u16(o) == tag) {
          val typ = u16(o + 2)
          val count = u32(o + 4)
          val sz = typ match {
            case 1 => 1; case 3 => 2; case 4 => 4; case _ => return None
          }
          if (count <= 0 || count > (1L << 20)) return None
          val total = sz * count
          val src = if (total <= 4) o + 8 else {
            val off = u32(o + 8)
            if (off < 0 || off + total > b.length) return None
            off.toInt
          }
          val out = new Array[Long](count.toInt)
          var j = 0
          while (j < count) {
            out(j) = sz match {
              case 1 => (b(src + j) & 0xff).toLong
              case 2 => u16(src + 2 * j).toLong
              case _ => u32(src + 4 * j)
            }
            if (out(j) < 0) return None
            j += 1
          }
          return Some(out)
        }
        i += 1
      }
      None
    }
    def tag1(tag: Int, default: Long = -1L): Long =
      tagValues(tag).map(_(0)).getOrElse(default)

    val w = tag1(256).toInt; val h = tag1(257).toInt
    if (w <= 0 || h <= 0) return None
    val spp = tag1(277, 1L).toInt
    // cap BEFORE any allocation the header commands: the raster is
    // w·spp·h ints and the output is up to w·h·3 — bound both, and bound
    // attacker-controlled SamplesPerPixel itself (baseline needs ≤ 4:
    // gray(+alpha), RGB(+alpha); 8 leaves room for extra samples)
    if (spp < 1 || spp > 8) return None
    if (w.toLong * h * math.max(3, spp) > Png.PoisonSampleCap) return None
    val bits = tagValues(258).getOrElse(Array(8L))
    if (bits.exists(_ != 8L) || bits.length != spp) return None
    val compression = tag1(259, 1L).toInt
    val photometric = tag1(262).toInt
    val predictor = tag1(317, 1L).toInt
    if (tag1(284, 1L) != 1L) return None // chunky only
    if (predictor != 1 && predictor != 2) return None
    val nComp = photometric match {
      case 0 | 1 => if (spp < 1) return None else 1 // gray (+dropped alpha)
      case 2 => if (spp < 3) return None else 3     // RGB (+dropped extras)
      case 3 => if (spp != 1) return None else 1    // palette indices
      case _ => return None
    }
    val colorMap = if (photometric == 3) {
      val cm = tagValues(320).getOrElse(return None)
      if (cm.length != 3 * 256) return None // 8-bit palette images
      cm
    } else null
    val offsets = tagValues(273).getOrElse(return None)
    val counts = tagValues(279).getOrElse(return None)
    if (offsets.length != counts.length || offsets.isEmpty) return None
    val rowsPerStrip = math.min(tag1(278, Int.MaxValue.toLong), h.toLong).toInt
    if (rowsPerStrip <= 0) return None
    if ((h + rowsPerStrip - 1) / rowsPerStrip != offsets.length) return None

    // decompress strip-by-strip into the raster (w·spp bytes per row)
    val rowBytes = w * spp
    val raster = new Array[Int](rowBytes * h)
    var strip = 0
    var row = 0
    while (strip < offsets.length) {
      val rows = math.min(rowsPerStrip, h - row)
      val need = rowBytes * rows
      val off = offsets(strip); val len = counts(strip)
      if (off < 0 || len < 0 || off + len > b.length) return None
      val data = compression match {
        case 1 =>
          if (len < need) return None
          val out = new Array[Int](need)
          var i = 0
          while (i < need) { out(i) = b(off.toInt + i) & 0xff; i += 1 }
          out
        case 5 => lzwTiff(b, off.toInt, len.toInt, need).getOrElse(return None)
        case 8 | 32946 =>
          inflate(b, off.toInt, len.toInt, need).getOrElse(return None)
        case 32773 => packBits(b, off.toInt, len.toInt, need).getOrElse(return None)
        case _ => return None
      }
      // horizontal differencing predictor: add the left neighbor,
      // per sample, per row (applies to LZW and deflate strips)
      if (predictor == 2) {
        var r = 0
        while (r < rows) {
          var x = spp
          while (x < rowBytes) {
            data(r * rowBytes + x) =
              (data(r * rowBytes + x) + data(r * rowBytes + x - spp)) & 0xff
            x += 1
          }
          r += 1
        }
      }
      System.arraycopy(data, 0, raster, row * rowBytes, need)
      row += rows
      strip += 1
    }

    photometric match {
      case 0 | 1 =>
        val g = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val v = raster(i * spp) // extra samples (alpha) dropped
          g(i) = if (photometric == 0) 255 - v else v
          i += 1
        }
        Some(Decoded(w, h, 1, g, null))
      case 2 =>
        val rgb = new Array[Int](w * h * 3)
        var i = 0
        while (i < w * h) {
          rgb(3 * i) = raster(i * spp)
          rgb(3 * i + 1) = raster(i * spp + 1)
          rgb(3 * i + 2) = raster(i * spp + 2)
          i += 1
        }
        Some(Decoded(w, h, 3, null, rgb))
      case _ => // palette: 16-bit colormap entries reduce by >> 8
        val rgb = new Array[Int](w * h * 3)
        var i = 0
        while (i < w * h) {
          val pi = raster(i)
          rgb(3 * i) = (colorMap(pi) >> 8).toInt
          rgb(3 * i + 1) = (colorMap(256 + pi) >> 8).toInt
          rgb(3 * i + 2) = (colorMap(512 + pi) >> 8).toInt
          i += 1
        }
        Some(Decoded(w, h, 3, null, rgb))
    }
  }

  /** TIFF-variant LZW: MSB-first bit packing and the EARLY code-width
    * change (width grows when the next-free slot reaches 2^width − 1,
    * one code sooner than GIF). Returns exactly `n` bytes or None. */
  private def lzwTiff(b: Array[Byte], off: Int, len: Int, n: Int): Option[Array[Int]] = {
    val clear = 256; val eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4097)
    val out = new Array[Int](n)
    var produced = 0
    var width = 9
    var next = 258
    var prev = -1
    var acc = 0L; var nbits = 0; var bp = off
    def readCode(): Int = {
      while (nbits < width) {
        if (bp >= off + len) return -1
        acc = (acc << 8) | (b(bp) & 0xff)
        nbits += 8; bp += 1
      }
      val c = ((acc >>> (nbits - width)) & ((1 << width) - 1)).toInt
      nbits -= width
      c
    }
    while (produced < n) {
      val code = readCode()
      if (code < 0 || code == eoi) return None // short stream
      if (code == clear) {
        width = 9; next = 258; prev = -1
      } else {
        if (code > next || (code == next && prev < 0)) return None
        var sp = 0
        var c = if (code == next) prev else code
        while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= 256) return None
        val first = c
        stack(sp) = c; sp += 1
        var i = sp - 1
        while (i >= 0 && produced < n) {
          out(produced) = stack(i); produced += 1; i -= 1
        }
        if (code == next && produced < n) { out(produced) = first; produced += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          // EARLY change: one slot before the power of two
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** PackBits run-length: n ∈ [0,127] copies n+1 literals; n ∈
    * [-127,-1] repeats the next byte 1−n times; −128 is a no-op. */
  private def packBits(b: Array[Byte], off: Int, len: Int, n: Int): Option[Array[Int]] = {
    val out = new Array[Int](n)
    var produced = 0
    var p = off
    while (produced < n) {
      if (p >= off + len) return None
      val ctl = b(p); p += 1
      if (ctl >= 0) {
        val cnt = ctl + 1
        if (p + cnt > off + len || produced + cnt > n) return None
        var i = 0
        while (i < cnt) { out(produced) = b(p + i) & 0xff; produced += 1; i += 1 }
        p += cnt
      } else if (ctl != -128) {
        val cnt = 1 - ctl
        if (p >= off + len || produced + cnt > n) return None
        val v = b(p) & 0xff; p += 1
        var i = 0
        while (i < cnt) { out(produced) = v; produced += 1; i += 1 }
      }
    }
    Some(out)
  }

  /** Adobe/zlib deflate strips via the JDK Inflater — the same
    * stall-is-malformed contract as [[Png]]. */
  private def inflate(b: Array[Byte], off: Int, len: Int, n: Int): Option[Array[Int]] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b, off, len)
    val raw = new Array[Byte](n)
    var got = 0
    while (got < n && !inf.finished()) {
      val k = inf.inflate(raw, got, n - got)
      if (k == 0 && !inf.finished()) { inf.end(); return None }
      got += k
    }
    inf.end()
    if (got != n) return None
    Some(raw.map(_ & 0xff))
  }

  // ===== encoder (fixture minting) =====

  /** Encode 8-bit grayscale: little-endian, uncompressed, one strip. */
  def encodeGray(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write('I'); out.write('I'); w16(42)
    val dataOff = 8
    val pad = pixels.length & 1 // IFD must start on a word boundary
    val ifdOff = dataOff + pixels.length + pad
    w32(ifdOff)
    pixels.foreach(v => out.write(v & 0xff))
    if (pad == 1) out.write(0)
    // IFD: 8 tags, each (tag, type, count, value)
    val tags = Seq(
      (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
      (262, 3, 1, 1), (273, 4, 1, dataOff), (278, 3, 1, h),
      (279, 4, 1, pixels.length))
    w16(tags.length)
    tags.foreach { case (tag, typ, count, value) =>
      w16(tag); w16(typ); w32(count)
      if (typ == 3) { w16(value); w16(0) } else w32(value)
    }
    w32(0) // no next IFD
    out.toByteArray
  }
}
