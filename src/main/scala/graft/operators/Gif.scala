package graft.operators

/** GIF (GIF87a/GIF89a) in pure JVM byte math — the third dominant
  * real-world image format closed without a codec library: the only
  * machinery GIF needs beyond byte layout is its LZW variant, ~80 lines
  * of dictionary code.
  *
  * ==Decoder scope==
  * FIRST image frame (animated streams decode their first frame, the
  * same thing `ImageIO.read` returns), global and local color tables,
  * both interlaced (the 4-pass row order) and sequential rasters,
  * sub-rect frames composited at (left, top) over the background color,
  * extension blocks skipped (transparency is dropped — the engine's
  * alpha-less RGB contract, as with PNG). Output is palette-resolved
  * interleaved RGB. GIF is LOSSLESS, so every cross-check against the
  * JDK's independent ImageIO reader is EXACT equality and every
  * GIF-served oracle replays in SQL. Malformed/truncated streams and
  * LZW violations (code beyond the dictionary, index beyond the
  * palette) return None — the poison contract of [[Multimodal.decode]];
  * hostile headers are rejected by [[Png.PoisonSampleCap]] BEFORE any
  * allocation they would command.
  *
  * ==Encoder scope==
  * 8-bit grayscale (256-entry gray palette), sequential raster, one
  * frame — exists to MINT real GIF payloads for served queries and
  * specs. Uses the classic uncompressed-LZW device: 9-bit literal codes
  * with a CLEAR every 250 pixels so the dictionary never forces a code
  * width change; decoders (ours, ImageIO) read it as ordinary LZW.
  */
object Gif {

  /** Decoded first frame: palette-resolved interleaved RGB (w·h·3). */
  final case class Decoded(width: Int, height: Int, rgb: Array[Int])

  def decode(b: Array[Byte]): Option[Decoded] = {
    try decodeImpl(b)
    catch {
      case _: Exception => None
      case _: OutOfMemoryError => None // poison contract; cap makes this moot
    }
  }

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def decodeImpl(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 13) return None
    val hdr = new String(b, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val w = u16le(b, 6); val h = u16le(b, 8)
    val flags = b(10) & 0xff
    val bg = b(11) & 0xff
    if (w <= 0 || h <= 0) return None
    // poison cap BEFORE the canvas allocation (w·h·3 ints)
    if (w.toLong * h * 3 > Png.PoisonSampleCap) return None
    var pos = 13
    var global: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (pos + 3 * n > b.length) return None
      global = new Array[Int](3 * n)
      var i = 0
      while (i < 3 * n) { global(i) = b(pos + i) & 0xff; i += 1 }
      pos += 3 * n
    }
    // canvas primed with the background color (or black without a table)
    val rgb = new Array[Int](w * h * 3)
    if (global != null && bg * 3 + 2 < global.length) {
      var i = 0
      while (i < w * h) {
        rgb(3 * i) = global(3 * bg); rgb(3 * i + 1) = global(3 * bg + 1)
        rgb(3 * i + 2) = global(3 * bg + 2)
        i += 1
      }
    }
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x3b => return None // trailer before any image frame
        case 0x21 => // extension: label + length-prefixed sub-blocks
          pos += 2
          var len = if (pos < b.length) b(pos) & 0xff else return None
          while (len != 0) {
            pos += 1 + len
            if (pos >= b.length) return None
            len = b(pos) & 0xff
          }
          pos += 1
        case 0x2c => // image descriptor: the frame we decode
          if (pos + 10 > b.length) return None
          val left = u16le(b, pos + 1); val top = u16le(b, pos + 3)
          val iw = u16le(b, pos + 5); val ih = u16le(b, pos + 7)
          val iflags = b(pos + 9) & 0xff
          pos += 10
          if (iw <= 0 || ih <= 0 || left + iw > w || top + ih > h) return None
          var palette = global
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            if (pos + 3 * n > b.length) return None
            palette = new Array[Int](3 * n)
            var i = 0
            while (i < 3 * n) { palette(i) = b(pos + i) & 0xff; i += 1 }
            pos += 3 * n
          }
          if (palette == null) return None
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the length-prefixed data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var len = if (pos < b.length) b(pos) & 0xff else return None
          while (len != 0) {
            if (pos + 1 + len > b.length) return None
            data.write(b, pos + 1, len)
            pos += 1 + len
            if (pos >= b.length) return None
            len = b(pos) & 0xff
          }
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
          if (idx == null) return None
          // scatter (interlaced: the 4-pass row order) and resolve
          val rowOrder: Array[Int] =
            if ((iflags & 0x40) != 0) {
              val rows = new Array[Int](ih)
              var r = 0
              for (pass <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- pass._1 until ih by pass._2) {
                rows(r) = y; r += 1
              }
              rows
            } else Array.tabulate(ih)(identity)
          var ry = 0
          while (ry < ih) {
            val y = rowOrder(ry)
            var x = 0
            while (x < iw) {
              val pi = idx(ry * iw + x)
              if (pi * 3 + 2 >= palette.length) return None
              val o = ((top + y) * w + left + x) * 3
              rgb(o) = palette(3 * pi); rgb(o + 1) = palette(3 * pi + 1)
              rgb(o + 2) = palette(3 * pi + 2)
              x += 1
            }
            ry += 1
          }
          return Some(Decoded(w, h, rgb)) // first frame only
        case _ => return None
      }
    }
    None
  }

  /** GIF-variant LZW: variable code width from minCode+1 up to 12 bits,
    * LSB-first packing, CLEAR/END codes, one dictionary entry added per
    * decoded code. Returns exactly `n` palette indices or null on any
    * violation (code beyond the dictionary, stream exhausted early). */
  private def lzwDecode(d: Array[Byte], minCode: Int, n: Int): Array[Int] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Int](n)
    var produced = 0
    var codeSize = minCode + 1
    var next = end + 1
    var prev = -1
    var acc = 0; var nbits = 0; var bp = 0
    val stack = new Array[Int](4097)
    def readCode(): Int = {
      while (nbits < codeSize) {
        if (bp >= d.length) return -1
        acc |= (d(bp) & 0xff) << nbits
        nbits += 8; bp += 1
      }
      val c = acc & ((1 << codeSize) - 1)
      acc >>>= codeSize; nbits -= codeSize
      c
    }
    while (produced < n) {
      val code = readCode()
      if (code < 0 || code == end) return null // short stream
      if (code == clear) {
        codeSize = minCode + 1; next = end + 1; prev = -1
      } else {
        if (code > next || (code == next && prev < 0)) return null
        // expand `code` (or prev+firstChar for the just-beyond case)
        var sp = 0
        var c = if (code == next) prev else code
        while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= clear) return null // dangling CLEAR/END slot
        val first = c
        stack(sp) = c; sp += 1
        // emit in reverse (stack holds last→first); for the KwKwK case
        // (code == next) the emitted string is prev's string plus its
        // OWN first char appended — `first` after the walk above. A
        // final code that overshoots the raster is clipped (sloppy
        // encoder padding), but a stream that ENDS short stays null.
        var i = sp - 1
        while (i >= 0 && produced < n) {
          out(produced) = stack(i); produced += 1; i -= 1
        }
        if (code == next && produced < n) { out(produced) = first; produced += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }

  // ===== encoder (fixture minting) =====

  /** Encode 8-bit grayscale (w·h raster, values 0-255): 256-entry gray
    * palette, sequential raster, uncompressed-trick LZW. */
  def encodeGray(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0xf7) // global table, 8 bpp, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    w16(0); w16(0); w16(w); w16(h)
    out.write(0)    // no local table, not interlaced
    out.write(8)    // LZW min code size
    // 9-bit literal codes, CLEAR every 250 pixels: the dictionary never
    // reaches 512 entries, so the code width never changes
    val lzw = new java.io.ByteArrayOutputStream()
    var acc = 0; var nbits = 0
    def put(code: Int): Unit = {
      acc |= code << nbits; nbits += 9
      while (nbits >= 8) { lzw.write(acc & 0xff); acc >>>= 8; nbits -= 8 }
    }
    put(256) // CLEAR
    var count = 0
    i = 0
    while (i < pixels.length) {
      put(pixels(i) & 0xff)
      count += 1
      if (count == 250) { put(256); count = 0 }
      i += 1
    }
    put(257) // END
    if (nbits > 0) lzw.write(acc & 0xff)
    val z = lzw.toByteArray
    var o = 0
    while (o < z.length) {
      val len = math.min(255, z.length - o)
      out.write(len)
      out.write(z, o, len)
      o += len
    }
    out.write(0)    // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
