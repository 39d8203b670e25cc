package graft.operators

/** Baseline JPEG (ITU-T T.81, baseline sequential DCT) in pure JVM byte
  * math — no codec library, the same contract as the WAV/BMP/PPM
  * decoders in [[Multimodal]]: the format's public spec implemented
  * directly, poison payloads degrade to None, never a throw.
  *
  * ==Decoder scope==
  * Baseline sequential (SOF0) AND progressive (SOF2 — spectral
  * selection, successive approximation, interleaved DC scans,
  * single-component AC scans with EOB runs and refinement bits,
  * per T.81 G.2), 8-bit precision, 1 or 3 components, per-component
  * sampling factors 1 or 2 (covers 4:4:4, 4:2:2 and the dominant
  * 4:2:0), restart markers (DRI/RSTn), byte stuffing. The IDCT is the
  * separable double-precision definition over a StrictMath-cosine
  * table, so decode is BIT-deterministic across JVMs and platforms.
  * Arithmetic coding, 12-bit precision, and hierarchical mode are out
  * of scope and return None.
  *
  * ==Encoder scope==
  * Grayscale or 4:4:4 color, standard Annex K quantization/Huffman
  * tables with libjpeg's quality scaling. Exists to MINT real JPEG
  * payloads for the served queries and specs (the wavHeaderPcm device
  * for images): at quality 100 the quant tables are all ones, so a
  * CONSTANT 8×8 block — DC-only, zero ACs — roundtrips its value
  * EXACTLY, which is what lets a DuckDB oracle replay decoded means
  * from the source bytes without a SQL DCT.
  *
  * The entropy machinery (canonical Huffman from (counts, symbols),
  * receive/extend, run/size AC coding, zigzag) and the DCT pair are the
  * published algorithms; MultimodalSpec additionally cross-checks the
  * decoder pixel-for-pixel (±1) against the JDK's independent ImageIO
  * reader on gradient fixtures.
  */
object Jpeg {

  /** Decoded image: planes assembled to full-resolution pixels.
    * `gray`: luma plane for 1-component images, null for color;
    * `rgb`: interleaved RGB for 3-component images, null for gray. */
  final case class Decoded(width: Int, height: Int, nComp: Int,
      gray: Array[Int], rgb: Array[Int])

  // ===== shared tables =====

  /** Zigzag order: zigzag(i) = raster index of the i-th coefficient. */
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance / chrominance base quantization tables (raster
    * order). */
  private val QLumBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val QChromBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K typical Huffman tables: (bits[1..16], huffval). */
  private val DcLum: (Array[Int], Array[Int]) = (
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  private val DcChrom: (Array[Int], Array[Int]) = (
    Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  private val AcLum: (Array[Int], Array[Int]) = (
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
      0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
      0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
      0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
      0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
      0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
      0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
      0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
      0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
  private val AcChrom: (Array[Int], Array[Int]) = (
    Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
      0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
      0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
      0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
      0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
      0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
      0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
      0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
      0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
      0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
      0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
      0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

  /** StrictMath cosine table for the DCT pair — bit-identical on every
    * JVM/platform (Math.cos is allowed to differ; StrictMath is not). */
  private val Cos: Array[Double] = {
    val t = new Array[Double](8 * 8)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / StrictMath.sqrt(2.0)

  // ===== canonical Huffman =====

  /** Canonical Huffman decode table from (bits, huffval): per code
    * length l (1-based), the smallest code, its index into huffval, and
    * the count. */
  private final class Huff(bits: Array[Int], val huffval: Array[Int]) {
    val minCode = new Array[Int](17)
    val firstIdx = new Array[Int](17)
    val count = new Array[Int](17)
    locally {
      var code = 0
      var idx = 0
      var l = 1
      while (l <= 16) {
        minCode(l) = code
        firstIdx(l) = idx
        count(l) = bits(l)
        code += bits(l)
        idx += bits(l)
        code <<= 1
        l += 1
      }
    }
  }

  private def encTable(bits: Array[Int], huffval: Array[Int])
      : (Array[Int], Array[Int]) = {
    // symbol → (code, length) for the encoder
    val codes = new Array[Int](256)
    val lens = new Array[Int](256)
    var code = 0
    var idx = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        codes(huffval(idx)) = code
        lens(huffval(idx)) = l
        code += 1
        idx += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    (codes, lens)
  }

  // ===== bit IO =====

  /** Entropy-segment bit reader with FF-stuffing; stops (returns -1) at
    * any real marker. Restart markers are consumed by the caller via
    * [[BitReader.restart]]. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false

    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { hitMarker = true; return -1 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { hitMarker = true; return -1 }
          val n = b(pos) & 0xff
          if (n == 0x00) pos += 1 // stuffed FF
          else { pos -= 1; hitMarker = true; return -1 } // real marker
          v = 0xff
        }
        acc = v
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def bitsN(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }

    /** At a restart boundary: drop partial bits, expect FFD0+i, consume
      * it. False on anything else (malformed). */
    def restart(expected: Int): Boolean = {
      nbits = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m != 0xd0 + expected) return false
      pos += 2
      hitMarker = false
      true
    }

    def decode(h: Huff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val x = bit()
        if (x < 0) return -1
        code = (code << 1) | x
        val off = code - h.minCode(l)
        if (off >= 0 && off < h.count(l)) return h.huffval(h.firstIdx(l) + off)
        l += 1
      }
      -1
    }
  }

  /** T.81 F.2.2.1 EXTEND: map a `size`-bit magnitude to its signed
    * value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  // ===== IDCT / FDCT (definition form, StrictMath table) =====

  private[operators] def idct(in: Array[Double], out: Array[Double]): Unit = {
    // rows then cols, separable
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * in(y * 8 + u) * Cos(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          s += cv * tmp(v * 8 + x) * Cos(yy * 8 + v)
          v += 1
        }
        out(yy * 8 + x) = s / 2.0
        yy += 1
      }
      x += 1
    }
  }

  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * Cos(x * 8 + u); x += 1 }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + uu) * Cos(y * 8 + v); y += 1 }
        val cu = if (uu == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + uu) = 0.25 * cu * cv * s
        uu += 1
      }
      v += 1
    }
  }

  // ===== decoder =====

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Int = 0
    var acTab: Int = 0
    var pred: Int = 0
    var plane: Array[Int] = null
    var planeW: Int = 0
    var planeH: Int = 0
    // progressive state: DCT coefficients accumulated across scans
    // (natural order within each 64-entry block), MCU-padded block grid
    // dims, and the UNPADDED block dims non-interleaved scans cover
    var coefs: Array[Int] = null
    var blocksW: Int = 0
    var blocksH: Int = 0
    var wb: Int = 0
    var hb: Int = 0
  }

  // debug capture (spec tooling only): when enabled, the decoder dumps
  // each component's raw quantized coefficients (natural order, padded
  // block grid) so a spec can diff the baseline and progressive entropy
  // paths against each other coefficient-by-coefficient
  private[graft] var debugCapture = false
  private[graft] var debugCoefs: Array[Array[Int]] = null

  /** Decode a baseline JPEG. None for progressive/arithmetic/12-bit/
    * unsupported sampling or any malformed/truncated stream. */
  def decode(b: Array[Byte]): Option[Decoded] = {
    try decodeImpl(b)
    catch {
      case _: Exception => None // poison-payload contract
      // an allocation failure from a hostile header is an Error, not an
      // Exception; the Png.PoisonSampleCap guards make this unreachable
      // in practice, but the never-kill-a-scan contract covers it anyway
      case _: OutOfMemoryError => None
    }
  }

  private def decodeImpl(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val qt = Array.ofDim[Int](4, 64)     // raster order
    val qtSeen = new Array[Boolean](4)
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var progressive = false
    var sawScan = false
    var maxH = 1; var maxV = 1; var mcuCols = 0; var mcuRows = 0

    def u16(o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    while (pos + 2 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      pos += 2
      if (marker == 0xd9) {
        // EOI: progressive streams END here — dequant + IDCT the
        // accumulated coefficients; for baseline an EOI before SOS is
        // malformed (baseline returns from entropyDecode directly)
        return if (progressive && sawScan)
          finishProgressive(comps, qt, qtSeen, w, h, maxH, maxV)
        else None
      }
      if (pos + 2 > b.length) return None
      val segLen = u16(pos)
      if (segLen < 2 || pos + segLen > b.length) return None
      val segEnd = pos + segLen
      var nextPos = segEnd
      marker match {
        case 0xdb => // DQT
          var o = pos + 2
          while (o < segEnd) {
            val pq = (b(o) & 0xff) >> 4
            val tq = b(o) & 0x0f
            if (pq != 0 || tq > 3 || o + 1 + 64 > segEnd) return None
            var i = 0
            while (i < 64) { qt(tq)(Zigzag(i)) = b(o + 1 + i) & 0xff; i += 1 }
            qtSeen(tq) = true
            o += 65
          }
        case 0xc4 => // DHT
          var o = pos + 2
          while (o + 17 <= segEnd) {
            val tc = (b(o) & 0xff) >> 4
            val th = b(o) & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) { bits(i) = b(o + i) & 0xff; total += bits(i); i += 1 }
            if (o + 17 + total > segEnd) return None
            val hv = new Array[Int](total)
            i = 0
            while (i < total) { hv(i) = b(o + 17 + i) & 0xff; i += 1 }
            val tab = new Huff(bits, hv)
            if (tc == 0) dcH(th) = tab else acH(th) = tab
            o += 17 + total
          }
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          progressive = marker == 0xc2
          if ((b(pos + 2) & 0xff) != 8) return None
          h = u16(pos + 3); w = u16(pos + 5)
          val nc = b(pos + 7) & 0xff
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
          // poison cap (shared with Png): a tiny payload whose SOF
          // claims 65535×65535 would command multi-GB plane/output
          // allocations before any entropy data is read — reject HERE
          if (w.toLong * h * 3 > Png.PoisonSampleCap) return None
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = b(o + 1) & 0xff
            Comp(b(o) & 0xff, hv >> 4, hv & 0x0f, b(o + 2) & 0x0f)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 ||
              c.tq > 3)) return None
          maxH = comps.map(_.h).max; maxV = comps.map(_.v).max
          mcuCols = (w + 8 * maxH - 1) / (8 * maxH)
          mcuRows = (h + 8 * maxV - 1) / (8 * maxV)
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None // non-baseline, non-progressive SOF
        case 0xdd => // DRI
          restartInterval = u16(pos + 2)
        case 0xda => // SOS → entropy decode
          if (comps == null) return None
          val ns = b(pos + 2) & 0xff
          if (ns < 1 || ns > comps.length) return None
          val scanComps = new Array[Comp](ns)
          var i = 0
          while (i < ns) {
            val cid = b(pos + 3 + 2 * i) & 0xff
            val tt = b(pos + 4 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(return None)
            c.dcTab = tt >> 4
            c.acTab = tt & 0x0f
            scanComps(i) = c
            i += 1
          }
          if (!progressive) {
            if (ns != comps.length) return None
            return entropyDecode(b, segEnd, comps, qt, qtSeen, dcH, acH,
              w, h, restartInterval)
          }
          // progressive: spectral band + successive-approximation bits
          // ride the scan header; coefficients accumulate across scans
          val ss = b(pos + 3 + 2 * ns) & 0xff
          val se = b(pos + 4 + 2 * ns) & 0xff
          val ahal = b(pos + 5 + 2 * ns) & 0xff
          if (!sawScan) {
            comps.foreach { c =>
              c.blocksW = mcuCols * c.h; c.blocksH = mcuRows * c.v
              c.planeW = c.blocksW * 8; c.planeH = c.blocksH * 8
              if (c.planeW.toLong * c.planeH > Png.PoisonSampleCap)
                return None
              c.coefs = new Array[Int](c.blocksW * c.blocksH * 64)
              val compW = (w * c.h + maxH - 1) / maxH
              val compH = (h * c.v + maxV - 1) / maxV
              c.wb = (compW + 7) / 8; c.hb = (compH + 7) / 8
            }
            sawScan = true
          }
          val after = progressiveScan(b, segEnd, scanComps, dcH, acH,
            ss, se, ahal >> 4, ahal & 0x0f, restartInterval,
            mcuCols, mcuRows)
          if (after < 0) return None
          nextPos = after
        case _ => () // APPn/COM/etc: skip
      }
      pos = nextPos
    }
    None
  }

  private def entropyDecode(b: Array[Byte], start: Int, comps: Array[Comp],
      qt: Array[Array[Int]], qtSeen: Array[Boolean], dcH: Array[Huff],
      acH: Array[Huff], w: Int, h: Int, restartInterval: Int)
      : Option[Decoded] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcuCols = (w + 8 * maxH - 1) / (8 * maxH)
    val mcuRows = (h + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      if (!qtSeen(c.tq)) return None
      c.planeW = mcuCols * 8 * c.h
      c.planeH = mcuRows * 8 * c.v
      // MCU rounding + subsampling factors can only grow a plane past
      // the SOF0 cap, never create one from nothing — but re-check the
      // padded size anyway so no allocation ever exceeds the cap
      if (c.planeW.toLong * c.planeH > Png.PoisonSampleCap) return None
      c.plane = new Array[Int](c.planeW * c.planeH)
    }
    val dbg: Array[Array[Int]] =
      if (debugCapture)
        comps.map(c => new Array[Int](mcuCols * c.h * mcuRows * c.v * 64))
      else null
    if (debugCapture) debugCoefs = dbg
    val r = new BitReader(b, start)
    val coef = new Array[Double](64)
    val px = new Array[Double](64)
    var rstCount = 0
    var rstNext = 0
    var mr = 0
    while (mr < mcuRows) {
      var mc = 0
      while (mc < mcuCols) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          if (!r.restart(rstNext)) return None
          rstNext = (rstNext + 1) & 7
          rstCount = 0
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val dct = dcH(c.dcTab)
          val act = acH(c.acTab)
          if (dct == null || act == null) return None
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // one 8×8 block
              val dbgOff = if (dbg == null) 0 else
                ((mr * c.v + by) * mcuCols * c.h + mc * c.h + bx) * 64
              java.util.Arrays.fill(coef, 0.0)
              val t = r.decode(dct)
              if (t < 0 || t > 11) return None
              val diffBits = r.bitsN(t)
              if (t > 0 && diffBits < 0) return None
              c.pred += extend(diffBits, t)
              coef(0) = c.pred.toDouble * qt(c.tq)(0)
              if (dbg != null) dbg(ci)(dbgOff) = c.pred
              var k = 1
              var going = true
              while (going && k < 64) {
                val rs = r.decode(act)
                if (rs < 0) return None
                val run = rs >> 4
                val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) k += 16       // ZRL
                  else going = false           // EOB
                } else {
                  k += run
                  if (k > 63) return None
                  val v = r.bitsN(size)
                  if (v < 0) return None
                  val z = Zigzag(k)
                  coef(z) = extend(v, size).toDouble * qt(c.tq)(z)
                  if (dbg != null) dbg(ci)(dbgOff + z) = extend(v, size)
                  k += 1
                }
              }
              idct(coef, px)
              val ox = (mc * c.h + bx) * 8
              val oy = (mr * c.v + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  val v = StrictMath.round(px(yy * 8 + xx) + 128.0).toInt
                  c.plane((oy + yy) * c.planeW + ox + xx) =
                    if (v < 0) 0 else if (v > 255) 255 else v
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        rstCount += 1
        mc += 1
      }
      mr += 1
    }
    assemble(comps, w, h, maxH, maxV)
  }

  /** One progressive scan (T.81 G.2): DC or AC band, first pass or
    * successive-approximation refinement. Coefficients accumulate into
    * each component's `coefs` (natural order per block, scaled by 2^Al
    * through the shifts the scans themselves encode). Returns the
    * position of the next real marker after the scan's entropy data, or
    * -1 on malformed input. EOB-run and refinement-bit semantics follow
    * the spec's decode procedure (the same control flow libjpeg's
    * decoder documents for G.1.2.3). */
  private def progressiveScan(b: Array[Byte], start: Int,
      scanComps: Array[Comp], dcH: Array[Huff], acH: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int,
      mcuCols: Int, mcuRows: Int): Int = {
    if (ss > 63 || se > 63 || ss > se || al > 13) return -1
    val r = new BitReader(b, start)
    var eobrun = 0
    var rstNext = 0
    scanComps.foreach(_.pred = 0)

    // ---- per-block decoders (close over the reader and eobrun) ----
    def dcBlock(c: Comp, tab: Huff, off: Int): Boolean = {
      if (ah == 0) {
        val t = r.decode(tab)
        if (t < 0 || t > 11) return false
        val diff = if (t > 0) {
          val v = r.bitsN(t); if (v < 0) return false; extend(v, t)
        } else 0
        c.pred += diff
        c.coefs(off) = c.pred << al
      } else {
        // refinement: one bit appends to the already-placed DC value
        val bit = r.bit(); if (bit < 0) return false
        if (bit == 1) c.coefs(off) |= (1 << al)
      }
      true
    }

    def acFirstBlock(coefs: Array[Int], off: Int, act: Huff): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = r.decode(act); if (rs < 0) return false
        val run = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (run == 15) k += 16 // ZRL
          else {
            // EOBn: this block's band ends; (1<<run)+bits more blocks
            // share the end — minus this one
            eobrun = (1 << run) - 1
            if (run > 0) {
              val eb = r.bitsN(run); if (eb < 0) return false
              eobrun += eb
            }
            return true
          }
        } else {
          k += run
          if (k > se) return false
          val v = r.bitsN(s); if (v < 0) return false
          coefs(off + Zigzag(k)) = extend(v, s) << al
          k += 1
        }
      }
      true
    }

    def acRefineBlock(coefs: Array[Int], off: Int, act: Huff): Boolean = {
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      var break1 = false
      if (eobrun == 0) {
        while (k <= se && !break1) {
          val rs = r.decode(act); if (rs < 0) return false
          var run = rs >> 4; val s = rs & 15
          var insert = 0
          if (s == 0) {
            if (run != 15) {
              // EOBn in a REFINEMENT scan: unlike the first pass there
              // is NO pre-decrement — the correction phase below still
              // consumes correction bits for the CURRENT block's
              // remaining nonzero-history coefficients, and ITS
              // decrement counts this block against the run
              eobrun = (1 << run)
              if (run > 0) {
                val eb = r.bitsN(run); if (eb < 0) return false
                eobrun += eb
              }
              break1 = true
            }
            // run == 15 (ZRL): advance over 16 zero-HISTORY positions
            // below, correcting nonzero-history ones along the way
          } else {
            if (s != 1) return false // refinement magnitudes are 1 bit
            val sb = r.bit(); if (sb < 0) return false
            insert = if (sb == 1) p1 else m1
          }
          if (!break1) {
            var placed = false
            while (k <= se && !placed) {
              val z = off + Zigzag(k)
              if (coefs(z) != 0) {
                // nonzero history: consume a correction bit
                val cb = r.bit(); if (cb < 0) return false
                if (cb == 1 && (coefs(z) & p1) == 0)
                  coefs(z) += (if (coefs(z) >= 0) p1 else m1)
              } else if (run == 0) {
                if (insert != 0) coefs(z) = insert
                placed = true
              } else run -= 1
              k += 1
            }
            // a new coefficient coded past the band end is corrupt
            if (!placed && insert != 0) return false
          }
        }
      }
      if (eobrun > 0) {
        // EOB region: correction bits for every remaining nonzero-
        // history coefficient of the band
        while (k <= se) {
          val z = off + Zigzag(k)
          if (coefs(z) != 0) {
            val cb = r.bit(); if (cb < 0) return false
            if (cb == 1 && (coefs(z) & p1) == 0)
              coefs(z) += (if (coefs(z) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    def atRestart(): Boolean = {
      if (!r.restart(rstNext)) return false
      rstNext = (rstNext + 1) & 7
      eobrun = 0
      scanComps.foreach(_.pred = 0)
      true
    }

    // ---- block iteration: interleaved MCU order for multi-component
    // DC scans, component raster order (UNPADDED block grid) otherwise
    if (ss == 0) {
      if (se != 0) return -1 // DC scans carry only coefficient 0
      if (ah == 0 && scanComps.exists(c => dcH(c.dcTab) == null)) return -1
      if (scanComps.length > 1) {
        var rstCount = 0
        var mr = 0
        while (mr < mcuRows) {
          var mc = 0
          while (mc < mcuCols) {
            if (restartInterval > 0 && rstCount == restartInterval) {
              if (!atRestart()) return -1
              rstCount = 0
            }
            var ci = 0
            while (ci < scanComps.length) {
              val c = scanComps(ci)
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  val off = ((mr * c.v + by) * c.blocksW + mc * c.h + bx) * 64
                  if (!dcBlock(c, dcH(c.dcTab), off)) return -1
                  bx += 1
                }
                by += 1
              }
              ci += 1
            }
            rstCount += 1
            mc += 1
          }
          mr += 1
        }
      } else {
        val c = scanComps(0)
        var rstCount = 0
        var by = 0
        while (by < c.hb) {
          var bx = 0
          while (bx < c.wb) {
            if (restartInterval > 0 && rstCount == restartInterval) {
              if (!atRestart()) return -1
              rstCount = 0
            }
            if (!dcBlock(c, dcH(c.dcTab), (by * c.blocksW + bx) * 64))
              return -1
            rstCount += 1
            bx += 1
          }
          by += 1
        }
      }
    } else {
      // AC scans are single-component by spec
      if (scanComps.length != 1) return -1
      val c = scanComps(0)
      val act = acH(c.acTab)
      if (act == null) return -1
      var rstCount = 0
      var by = 0
      while (by < c.hb) {
        var bx = 0
        while (bx < c.wb) {
          if (restartInterval > 0 && rstCount == restartInterval) {
            if (!atRestart()) return -1
            rstCount = 0
          }
          val off = (by * c.blocksW + bx) * 64
          val ok = if (ah == 0) acFirstBlock(c.coefs, off, act)
                   else acRefineBlock(c.coefs, off, act)
          if (!ok) return -1
          rstCount += 1
          bx += 1
        }
        by += 1
      }
    }
    // advance to the next REAL marker: skip pad bits, FF fill bytes,
    // stuffed FF00, and any stray restart markers
    var p = r.pos
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) == 0xff) {
        val m = b(p + 1) & 0xff
        if (m != 0x00 && m != 0xff && (m < 0xd0 || m > 0xd7)) return p
      }
      p += 1
    }
    -1 // ran off the stream without a closing marker
  }

  /** Progressive epilogue at EOI: dequantize the accumulated
    * coefficients, IDCT every (padded) block into the component planes,
    * then assemble exactly like baseline. */
  private def finishProgressive(comps: Array[Comp], qt: Array[Array[Int]],
      qtSeen: Array[Boolean], w: Int, h: Int, maxH: Int, maxV: Int)
      : Option[Decoded] = {
    if (debugCapture) debugCoefs = comps.map(_.coefs.clone())
    val coef = new Array[Double](64)
    val px = new Array[Double](64)
    comps.foreach { c =>
      if (!qtSeen(c.tq)) return None
      c.plane = new Array[Int](c.planeW * c.planeH)
      val q = qt(c.tq)
      var by = 0
      while (by < c.blocksH) {
        var bx = 0
        while (bx < c.blocksW) {
          val off = (by * c.blocksW + bx) * 64
          var i = 0
          while (i < 64) { coef(i) = c.coefs(off + i).toDouble * q(i); i += 1 }
          idct(coef, px)
          val ox = bx * 8; val oy = by * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val v = StrictMath.round(px(yy * 8 + xx) + 128.0).toInt
              c.plane((oy + yy) * c.planeW + ox + xx) =
                if (v < 0) 0 else if (v > 255) 255 else v
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
    }
    assemble(comps, w, h, maxH, maxV)
  }

  /** Upsample the component planes to full resolution and color-convert
    * (BT.601 YCbCr) — shared by the baseline and progressive paths. */
  private def assemble(comps: Array[Comp], w: Int, h: Int, maxH: Int,
      maxV: Int): Option[Decoded] = {
    if (comps.length == 1) {
      val c = comps(0)
      val g = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { g(y * w + x) = c.plane(y * c.planeW + x); x += 1 }
        y += 1
      }
      Some(Decoded(w, h, 1, g, null))
    } else {
      val rgb = new Array[Int](w * h * 3)
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      def sample(c: Comp, x: Int, y: Int): Int =
        c.plane((y * c.v / maxV) * c.planeW + (x * c.h / maxH))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = sample(cy, x, y).toDouble
          val cbv = sample(cb, x, y) - 128.0
          val crv = sample(cr, x, y) - 128.0
          def clamp(d: Double): Int = {
            val v = StrictMath.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val o = (y * w + x) * 3
          rgb(o) = clamp(yv + 1.402 * crv)
          rgb(o + 1) = clamp(yv - 0.344136 * cbv - 0.714136 * crv)
          rgb(o + 2) = clamp(yv + 1.772 * cbv)
          x += 1
        }
        y += 1
      }
      Some(Decoded(w, h, 3, null, rgb))
    }
  }

  // ===== encoder =====

  /** libjpeg quality scaling of a base table; quality 100 → all ones
    * (the exact-constant-block property the oracles lean on). */
  private def scaledTable(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s per spec
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; n = 0
    }
  }

  private def catSize(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one level-shifted block: FDCT → quantize (StrictMath.round,
    * i.e. round half toward +∞ — deterministic; decode inverts whatever
    * the quantizer chose, so the tie direction is a free choice) → DC
    * diff + run/size ACs. */
  private def encodeBlock(bw: BitWriter, block: Array[Double], q: Array[Int],
      pred: Int, dcCodes: (Array[Int], Array[Int]),
      acCodes: (Array[Int], Array[Int])): Int = {
    val f = new Array[Double](64)
    fdct(block, f)
    val zz = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val z = Zigzag(i)
      zz(i) = StrictMath.round(f(z) / q(z)).toInt
      i += 1
    }
    val diff = zz(0) - pred
    val ds = catSize(diff)
    bw.put(dcCodes._1(ds), dcCodes._2(ds))
    if (ds > 0) bw.put(if (diff < 0) diff + (1 << ds) - 1 else diff, ds)
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { bw.put(acCodes._1(0xf0), acCodes._2(0xf0)); run -= 16 }
        val s = catSize(zz(k))
        val rs = (run << 4) | s
        bw.put(acCodes._1(rs), acCodes._2(rs))
        bw.put(if (zz(k) < 0) zz(k) + (1 << s) - 1 else zz(k), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(acCodes._1(0x00), acCodes._2(0x00)) // EOB
    zz(0)
  }

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
      payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  private def dqtSeg(id: Int, raster: Array[Int]): Array[Byte] = {
    val p = new Array[Byte](65)
    p(0) = id.toByte
    var i = 0
    while (i < 64) { p(1 + i) = raster(Zigzag(i)).toByte; i += 1 }
    p
  }

  private def dhtSeg(tcTh: Int, tab: (Array[Int], Array[Int])): Array[Byte] = {
    val (bits, hv) = tab
    val p = new Array[Byte](17 + hv.length)
    p(0) = tcTh.toByte
    var i = 1
    while (i <= 16) { p(i) = bits(i).toByte; i += 1 }
    i = 0
    while (i < hv.length) { p(17 + i) = hv(i).toByte; i += 1 }
    p
  }

  /** Encode an 8-bit GRAYSCALE image as baseline JPEG (4:4:4 single
    * component, Annex K tables at `quality`). `pixels` is w·h raster,
    * values 0-255. */
  def encodeGray(pixels: Array[Int], w: Int, h: Int,
      quality: Int = 90): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h)
    val q = scaledTable(QLumBase, quality)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    writeSeg(out, 0xdb, dqtSeg(0, q))
    writeSeg(out, 0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0))
    writeSeg(out, 0xc4, dhtSeg(0x00, DcLum))
    writeSeg(out, 0xc4, dhtSeg(0x10, AcLum))
    writeSeg(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter(out)
    val dcC = encTable(DcLum._1, DcLum._2)
    val acC = encTable(AcLum._1, AcLum._2)
    val block = new Array[Double](64)
    var pred = 0
    var by = 0
    while (by * 8 < h) {
      var bx = 0
      while (bx * 8 < w) {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            // edge blocks replicate the last row/col (the standard pad)
            val sy = math.min(by * 8 + y, h - 1)
            val sx = math.min(bx * 8 + x, w - 1)
            block(y * 8 + x) = pixels(sy * w + sx) - 128.0
            x += 1
          }
          y += 1
        }
        pred = encodeBlock(bw, block, q, pred, dcC, acC)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an RGB image as baseline 4:4:4 color JPEG (JFIF YCbCr,
    * Annex K tables at `quality`). `rgb` is interleaved w·h·3. */
  def encodeRgb444(rgb: Array[Int], w: Int, h: Int,
      quality: Int = 90): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3)
    val qL = scaledTable(QLumBase, quality)
    val qC = scaledTable(QChromBase, quality)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    writeSeg(out, 0xdb, dqtSeg(0, qL))
    writeSeg(out, 0xdb, dqtSeg(1, qC))
    writeSeg(out, 0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    writeSeg(out, 0xc4, dhtSeg(0x00, DcLum))
    writeSeg(out, 0xc4, dhtSeg(0x10, AcLum))
    writeSeg(out, 0xc4, dhtSeg(0x01, DcChrom))
    writeSeg(out, 0xc4, dhtSeg(0x11, AcChrom))
    writeSeg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val n = w * h
    val yP = new Array[Double](n); val cbP = new Array[Double](n)
    val crP = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i); val g = rgb(3 * i + 1); val b = rgb(3 * i + 2)
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
      cbP(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
      crP(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    val bw = new BitWriter(out)
    val dcL = encTable(DcLum._1, DcLum._2)
    val acL = encTable(AcLum._1, AcLum._2)
    val dcC = encTable(DcChrom._1, DcChrom._2)
    val acC = encTable(AcChrom._1, AcChrom._2)
    val block = new Array[Double](64)
    val preds = new Array[Int](3)
    def fill(plane: Array[Double], bx: Int, by: Int): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val sy = math.min(by * 8 + y, h - 1)
          val sx = math.min(bx * 8 + x, w - 1)
          block(y * 8 + x) = plane(sy * w + sx)
          x += 1
        }
        y += 1
      }
    }
    var by = 0
    while (by * 8 < h) {
      var bx = 0
      while (bx * 8 < w) {
        fill(yP, bx, by); preds(0) = encodeBlock(bw, block, qL, preds(0), dcL, acL)
        fill(cbP, bx, by); preds(1) = encodeBlock(bw, block, qC, preds(1), dcC, acC)
        fill(crP, bx, by); preds(2) = encodeBlock(bw, block, qC, preds(2), dcC, acC)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
