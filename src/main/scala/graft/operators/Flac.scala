package graft.operators

/** FLAC (Free Lossless Audio Codec) in pure JVM bit math — the audio
  * member of the real-codec family, closing the lossless half of the
  * compressed-audio stub class. Implemented from the public xiph.org
  * format specification (RFC 9639); no codec library.
  *
  * ==Decoder scope==
  * `fLaC` magic + metadata walk (STREAMINFO parsed, other blocks
  * skipped); fixed- and variable-blocking frames; all blocking-size and
  * sample-rate header codes; sample sizes 8/12/16/20/24 bits (32-bit
  * streams are rejected — a +1-bit side channel would overflow the Int
  * sample lane); channel assignments: 1-8 independent channels plus the
  * three stereo decorrelations (left/side, right/side, mid/side);
  * subframe types CONSTANT, VERBATIM, FIXED orders 0-4, and LPC up to
  * order 32 (Long accumulator, arithmetic shift); rice-coded residuals
  * in both 4- and 5-bit-parameter methods, any partition order, escape
  * (raw) partitions; wasted-bits shifts. CRC-8 of every frame header and
  * CRC-16 of every frame are VERIFIED — a corrupted stream degrades to
  * None (the poison contract of [[Multimodal.decode]]), never to wrong
  * samples. Unary runs and all allocations are bounded
  * ([[Png.PoisonSampleCap]] on total samples, checked per frame BEFORE
  * the frame's buffers are sized); truncation anywhere throws into the
  * catch-all and yields None.
  *
  * ==Encoder scope==
  * Mono or stereo, 8/16-bit, fixed block size; per-block subframe choice
  * of CONSTANT / FIXED order 0-2 with a single rice partition / VERBATIM
  * (whichever is smallest); optional stereo decorrelation (left/side,
  * right/side, mid/side) to exercise the decoder's reconstruction paths;
  * correct CRC-8/CRC-16 and STREAMINFO — MINTS real FLAC payloads for
  * served queries and specs, exactly the [[Png]] encoder contract.
  */
object Flac {

  /** Decoded audio: interleaved samples (channel-major within a frame
    * position, like WAV), plus the stream parameters. */
  final case class Decoded(sampleRate: Int, channels: Int, bps: Int,
      samples: Array[Int])

  private final class Malformed extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ---------------------------------------------------------------- CRC
  /** CRC-8, poly x⁸+x²+x+1 (0x07), init 0 — frame-header checksum. */
  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — whole-frame checksum. */
  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------ bit I/O
  /** MSB-first bit reader. Every read is bounds-checked; exhaustion
    * throws Malformed into decode's catch-all (truncation = None). */
  private final class BitReader(b: Array[Byte]) {
    var pos: Long = 0L // absolute bit position
    private val limit: Long = b.length.toLong * 8

    def bytePos: Int = (pos >>> 3).toInt
    def aligned: Boolean = (pos & 7) == 0
    def alignToByte(): Unit = pos = (pos + 7) & ~7L
    def hasBytes(n: Int): Boolean = pos + n.toLong * 8 <= limit

    def u(n: Int): Int = {
      if (n == 0) return 0
      if (pos + n > limit) fail()
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        v = (v << 1) | ((b((p >>> 3).toInt) >> (7 - (p & 7)).toInt) & 1)
        i += 1
      }
      pos += n
      v
    }

    def uLong(n: Int): Long = {
      if (n == 0) return 0L
      if (pos + n > limit) fail()
      var v = 0L
      var i = 0
      while (i < n) {
        val p = pos + i
        v = (v << 1) | ((b((p >>> 3).toInt) >> (7 - (p & 7)).toInt) & 1)
        i += 1
      }
      pos += n
      v
    }

    /** Signed n-bit two's-complement read. */
    def s(n: Int): Int = {
      val v = u(n)
      if (n == 0 || n == 32) v else (v << (32 - n)) >> (32 - n)
    }

    /** Unary: q zero bits then a one bit → q. Inherently bounded (every
      * bit consumes input; EOF throws), capped anyway so a crafted
      * all-zeros megabyte fails in one check instead of a spin. */
    def unary(): Int = {
      var q = 0
      while (u(1) == 0) {
        q += 1
        if (q > (1 << 26)) fail()
      }
      q
    }
  }

  /** MSB-first bit writer (encoder side). */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0

    def put(n: Int, value: Int): Unit = putLong(n, value.toLong & 0xffffffffL)
    def putLong(n: Int, value: Long): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((value >>> i) & 1L).toInt
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def alignToByte(): Unit = if (nBits > 0) putLong(8 - nBits, 0L)
    def bitLength: Long = out.size().toLong * 8 + nBits
    def toBytes: Array[Byte] = { alignToByte(); out.toByteArray }
  }

  // ------------------------------------------------------------- decode
  def decode(b: Array[Byte]): Option[Decoded] = {
    try decodeImpl(b)
    catch {
      case _: Exception => None
      case _: OutOfMemoryError => None // poison contract; cap makes this moot
    }
  }

  private val RateTable = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)

  private def decodeImpl(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 42) return None // magic + block header + STREAMINFO
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
    val r = new BitReader(b)
    r.pos = 32L
    // metadata blocks; first MUST be STREAMINFO (type 0, 34 bytes)
    var last = r.u(1) == 1
    if (r.u(7) != 0 || r.u(24) != 34) return None
    r.u(16) // min block size
    r.u(16) // max block size
    r.u(24); r.u(24) // min/max frame size (0 = unknown)
    val rate = r.u(20)
    val channels = r.u(3) + 1
    val bps = r.u(5) + 1
    val declared = r.uLong(36) // total inter-channel samples (0 = unknown)
    r.pos += 128 // MD5 (unverified — zeros = unset is common)
    if (rate <= 0 || bps < 4 || bps > 24) return None
    while (!last) { // skip remaining metadata blocks
      last = r.u(1) == 1
      r.u(7)
      val len = r.u(24)
      if (!r.hasBytes(len)) return None
      r.pos += len.toLong * 8
    }

    val outBuf = new java.util.ArrayList[Array[Int]]()
    var total = 0L
    // frames until input exhausted (decoder stops at clean byte boundary)
    while (r.hasBytes(2)) {
      val frameStart = r.bytePos
      if (r.u(14) != 0x3ffe) return None // sync
      if (r.u(1) != 0) return None       // reserved
      r.u(1)                              // blocking strategy
      val bsCode = r.u(4)
      val srCode = r.u(4)
      val chanAssign = r.u(4)
      val ssCode = r.u(3)
      if (r.u(1) != 0) return None       // reserved
      // UTF-8-coded frame/sample number (value unused; format verified)
      val lead = r.u(8)
      if ((lead & 0x80) != 0) {
        var ones = 0
        var m = 0x80
        while ((lead & m) != 0 && ones < 8) { ones += 1; m >>= 1 }
        if (ones < 2 || ones > 7) return None
        var i = 1
        while (i < ones) {
          if ((r.u(8) & 0xc0) != 0x80) return None
          i += 1
        }
      }
      val blockSize = bsCode match {
        case 0 => return None
        case 1 => 192
        case c if c <= 5 => 576 << (c - 2)
        case 6 => r.u(8) + 1
        case 7 => r.u(16) + 1
        case c => 256 << (c - 8)
      }
      srCode match { // frame-local rate overrides ignored for stats
        case 0 => ()
        case c if c <= 11 => ()
        case 12 => r.u(8)
        case 13 | 14 => r.u(16)
        case _ => return None
      }
      val nch = if (chanAssign < 8) chanAssign + 1
        else if (chanAssign <= 10) 2
        else return None
      if (nch != channels) return None
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case _ => return None
      }
      // CRC-8 over the header bytes (frame start .. here), then verify
      if (!r.aligned) return None
      val crcPos = r.bytePos
      if (r.u(8) != crc8(b, frameStart, crcPos)) return None

      // cap total output BEFORE this frame's buffers are allocated
      total += blockSize.toLong * nch
      if (total > Png.PoisonSampleCap) return None

      val chans = new Array[Array[Int]](nch)
      var ch = 0
      while (ch < nch) {
        val isSide = (chanAssign == 8 && ch == 1) ||
          (chanAssign == 9 && ch == 0) || (chanAssign == 10 && ch == 1)
        chans(ch) = subframe(r, blockSize, if (isSide) frameBps + 1 else frameBps)
        ch += 1
      }
      // stereo decorrelation → independent L/R
      chanAssign match {
        case 8 => // left/side: R = L − S
          val l = chans(0); val s = chans(1)
          var i = 0; while (i < blockSize) { s(i) = l(i) - s(i); i += 1 }
        case 9 => // right/side: L = R + S
          val s = chans(0); val rr = chans(1)
          var i = 0
          while (i < blockSize) {
            val left = rr(i) + s(i); s(i) = left; i += 1
          }
        case 10 => // mid/side
          val mArr = chans(0); val s = chans(1)
          var i = 0
          while (i < blockSize) {
            var mid = mArr(i) << 1
            mid |= (s(i) & 1) // low bit of side restores the dropped bit
            mArr(i) = (mid + s(i)) >> 1
            s(i) = (mid - s(i)) >> 1
            i += 1
          }
        case _ => ()
      }
      r.alignToByte()
      val crc16Pos = r.bytePos
      if (r.u(16) != crc16(b, frameStart, crc16Pos)) return None
      // interleave
      val inter = new Array[Int](blockSize * nch)
      var i = 0
      while (i < blockSize) {
        var c = 0
        while (c < nch) { inter(i * nch + c) = chans(c)(i); c += 1 }
        i += 1
      }
      outBuf.add(inter)
    }
    if (outBuf.isEmpty) return None
    // STREAMINFO declared a length: a stream cut at a frame boundary is
    // well-formed frame-by-frame but still TRUNCATED — reject it (the
    // poison contract favors integrity over streamability)
    if (declared > 0 && total != declared * channels) return None
    val samples = new Array[Int](total.toInt)
    var off = 0
    outBuf.forEach { a =>
      System.arraycopy(a, 0, samples, off, a.length); off += a.length
    }
    Some(Decoded(rate, channels, bps, samples))
  }

  private def subframe(r: BitReader, blockSize: Int, bps: Int): Array[Int] = {
    if (r.u(1) != 0) fail() // padding bit
    val typ = r.u(6)
    val wasted = if (r.u(1) == 1) r.unary() + 1 else 0
    val eff = bps - wasted
    if (eff <= 0 || eff > 32) fail()
    val out = new Array[Int](blockSize)
    typ match {
      case 0 => // CONSTANT
        val v = r.s(eff)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { out(i) = r.s(eff); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED
        val order = t - 8
        if (order > blockSize) fail()
        var i = 0
        while (i < order) { out(i) = r.s(eff); i += 1 }
        residual(r, blockSize, order, out)
        fixedRestore(out, blockSize, order)
      case t if t >= 32 => // LPC
        val order = (t & 31) + 1
        if (order > blockSize) fail()
        var i = 0
        while (i < order) { out(i) = r.s(eff); i += 1 }
        val precision = r.u(4) + 1
        if (precision == 16) fail() // 0b1111 is reserved
        val shift = r.s(5)
        if (shift < 0) fail()
        val coefs = new Array[Int](order)
        var j = 0
        while (j < order) { coefs(j) = r.s(precision); j += 1 }
        residual(r, blockSize, order, out)
        i = order
        while (i < blockSize) {
          var acc = 0L
          j = 0
          while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) += (acc >> shift).toInt
          i += 1
        }
      case _ => fail()
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Restore a fixed-predictor subframe in place: out(≥order) holds the
    * residuals, out(<order) the warmup samples. */
  private def fixedRestore(out: Array[Int], n: Int, order: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 => while (i < n) { out(i) += out(i - 1); i += 1 }
      case 2 => while (i < n) { out(i) += 2 * out(i - 1) - out(i - 2); i += 1 }
      case 3 => while (i < n) {
          out(i) += 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3); i += 1
        }
      case _ => while (i < n) {
          out(i) += 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) - out(i - 4)
          i += 1
        }
    }
  }

  /** Rice-coded residual into out(order until blockSize). */
  private def residual(r: BitReader, blockSize: Int, order: Int,
      out: Array[Int]): Unit = {
    val method = r.u(2)
    if (method > 1) fail()
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.u(4)
    val partitions = 1 << po
    if (blockSize % partitions != 0) fail()
    val perPart = blockSize / partitions
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) fail()
      val param = r.u(pBits)
      if (param == escape) {
        val rawBps = r.u(5)
        var i = 0
        while (i < count) { out(idx) = r.s(rawBps); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val rem = r.u(param)
          val u = (q.toLong << param) | (rem.toLong & 0xffffffffL)
          if (u > 0xffffffffL) fail()
          val v = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag → signed
          out(idx) = v
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  // ------------------------------------------------------------- encode
  /** Encode mono samples (values must fit `bps` bits signed). */
  def encodeMono(samples: Array[Int], sampleRate: Int, bps: Int = 16,
      blockSize: Int = 4096): Array[Byte] =
    encode(samples, sampleRate, bps, channels = 1, blockSize, stereoMode = 0)

  /** Encode interleaved stereo. `stereoMode`: 0 independent, 8 left/side,
    * 9 right/side, 10 mid/side (the decoder reconstruction paths). */
  def encodeStereo(interleaved: Array[Int], sampleRate: Int, bps: Int = 16,
      blockSize: Int = 4096, stereoMode: Int = 10): Array[Byte] = {
    require(stereoMode == 0 || (stereoMode >= 8 && stereoMode <= 10))
    encode(interleaved, sampleRate, bps, channels = 2, blockSize, stereoMode)
  }

  private def encode(samples: Array[Int], sampleRate: Int, bps: Int,
      channels: Int, blockSize: Int, stereoMode: Int): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(bps >= 4 && bps <= 24)
    require(blockSize >= 1 && blockSize <= 65535)
    require(samples.length % channels == 0)
    require(sampleRate > 0 && sampleRate < (1 << 20))
    val nFrames0 = samples.length / channels
    require(nFrames0 > 0, "FLAC encode requires at least one sample")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    val lastBlock = nFrames0 % blockSize match {
      case 0 => blockSize
      case rem => rem
    }
    // fixed blocking: every frame is blockSize samples except a shorter
    // final one, so the stream's min/max block sizes follow directly
    si.put(16, math.min(math.min(blockSize, nFrames0), lastBlock))
    si.put(16, math.max(math.min(blockSize, nFrames0), lastBlock))
    si.put(24, 0); si.put(24, 0) // frame sizes unknown
    si.put(20, sampleRate)
    si.put(3, channels - 1)
    si.put(5, bps - 1)
    si.putLong(36, nFrames0.toLong)
    var i = 0
    while (i < 16) { si.put(8, 0); i += 1 } // MD5 unset
    val siBytes = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes, 0, siBytes.length)

    var frameIdx = 0L
    var off = 0
    while (off < nFrames0) {
      val bs = math.min(blockSize, nFrames0 - off)
      val w = new BitWriter
      w.put(14, 0x3ffe); w.put(1, 0); w.put(1, 0) // sync, reserved, fixed blocking
      w.put(4, 7)  // block size: 16-bit value − 1 follows
      w.put(4, 0)  // sample rate: from STREAMINFO
      w.put(4, if (channels == 2 && stereoMode != 0) stereoMode else channels - 1)
      w.put(3, bps match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
        case _ => 0
      })
      w.put(1, 0)
      utf8(w, frameIdx)
      w.put(16, bs - 1)
      val headBytes = w.toBytes // byte-aligned by construction
      val fw = new BitWriter
      headBytes.foreach(x => fw.put(8, x & 0xff))
      fw.put(8, crc8(headBytes, 0, headBytes.length))
      // channel extraction (+ decorrelation)
      val chans: Array[(Array[Int], Int)] =
        if (channels == 1) {
          val m = new Array[Int](bs)
          System.arraycopy(samples, off, m, 0, bs)
          Array((m, bps))
        } else {
          val l = new Array[Int](bs); val rr = new Array[Int](bs)
          var k = 0
          while (k < bs) {
            l(k) = samples((off + k) * 2); rr(k) = samples((off + k) * 2 + 1)
            k += 1
          }
          stereoMode match {
            case 0 => Array((l, bps), (rr, bps))
            case 8 =>
              val s = Array.tabulate(bs)(k => l(k) - rr(k))
              Array((l, bps), (s, bps + 1))
            case 9 =>
              val s = Array.tabulate(bs)(k => l(k) - rr(k))
              Array((s, bps + 1), (rr, bps))
            case _ =>
              val m = Array.tabulate(bs)(k => (l(k) + rr(k)) >> 1)
              val s = Array.tabulate(bs)(k => l(k) - rr(k))
              Array((m, bps), (s, bps + 1))
          }
        }
      chans.foreach { case (data, effBps) => writeSubframe(fw, data, effBps) }
      fw.alignToByte()
      val body = fw.toBytes
      val full = new BitWriter
      body.foreach(x => full.put(8, x & 0xff))
      full.put(16, crc16(body, 0, body.length))
      val frame = full.toBytes
      out.write(frame, 0, frame.length)
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  /** FLAC's UTF-8-style number coding (frame index for fixed blocking). */
  private def utf8(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.put(8, v.toInt); return }
    // count payload bits → bytes
    var bytes = 2
    while (bytes <= 7 && v >= (1L << (bytes * 5 + 1))) bytes += 1
    // leading byte: `bytes` ones, a zero, then the top payload bits
    val topBits = 7 - bytes
    val mask = (0xff << (8 - bytes)) & 0xff
    w.put(8, mask | ((v >>> ((bytes - 1) * 6)).toInt & ((1 << topBits) - 1)))
    var i = bytes - 2
    while (i >= 0) {
      w.put(8, 0x80 | ((v >>> (i * 6)).toInt & 0x3f))
      i -= 1
    }
  }

  /** Best-of subframe encode: CONSTANT / FIXED 0-2 + single-partition
    * rice / VERBATIM, whichever is fewest bits. */
  private def writeSubframe(w: BitWriter, data: Array[Int], bps: Int): Unit = {
    val n = data.length
    var allSame = true
    var i = 1
    while (i < n && allSame) { if (data(i) != data(0)) allSame = false; i += 1 }
    if (allSame) {
      w.put(1, 0); w.put(6, 0); w.put(1, 0)
      w.put(bps, data(0)) // writer takes the low bps bits
      return
    }
    // candidate: fixed orders 0..2 (if n > order), best rice param each
    var bestOrder = -1
    var bestParam = 0
    var bestBits = Long.MaxValue
    var order = 0
    while (order <= 2 && order < n) {
      val res = residuals(data, order)
      var param = 0
      while (param < 15) {
        var bits = order.toLong * bps + 2 + 4 + 4 // warmup + method + po + param
        var k = 0
        while (k < res.length && bits < Long.MaxValue / 2) {
          val u = zigzag(res(k))
          bits += (u >>> param) + 1 + param
          k += 1
        }
        if (bits < bestBits) { bestBits = bits; bestOrder = order; bestParam = param }
        param += 1
      }
      order += 1
    }
    val verbatimBits = n.toLong * bps
    if (bestOrder < 0 || verbatimBits <= bestBits) {
      w.put(1, 0); w.put(6, 1); w.put(1, 0)
      i = 0
      while (i < n) { w.put(bps, data(i)); i += 1 }
      return
    }
    w.put(1, 0); w.put(6, 8 + bestOrder); w.put(1, 0)
    i = 0
    while (i < bestOrder) { w.put(bps, data(i)); i += 1 }
    val res = residuals(data, bestOrder)
    w.put(2, 0)  // rice method 0 (4-bit params)
    w.put(4, 0)  // partition order 0
    w.put(4, bestParam)
    var k = 0
    while (k < res.length) {
      val u = zigzag(res(k))
      val q = (u >>> bestParam).toInt
      var z = 0
      while (z < q) { w.put(1, 0); z += 1 }
      w.put(1, 1)
      w.putLong(bestParam, u & ((1L << bestParam) - 1))
      k += 1
    }
  }

  private def zigzag(v: Int): Long = {
    val l = v.toLong
    (l << 1) ^ (l >> 63)
  }

  private def residuals(data: Array[Int], order: Int): Array[Int] = {
    val n = data.length
    val out = new Array[Int](n - order)
    var i = order
    while (i < n) {
      out(i - order) = order match {
        case 0 => data(i)
        case 1 => data(i) - data(i - 1)
        case _ => data(i) - 2 * data(i - 1) + data(i - 2)
      }
      i += 1
    }
    out
  }
}
