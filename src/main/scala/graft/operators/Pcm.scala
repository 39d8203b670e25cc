package graft.operators

/** Compressed TELEPHONY/SPEECH audio codecs in pure JVM byte math:
  * ITU-T G.711 (µ-law and A-law companding, the 8 kHz telephony
  * standard; public spec, same formulas as the classic CCITT reference
  * implementation) and IMA/DVI ADPCM (4-bit adaptive differential PCM,
  * WAVE format tag 0x11; public IMA "Recommended Practices" spec).
  *
  * These extend the engine's REAL-decode family (WAV/FLAC/BMP/PPM/JPEG/
  * PNG/GIF/TIFF) to the compressed-audio formats a speech/call-center
  * corpus actually ships — G.711 is what raw telephony captures are,
  * IMA ADPCM is the 4:1 WAV compression old tooling emits. Like every
  * codec here: partition-local, exception-free by construction (all
  * array access bounds-checked up front, None on malformed), no
  * allocation amplification (output is ≤ 2× input for G.711, ≤ 4× for
  * ADPCM — both linear).
  *
  * Encoders exist for corpus minting and roundtrip specs (the PNG
  * device: mint → decode → SQL-replayable statistic).
  */
object Pcm {

  // ===== G.711 =====

  private val Bias = 0x84
  private val Clip = 32635

  /** µ-law code byte (0..255) → linear 16-bit sample. */
  def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + Bias) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) Bias - t else t - Bias
  }

  /** Linear 16-bit sample → µ-law code byte. Note 0x7f and 0xff both
    * decode to 0 (−0 aliasing); encode picks the positive code, so the
    * identity that holds for all codes is decode∘encode∘decode = decode,
    * not encode∘decode = id. */
  def linearToUlaw(s: Int): Int = {
    var sample = s
    val sign = if (sample < 0) { sample = -sample; 0x80 } else 0
    if (sample > Clip) sample = Clip
    sample += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (sample & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (sample >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** A-law code byte (0..255) → linear 16-bit sample. */
  def alawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else t = (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** Linear 16-bit sample → A-law code byte (13-bit companding: the
    * sample's low 3 bits are discarded per the spec). */
  def linearToAlaw(s: Int): Int = {
    var pcm = s >> 3
    val mask = if (pcm >= 0) 0xd5 else { pcm = -pcm - 1; 0x55 }
    var seg = 0
    while (seg < 8 && pcm > ((0x1f << seg) | ((1 << seg) - 1))) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else {
      val shift = if (seg < 2) 1 else seg
      ((seg << 4) | ((pcm >> shift) & 0x0f)) ^ mask
    }
  }

  // ===== IMA / DVI ADPCM (WAVE format tag 0x11) =====

  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One nibble through the IMA decoder state machine; returns the new
    * (predictor, stepIndex). */
  private def imaStep(pred: Int, idx: Int, nib: Int): (Int, Int) = {
    val step = StepTable(idx)
    var diff = step >> 3
    if ((nib & 1) != 0) diff += step >> 2
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 4) != 0) diff += step
    val p0 = if ((nib & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + IndexTable(nib & 7)))
    (p, i)
  }

  /** Decode an IMA ADPCM `data` chunk region: `ch` channels, blocks of
    * `blockAlign` bytes (per channel: 4-byte header = int16 LE predictor
    * + step index + reserved, then 4-byte nibble groups interleaved by
    * channel). Returns interleaved linear samples, or None on any
    * malformed geometry — never throws, never over-allocates (output is
    * exactly the sample count the geometry implies, ≤ 2 per input byte).
    */
  def imaDecode(b: Array[Byte], off: Int, len: Int, ch: Int,
      blockAlign: Int): Option[Array[Int]] = {
    if (ch < 1 || ch > 16 || blockAlign < 4 * ch + 4 * ch ||
        blockAlign > (1 << 20) || ((blockAlign - 4 * ch) % (4 * ch)) != 0 ||
        len <= 0 || len % blockAlign != 0 ||
        off < 0 || off.toLong + len > b.length)
      return None
    val nBlocks = len / blockAlign
    val groupsPerChan = (blockAlign - 4 * ch) / (4 * ch)
    val samplesPerChan = 1 + groupsPerChan * 8
    val out = new Array[Int](nBlocks * samplesPerChan * ch)
    val pred = new Array[Int](ch)
    val idx = new Array[Int](ch)
    var blk = 0
    while (blk < nBlocks) {
      val base = off + blk * blockAlign
      val outBase = blk * samplesPerChan * ch
      var c = 0
      while (c < ch) {
        val h = base + 4 * c
        pred(c) = ((b(h) & 0xff) | ((b(h + 1) & 0xff) << 8)).toShort.toInt
        val si = b(h + 2) & 0xff
        if (si > 88) return None
        idx(c) = si
        out(outBase + c) = pred(c)
        c = c + 1
      }
      // nibble region: 4-byte groups, channel-interleaved
      var g = 0
      while (g < groupsPerChan) {
        c = 0
        while (c < ch) {
          val gb = base + 4 * ch + (g * ch + c) * 4
          var k = 0
          while (k < 4) {
            val byte = b(gb + k) & 0xff
            val s1 = imaStep(pred(c), idx(c), byte & 0x0f)
            pred(c) = s1._1; idx(c) = s1._2
            out(outBase + (1 + g * 8 + 2 * k) * ch + c) = pred(c)
            val s2 = imaStep(pred(c), idx(c), byte >> 4)
            pred(c) = s2._1; idx(c) = s2._2
            out(outBase + (1 + g * 8 + 2 * k + 1) * ch + c) = pred(c)
            k += 1
          }
          c += 1
        }
        g += 1
      }
      blk += 1
    }
    Some(out)
  }

  /** Encode interleaved linear samples as IMA ADPCM blocks. Each block
    * holds `samplesPerChan` samples per channel (first one verbatim in
    * the header); total per-channel count must be a multiple of
    * samplesPerChan and samplesPerChan must be 1 + 8k. */
  def imaEncode(samples: Array[Int], ch: Int, samplesPerChan: Int): Option[Array[Byte]] = {
    if (ch < 1 || ch > 16 || samplesPerChan < 9 ||
        (samplesPerChan - 1) % 8 != 0 ||
        samples.length % (samplesPerChan * ch) != 0 || samples.isEmpty)
      return None
    val groupsPerChan = (samplesPerChan - 1) / 8
    val blockAlign = 4 * ch + groupsPerChan * 4 * ch
    val nBlocks = samples.length / (samplesPerChan * ch)
    val out = new Array[Byte](nBlocks * blockAlign)
    val idx = new Array[Int](ch)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      val inBase = blk * samplesPerChan * ch
      val pred = new Array[Int](ch)
      var c = 0
      while (c < ch) {
        pred(c) = math.max(-32768, math.min(32767, samples(inBase + c)))
        out(base + 4 * c) = (pred(c) & 0xff).toByte
        out(base + 4 * c + 1) = ((pred(c) >> 8) & 0xff).toByte
        out(base + 4 * c + 2) = idx(c).toByte
        c += 1
      }
      var g = 0
      while (g < groupsPerChan) {
        c = 0
        while (c < ch) {
          val gb = base + 4 * ch + (g * ch + c) * 4
          var k = 0
          while (k < 4) {
            var byte = 0
            var half = 0
            while (half < 2) {
              val want = samples(inBase + (1 + g * 8 + 2 * k + half) * ch + c)
              val step = StepTable(idx(c))
              var delta = want - pred(c)
              var nib = 0
              if (delta < 0) { nib = 8; delta = -delta }
              if (delta >= step) { nib |= 4; delta -= step }
              if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
              if (delta >= (step >> 2)) { nib |= 1 }
              val s = imaStep(pred(c), idx(c), nib)
              pred(c) = s._1; idx(c) = s._2
              byte |= (nib & 0x0f) << (4 * half)
              half += 1
            }
            out(gb + k) = byte.toByte
            k += 1
          }
          c += 1
        }
        g += 1
      }
      blk += 1
    }
    Some(out)
  }

  // ===== WAV container minting for the compressed codecs =====

  private def header(formatTag: Int, ch: Int, rate: Int, bits: Int,
      blockAlign: Int, extra: Array[Byte], dataLen: Int): Array[Byte] = {
    val fmtLen = 16 + (if (extra.isEmpty) 0 else 2 + extra.length)
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + fmtLen + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + fmtLen + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(fmtLen)
      .putShort(formatTag.toShort).putShort(ch.toShort)
      .putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    if (extra.nonEmpty) { bb.putShort(extra.length.toShort); bb.put(extra) }
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** Mint a G.711 mono WAV whose data bytes ARE `codes` (µ-law when
    * `ulaw`, A-law otherwise) — the decoded samples are then the G.711
    * expansion of those bytes, SQL-replayable bit arithmetic. */
  def wavG711(codes: Array[Int], ulaw: Boolean, rate: Int = 8000): Array[Byte] =
    header(if (ulaw) 7 else 6, 1, rate, 8, 1, Array.emptyByteArray,
      codes.length) ++ codes.map(c => (c & 0xff).toByte)

  /** Mint an IMA ADPCM WAV from interleaved linear samples (fmt carries
    * the cbSize=2 samples-per-block extension real writers emit). */
  def wavImaAdpcm(samples: Array[Int], ch: Int, samplesPerChan: Int,
      rate: Int = 8000): Option[Array[Byte]] =
    imaEncode(samples, ch, samplesPerChan).map { data =>
      val blockAlign = 4 * ch + (samplesPerChan - 1) / 2 * ch
      val extra = Array[Byte]((samplesPerChan & 0xff).toByte,
        ((samplesPerChan >> 8) & 0xff).toByte)
      header(0x11, ch, rate, 4, blockAlign, extra, data.length) ++ data
    }

  /** Mint one ADPCM block per input byte with the FIXED oracle nibble
    * pattern [4,12,5,13,6,14,7,15,0,8,1,9,2,10,3,11] (all 16 codes,
    * alternating signs) and predictor = the byte: starting from step
    * index 0 the per-block decoded sum is 17·byte − 1119 — closed form,
    * replayable in SQL with no state machine. */
  val OracleNibbles: Array[Int] = Array(4, 12, 5, 13, 6, 14, 7, 15,
    0, 8, 1, 9, 2, 10, 3, 11)

  /** Per-block decoded-sum offset of [[OracleNibbles]] from step 0:
    * Σ deltas = −1119 (see PcmSpec, which recomputes it). */
  val OracleBlockOffset: Long = -1119L

  def wavAdpcmOracleBlocks(bytes: Array[Int], rate: Int = 8000): Array[Byte] = {
    val blockAlign = 4 + 8
    val data = new Array[Byte](bytes.length * blockAlign)
    var i = 0
    while (i < bytes.length) {
      val base = i * blockAlign
      data(base) = (bytes(i) & 0xff).toByte        // predictor = byte
      data(base + 1) = 0
      data(base + 2) = 0                           // step index 0
      var k = 0
      while (k < 16) {                             // nibble k: low half first
        data(base + 4 + k / 2) =
          (data(base + 4 + k / 2) |
            ((OracleNibbles(k) & 0x0f) << (4 * (k & 1)))).toByte
        k += 1
      }
      i += 1
    }
    val extra = Array[Byte](17, 0)                 // samplesPerBlock = 17
    header(0x11, 1, rate, 4, blockAlign, extra, data.length) ++ data
  }
}
