package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Pcm}

/** G.711 + IMA ADPCM codec verification at the PNG bar:
  *  - G.711 decode pinned EXACTLY against the JDK's independent codec
  *    (javax.sound ULAW/ALAW → PCM conversion) for all 256 codes;
  *  - code-level and value-level roundtrip identities;
  *  - the ADPCM state machine pinned against an independent inline
  *    transcription of the IMA spec, the oracle constant recomputed;
  *  - container routing through the Multimodal sniff chain;
  *  - poison payloads degrade to None/stub, never throw.
  */
class PcmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def jdkG711(codes: Array[Int],
      enc: javax.sound.sampled.AudioFormat.Encoding): Array[Int] = {
    import javax.sound.sampled._
    val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val bytes = codes.map(c => (c & 0xff).toByte)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), src, bytes.length.toLong)
    val conv = AudioSystem.getAudioInputStream(dst, ais)
    val out = conv.readAllBytes()
    Array.tabulate(out.length / 2)(i =>
      (((out(2 * i) & 0xff) | ((out(2 * i + 1) & 0xff) << 8)).toShort).toInt)
  }

  test("g711: ulaw/alaw decode matches the JDK codec exactly for all 256 codes") {
    import javax.sound.sampled.AudioFormat.Encoding
    val codes = Array.tabulate(256)(identity)
    val jdkU = jdkG711(codes, Encoding.ULAW)
    val jdkA = jdkG711(codes, Encoding.ALAW)
    assert(jdkU.length === 256 && jdkA.length === 256)
    for (c <- 0 until 256) {
      assert(Pcm.ulawToLinear(c) === jdkU(c), s"ulaw code $c")
      assert(Pcm.alawToLinear(c) === jdkA(c), s"alaw code $c")
    }
  }

  test("g711: roundtrip identities") {
    // value-level identity holds for every code (encode of a decoded
    // value re-decodes to the same value)...
    for (c <- 0 until 256) {
      assert(Pcm.ulawToLinear(Pcm.linearToUlaw(Pcm.ulawToLinear(c))) ===
        Pcm.ulawToLinear(c), s"ulaw value roundtrip $c")
      assert(Pcm.alawToLinear(Pcm.linearToAlaw(Pcm.alawToLinear(c))) ===
        Pcm.alawToLinear(c), s"alaw value roundtrip $c")
      // ...and code-level identity for every code except µ-law 0x7f,
      // the −0 alias (0x7f and 0xff both decode to 0; encode picks the
      // positive code 0xff)
      if (c != 0x7f)
        assert(Pcm.linearToUlaw(Pcm.ulawToLinear(c)) === c, s"ulaw code roundtrip $c")
      assert(Pcm.linearToAlaw(Pcm.alawToLinear(c)) === c, s"alaw code roundtrip $c")
    }
    // quantization error bounded by the top-segment cell width
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val s = rng.nextInt(64000) - 32000
      assert(math.abs(Pcm.ulawToLinear(Pcm.linearToUlaw(s)) - s) <= 1024)
      assert(math.abs(Pcm.alawToLinear(Pcm.linearToAlaw(s)) - s) <= 1024)
    }
  }

  test("adpcm: decode matches an independent transcription of the IMA spec") {
    // independent inline state machine (transcribed fresh from the
    // published algorithm, structured differently from Pcm.imaStep)
    val steps = Pcm.StepTable
    def reference(pred0: Int, idx0: Int, nibs: Seq[Int]): Seq[Int] = {
      var pred = pred0; var idx = idx0
      nibs.map { nib =>
        val step = steps(idx)
        val d = (if ((nib & 4) != 0) step else 0) +
          (if ((nib & 2) != 0) step / 2 else 0) +
          (if ((nib & 1) != 0) step / 4 else 0) + step / 8
        pred = if ((nib & 8) != 0) pred - d else pred + d
        pred = math.max(-32768, math.min(32767, pred))
        idx = math.max(0, math.min(88,
          idx + Array(-1, -1, -1, -1, 2, 4, 6, 8)(nib & 7)))
        pred
      }
    }
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 50) {
      val n = 16 + 8 * rng.nextInt(4)            // 1 + 8k samples, k>=2
      val spb = n + 1
      val samples = Array.tabulate(spb)(i =>
        if (i == 0) rng.nextInt(2000) - 1000 else 0)
      // build a block by hand: random nibbles, random start index
      val idx0 = rng.nextInt(60)
      val nibs = Array.fill(n)(rng.nextInt(16))
      val ch = 1
      val blockAlign = 4 + n / 2
      val block = new Array[Byte](blockAlign)
      block(0) = (samples(0) & 0xff).toByte
      block(1) = ((samples(0) >> 8) & 0xff).toByte
      block(2) = idx0.toByte
      for (k <- 0 until n)
        block(4 + k / 2) = (block(4 + k / 2) |
          ((nibs(k) & 0x0f) << (4 * (k & 1)))).toByte
      val got = Pcm.imaDecode(block, 0, blockAlign, ch, blockAlign)
      assert(got.isDefined, s"trial $trial")
      val want = samples(0) +: reference(samples(0), idx0, nibs.toSeq)
      assert(got.get.toSeq === want, s"trial $trial")
    }
  }

  test("adpcm: oracle block constant recomputed; mint decodes to closed form") {
    // recompute OracleBlockOffset from the state machine itself
    val steps = Pcm.StepTable
    var pred = 0; var idx = 0; var sum = 0L
    for (nib <- Pcm.OracleNibbles) {
      val step = steps(idx)
      var d = step >> 3
      if ((nib & 1) != 0) d += step >> 2
      if ((nib & 2) != 0) d += step >> 1
      if ((nib & 4) != 0) d += step
      pred = if ((nib & 8) != 0) pred - d else pred + d
      idx = math.max(0, math.min(88,
        idx + Array(-1, -1, -1, -1, 2, 4, 6, 8)(nib & 7)))
      sum += pred
    }
    assert(sum === Pcm.OracleBlockOffset)
    // the minted oracle WAV decodes to exactly 17·b − 1119 per block
    // (raw state machine; the container roundtrip is the routing test)
    val bytes = Array(32, 77, 126, 120)
    val wav = Pcm.wavAdpcmOracleBlocks(bytes)
    val dataOff = wav.length - bytes.length * 12   // 12-byte mono blocks
    val got = Pcm.imaDecode(wav, dataOff, bytes.length * 12, 1, 12)
    assert(got.isDefined)
    assert(got.get.length === bytes.length * 17)
    val expSum = bytes.map(b => 17L * b + Pcm.OracleBlockOffset).sum
    assert(got.get.map(_.toLong).sum === expSum)
  }

  test("adpcm: encode→decode roundtrip tracks a smooth signal; stereo interleave") {
    val spb = 33
    val n = spb * 4
    val mono = Array.tabulate(n)(i =>
      (4000 * math.sin(i / 9.0)).toInt)
    val enc = Pcm.imaEncode(mono, 1, spb)
    assert(enc.isDefined)
    val dec = Pcm.imaDecode(enc.get, 0, enc.get.length, 1, 4 + (spb - 1) / 2).get
    assert(dec.length === n)
    // block-leading samples are verbatim; adaptive tracking keeps the
    // rest within a few steps of the source on a smooth signal
    val err = dec.zip(mono).map { case (a, b) => math.abs(a - b) }
    assert(err.max <= 2500, s"max err ${err.max}")
    assert(err.sum.toDouble / n <= 300, s"mean err ${err.sum.toDouble / n}")
    // stereo: per-channel streams decode independently — interleaved
    // encode/decode equals two mono passes
    val left = Array.tabulate(spb)(i => (1000 * math.sin(i / 5.0)).toInt)
    val right = Array.tabulate(spb)(i => (800 * math.cos(i / 7.0)).toInt)
    val inter = Array.tabulate(2 * spb)(i =>
      if (i % 2 == 0) left(i / 2) else right(i / 2))
    val st = Pcm.imaEncode(inter, 2, spb).get
    val sd = Pcm.imaDecode(st, 0, st.length, 2, 8 + (spb - 1)).get
    val lm = Pcm.imaDecode(Pcm.imaEncode(left, 1, spb).get, 0,
      4 + (spb - 1) / 2, 1, 4 + (spb - 1) / 2).get
    val rm = Pcm.imaDecode(Pcm.imaEncode(right, 1, spb).get, 0,
      4 + (spb - 1) / 2, 1, 4 + (spb - 1) / 2).get
    assert(sd.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }.toSeq
      === lm.toSeq)
    assert(sd.zipWithIndex.collect { case (v, i) if i % 2 == 1 => v }.toSeq
      === rm.toSeq)
  }

  test("g711/adpcm: sniff-chain routing and poison degrade") {
    import spark.implicits._
    val codes = Array(0x00, 0x55, 0x7f, 0x80, 0xd5, 0xff)
    val uw = Pcm.wavG711(codes, ulaw = true)
    val aw = Pcm.wavG711(codes, ulaw = false)
    val ad = Pcm.wavAdpcmOracleBlocks(Array(65, 66))
    // poison: truncated ADPCM (partial block), hostile step index, zero
    // channels, giant blockAlign — all must degrade, never throw
    val adDataOff = ad.length - 2 * 12             // 2 mono 12-byte blocks
    val poison = Seq(
      ad.take(ad.length - 3),
      { val p = ad.clone(); p(adDataOff + 2) = 99.toByte; p }, // stepIdx > 88
      uw.take(20))
    val rows = Seq(
      (1L, "audio", uw.length.toLong, uw),
      (2L, "audio", aw.length.toLong, aw),
      (3L, "audio", ad.length.toLong, ad)) ++
      poison.zipWithIndex.map { case (p, i) =>
        (10L + i, "audio", p.length.toLong, p) }
    val out = Multimodal.decode(
        rows.toDF("doc_id", "modality", "byte_len", "payload"))
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).format === "g711")
    assert(out(2L).format === "g711")
    assert(out(3L).format === "adpcm")
    val expU = codes.map(Pcm.ulawToLinear).sum
    val expA = codes.map(Pcm.alawToLinear).sum
    assert(math.round(out(1L).mean_value * codes.length) === expU)
    assert(math.round(out(2L).mean_value * codes.length) === expA)
    assert(out(10L).format === "unknown")
    assert(out(11L).format === "unknown")
    assert(out(12L).format === "unknown")
  }
}
