package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** AdpcmCodec contract: ITU-T G.711 anchor values + code-idempotence +
  * companding error bounds, IMA ADPCM quantizer math against hand-worked
  * steps, a hand-assembled WAV (independent of the encoder) pinning the
  * byte layout (nibble order, block header, fact-chunk bound), tracking
  * error on smooth signals, totality on garbage, and featurizer routing.
  */
class AdpcmCodecSpec extends AnyFunSuite {

  // ------------------------------------------------------------- G.711

  test("mu-law anchors: silence and clip map to the ITU code points") {
    assert(AdpcmCodec.muEncode(0) == 0xFF)      // +0 → 0xFF
    assert(AdpcmCodec.muDecode(0xFF) == 0)
    assert(AdpcmCodec.muEncode(-32768) == 0x00) // max negative → 0x00
    assert(AdpcmCodec.muEncode(32767) == 0x80)  // max positive → 0x80
    // decode of the extreme codes: ±(8031 << 2) = ±... exact spec values
    assert(AdpcmCodec.muDecode(0x00) == -32124)
    assert(AdpcmCodec.muDecode(0x80) == 32124)
  }

  test("a-law anchors: small magnitudes land in segment 0") {
    // pcm in [-8, 7] → p13 = 0 (positives) → mant 0, seg 0
    assert(AdpcmCodec.aDecode(AdpcmCodec.aEncode(0)) == 8)  // seg0 midpoint
    assert(AdpcmCodec.aDecode(AdpcmCodec.aEncode(-1)) == -8)
    // A-law max magnitude: seg 7, mant 15 → (15·16 + 0x108) << 6 = 32256
    assert(AdpcmCodec.aDecode(AdpcmCodec.aEncode(32767)) == 32256)
  }

  test("g711 code idempotence: encode(decode(code)) reproduces the code's value") {
    // decode is injective on magnitudes; re-encoding the decoded value
    // must land back on a code with the identical decoded value (for all
    // 256 µ-law and 256 A-law codes — the standard consistency check)
    for (c <- 0 until 256) {
      val mu = AdpcmCodec.muDecode(c)
      assert(AdpcmCodec.muDecode(AdpcmCodec.muEncode(mu)) == mu, s"mu code $c")
      val al = AdpcmCodec.aDecode(c)
      assert(AdpcmCodec.aDecode(AdpcmCodec.aEncode(al)) == al, s"a code $c")
    }
  }

  test("g711 companding error is bounded by the segment quantization step") {
    var x = -32768
    while (x <= 32767) {
      val mu = AdpcmCodec.muDecode(AdpcmCodec.muEncode(x))
      // µ-law: segment step is 2^(exp+3) ≤ 1024; clip region adds ≤ 132
      assert(math.abs(mu - x) <= 1024, s"mu err at $x: $mu")
      val al = AdpcmCodec.aDecode(AdpcmCodec.aEncode(x))
      // A-law: 13-bit domain, largest interval 2^7 · 8 = 1024 (+ clip tail)
      assert(math.abs(al - x) <= 1024, s"a err at $x: $al")
      x += 7 // sweep a coprime stride across the full range
    }
  }

  // -------------------------------------------------------- IMA quantizer

  test("ima decode steps match hand-worked spec walks") {
    // index 0 ⇒ step 7. nibble 3 (mag 3): diffq = 0 + 3 + 1 = 4
    assert(AdpcmCodec.imaDecodeStep(3, 100, 0) == ((104, 0))) // idx −1 clamped
    // nibble 8 (sign, mag 0): diffq = 7 >> 3 = 0, index −1 → clamp 0
    assert(AdpcmCodec.imaDecodeStep(8, 104, 0) == ((104, 0)))
    // nibble 15 (sign, mag 7): diffq = 0 + 7 + 3 + 1 = 11, index +8
    assert(AdpcmCodec.imaDecodeStep(15, 104, 0) == ((93, 8)))
    // index 8 ⇒ step 16: nibble 0: diffq = 2, index −1
    assert(AdpcmCodec.imaDecodeStep(0, 93, 8) == ((95, 7)))
    // predictor clamps at the rails
    assert(AdpcmCodec.imaDecodeStep(7, 32767, 88)._1 == 32767)
    assert(AdpcmCodec.imaDecodeStep(15, -32768, 88)._1 == -32768)
  }

  test("ima encoder step tracks its own decoder (spec invariant)") {
    val rnd = new scala.util.Random(11)
    var pred = 0; var idx = 0
    for (_ <- 0 until 5000) {
      val s = rnd.nextInt(65536) - 32768
      val (nib, np, ni) = AdpcmCodec.imaEncodeStep(s, pred, idx)
      assert((np, ni) == AdpcmCodec.imaDecodeStep(nib, pred, idx))
      pred = np; idx = ni
    }
  }

  // --------------------------------------------- byte layout (independent)

  /** Hand-assembled IMA WAV: fmt 0x11 (blockAlign 12 ⇒ 17 samples/block),
    * fact = 5, data = header(predictor 100, index 0) + nibbles
    * [3, 8, 15, 0] packed low-first → bytes 0x83, 0x0F. Built byte by
    * byte, NOT via the encoder — pins the container layout and nibble
    * order the oracle and encoder both assume.
    */
  private def handWav(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = (0 until 4).foreach(b => bos.write((v >> (8 * b)) & 0xFF))
    def w16(v: Int): Unit = (0 until 2).foreach(b => bos.write((v >> (8 * b)) & 0xFF))
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(4 + 26 + 12 + 14); tag("WAVE")
    tag("fmt "); w32(18)
    w16(0x11); w16(1); w32(8000); w32(4000); w16(12); w16(4); w16(2)
    tag("fact"); w32(4); w32(5)
    tag("data"); w32(6)
    w16(100); bos.write(0); bos.write(0)  // block header
    bos.write(0x83); bos.write(0x0F)      // nibbles 3,8 then 15,0
    bos.toByteArray
  }

  test("hand-assembled ADPCM WAV decodes to the hand-walked samples") {
    val pcm = AdpcmCodec.decodePcm(handWav())
      .getOrElse(fail("decode refused the hand-assembled WAV"))
    assert(pcm.codec == "ima_adpcm")
    assert(pcm.sampleRate == 8000)
    assert(pcm.samples.toSeq == Seq(100, 104, 104, 93, 95))
  }

  test("encoder output re-decodes exactly and spans blocks with index carry") {
    val n = 1300 // > 2 blocks at blockAlign 256 (505 samples/block)
    val sig = Array.tabulate(n)(t => ((7 * t * t) % 8192) - 4096)
    val bytes = AdpcmCodec.encodeImaWav(8000, sig)
    val pcm = AdpcmCodec.decodePcm(bytes).getOrElse(fail("self-decode failed"))
    assert(pcm.samples.length == n)
    // block headers store the input verbatim
    assert(pcm.samples(0) == sig(0))
    assert(pcm.samples(505) == sig(505))
    assert(pcm.samples(1010) == sig(1010))
    // replay the codec state machine sequentially (independent loop) and
    // demand bit-identical reconstruction — including index carry at 505
    var pred = sig(0); var idx = 0
    val expect = new Array[Int](n); expect(0) = pred
    for (t <- 1 until n) {
      if (t % 505 == 0) { expect(t) = sig(t); pred = sig(t) }
      else {
        val (_, np, ni) = AdpcmCodec.imaEncodeStep(sig(t), pred, idx)
        pred = np; idx = ni; expect(t) = np
      }
    }
    // NB: idx deliberately NOT reset at headers — the format carries it
    assert(pcm.samples.sameElements(expect))
  }

  test("ima tracks a smooth signal within one quantizer step") {
    val n = 4000
    val sig = Array.tabulate(n)(t =>
      (2000 * math.sin(t / 40.0)).toInt) // ≤ ~50/sample slope
    val pcm = AdpcmCodec.decodePcm(AdpcmCodec.encodeImaWav(8000, sig))
      .getOrElse(fail("decode failed"))
    val maxErr = sig.indices.map(t => math.abs(pcm.samples(t) - sig(t))).max
    assert(maxErr <= 256, s"ADPCM lost track of a smooth signal: err $maxErr")
  }

  test("g711 wav round-trips through the container with exact compander values") {
    val sig = Array.tabulate(777)(t => ((t * 511) % 65536) - 32768)
    for (mu <- Seq(true, false)) {
      val pcm = AdpcmCodec.decodePcm(AdpcmCodec.encodeG711Wav(8000, sig, mu))
        .getOrElse(fail(s"decode failed mu=$mu"))
      assert(pcm.codec == (if (mu) "ulaw" else "alaw"))
      assert(pcm.samples.length == sig.length)
      val ref = sig.map(v =>
        if (mu) AdpcmCodec.muDecode(AdpcmCodec.muEncode(v))
        else AdpcmCodec.aDecode(AdpcmCodec.aEncode(v)))
      assert(pcm.samples.sameElements(ref))
    }
  }

  // ------------------------------------------------------------- totality

  test("decodePcm is total on arbitrary bytes") {
    val rnd = new scala.util.Random(23)
    for (len <- Seq(0, 1, 11, 43, 44, 45, 200, 4096)) {
      for (_ <- 0 until 50) {
        val b = new Array[Byte](len); rnd.nextBytes(b)
        AdpcmCodec.decodePcm(b) // must not throw
      }
      // adversarial: valid RIFF/WAVE magic, garbage chunks
      val b = new Array[Byte](math.max(len, 12)); rnd.nextBytes(b)
      "RIFF".getBytes.copyToArray(b, 0); "WAVE".getBytes.copyToArray(b, 8)
      AdpcmCodec.decodePcm(b)
    }
    // truncated data chunk: encoder output cut at every prefix length
    val full = AdpcmCodec.encodeImaWav(8000, Array.tabulate(600)(t => t % 997))
    for (cut <- 0 to full.length by 7) AdpcmCodec.decodePcm(full.take(cut))
  }

  test("decoder routes compressed WAV into the real featurizer path") {
    val sig = Array.tabulate(3000)(t => (3000 * math.sin(t / 9.0)).toInt)
    for (bytes <- Seq(AdpcmCodec.encodeImaWav(8000, sig),
        AdpcmCodec.encodeG711Wav(8000, sig, mu = true),
        AdpcmCodec.encodeG711Wav(8000, sig, mu = false))) {
      val wav = AdpcmCodec.decode(bytes).getOrElse(fail("route failed"))
      assert(wav.sampleRate == 8000 && wav.channels == 1)
      assert(wav.samples.length == sig.length)
      // strict mode must PASS now — these are real decodes, not fakes
      val dec = new Multimodal.DefaultDecoder(strict = true)
      val rows = dec.features(Multimodal.MediaRow(
        "a", "audio", "application/wav", bytes, Map.empty))
      assert(rows.length == 1 && rows.head.feature_real)
      assert(rows.head.width == 8000 && rows.head.height == 1)
    }
  }
}
