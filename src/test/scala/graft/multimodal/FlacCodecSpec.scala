package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FlacCodec contract: lossless round-trip across subframe/stereo shapes,
  * totality on garbage, corruption detection (CRC framing), and
  * featurizer equivalence with the WAV path on identical PCM.
  */
class FlacCodecSpec extends AnyFunSuite {

  private def rt(rate: Int, chans: Array[Array[Int]],
      blockSize: Int = 4096,
      mode: FlacCodec.StereoMode = FlacCodec.Independent): FlacCodec.Pcm = {
    val bytes = FlacCodec.encode(rate, chans, blockSize, mode)
    assert(bytes.take(4).sameElements("fLaC".getBytes("US-ASCII")))
    val pcm = FlacCodec.decode(bytes)
      .getOrElse(fail(s"decode refused its own encoding (mode=$mode)"))
    assert(pcm.sampleRate == rate)
    assert(pcm.numChannels == chans.length)
    pcm
  }

  private def assertSame(pcm: FlacCodec.Pcm, chans: Array[Array[Int]]): Unit =
    chans.indices.foreach { c =>
      assert(pcm.channels(c).sameElements(chans(c)),
        s"channel $c differs after round-trip")
    }

  private def randPcm(rnd: scala.util.Random, n: Int): Array[Int] =
    Array.fill(n)(rnd.nextInt(65536) - 32768)

  test("round-trip: mono, every subframe shape, multi-block + short tail") {
    val rnd = new scala.util.Random(7)
    // constant (CONSTANT subframe), ramp (FIXED order picks >0), noise
    // (order 0 / high rice param), and lengths straddling block boundaries
    val shapes = Seq(
      Array.fill(100)(1234),                              // constant
      Array.tabulate(5000)(t => (t * 13 % 65536) - 32768), // the fixture ramp
      randPcm(rnd, 4096),                                 // exactly one block
      randPcm(rnd, 9001),                                 // 2 blocks + tail
      Array.tabulate(300)(t => if (t % 2 == 0) 32767 else -32768)) // extremes
    shapes.foreach { s =>
      assertSame(rt(44100, Array(s)), Array(s))
    }
  }

  test("round-trip: stereo under all four channel assignments") {
    val rnd = new scala.util.Random(11)
    val l = randPcm(rnd, 6000)
    // correlated right channel so side residuals are small (the case the
    // stereo modes exist for) plus full-range corners
    val r = Array.tabulate(6000)(t => math.max(-32768, math.min(32767, l(t) + rnd.nextInt(7) - 3)))
    Seq(FlacCodec.Independent, FlacCodec.LeftSide,
      FlacCodec.RightSide, FlacCodec.MidSide).foreach { mode =>
      assertSame(rt(22050, Array(l, r), mode = mode), Array(l, r))
    }
  }

  test("round-trip: 4-channel independent and tiny block sizes") {
    val rnd = new scala.util.Random(13)
    val chans = Array.fill(4)(randPcm(rnd, 700))
    assertSame(rt(8000, chans, blockSize = 256), chans)
    // non-power-of-two block size exercises the 16-bit blocksize-1 header path
    assertSame(rt(8000, chans, blockSize = 300), chans)
  }

  test("decode is TOTAL on arbitrary bytes: never throws, refuses cleanly") {
    val rnd = new scala.util.Random(17)
    (0 until 300).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      FlacCodec.decode(b) // must not throw
    }
    // valid magic + garbage body
    val g = "fLaC".getBytes("US-ASCII") ++ Array.fill[Byte](200)(0x5A)
    assert(FlacCodec.decode(g).isEmpty)
    assert(FlacCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("corruption never yields the original samples (CRC framing)") {
    val rnd = new scala.util.Random(19)
    val s = randPcm(rnd, 3000)
    val bytes = FlacCodec.encode(32000, Array(s))
    val orig = FlacCodec.decode(bytes).get.channels(0)
    // flip one bit in every frame-region byte (metadata ends at 4+4+34):
    // each must be caught (None) or decode to something ≠ the original —
    // CRC-16 detects all single-bit errors within a frame
    val frameStart = 42
    (frameStart until bytes.length).foreach { pos =>
      val mutated = bytes.clone()
      mutated(pos) = (mutated(pos) ^ (1 << (pos % 8))).toByte
      FlacCodec.decode(mutated) match {
        case None => ()
        case Some(p) =>
          assert(!p.channels(0).sameElements(orig),
            s"bit flip at byte $pos went undetected")
      }
    }
  }

  test("encoder is deterministic: identical bytes for identical input") {
    val s = Array.tabulate(5000)(t => ((37 + t * 13) % 65536) - 32768)
    val a = FlacCodec.encode(8100, Array(s))
    val b = FlacCodec.encode(8100, Array(s))
    assert(a.sameElements(b))
  }

  test("DefaultDecoder runs the REAL spectral path for FLAC payloads") {
    val rnd = new scala.util.Random(23)
    val s = randPcm(rnd, 4000)
    val flac = FlacCodec.encode(16000, Array(s))
    val row = Multimodal.MediaRow("clip.flac", "audio", "application/flac",
      flac, Map.empty)
    val dec = new Multimodal.DefaultDecoder()
    val f = dec.features(row)
    assert(f.length == 1 && f.head.feature_real,
      "FLAC must decode for real, not fall to the fake path")
    assert(f.head.width == 16000 && f.head.height == 1) // (rate, channels)
    // strict mode passes a FLAC payload (it used to throw here)
    val strictDec = new Multimodal.DefaultDecoder(strict = true)
    assert(strictDec.features(row).head.feature_real)
  }

  test("FLAC and WAV payloads of the SAME pcm produce identical features") {
    val rnd = new scala.util.Random(29)
    val s = randPcm(rnd, 4000)
    val flac = FlacCodec.encode(16000, Array(s))
    // minimal RIFF PCM16 mono container of the same samples
    val dataLen = s.length * 2
    val wav = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => wav.write((v >> (8 * i)) & 0xFF))
    def le16(v: Int): Unit = (0 until 2).foreach(i => wav.write((v >> (8 * i)) & 0xFF))
    wav.write("RIFF".getBytes); le32(36 + dataLen); wav.write("WAVE".getBytes)
    wav.write("fmt ".getBytes); le32(16); le16(1); le16(1); le32(16000)
    le32(16000 * 2); le16(2); le16(16)
    wav.write("data".getBytes); le32(dataLen)
    s.foreach(v => le16(v & 0xFFFF))
    val dec = new Multimodal.DefaultDecoder()
    val fFlac = dec.features(Multimodal.MediaRow("a.flac", "audio", "m", flac, Map.empty)).head
    val fWav = dec.features(Multimodal.MediaRow("a.wav", "audio", "m", wav.toByteArray, Map.empty)).head
    assert(fFlac.feature.sameElements(fWav.feature),
      "identical PCM through FLAC vs WAV must featurize identically")
    assert(fFlac.width == fWav.width && fFlac.height == fWav.height)
  }

  test("decoder handles LPC subframes and rice escape partitions") {
    // the subset encoder never emits these, so drive the decoder with a
    // hand-assembled stream: 1 frame, blockSize 16, LPC order 1
    // (coeff 1, shift 0 → prediction = previous sample) and an escape
    // partition (param 15 → 5-bit raw length)
    import scala.collection.mutable.ArrayBuffer
    val bw = new ArrayBuffer[Byte]()
    // magic + STREAMINFO for rate 8000, 1 channel, 16 bps, 16 samples
    bw ++= "fLaC".getBytes("US-ASCII")
    bw += 0x80.toByte; bw += 0; bw += 0; bw += 34
    bw += 0; bw += 16; bw += 0; bw += 16 // min/max blocksize 16
    (0 until 6).foreach(_ => bw += 0)
    // rate 8000 = 0x1F40: 20 bits 00000001111101000000
    bw += 0x01.toByte; bw += 0xF4.toByte
    bw += 0x00.toByte // rate low nibble 0 | channels-1=0 <<1 | bps-1 high bit 0
    bw += 0xF0.toByte // bps-1 low nibble 15<<4 | total-samples high 0
    bw += 0; bw += 0; bw += 0; bw += 16
    (0 until 16).foreach(_ => bw += 0)
    // frame: header + LPC(1) subframe, samples 100,101,...,115 (residual 1)
    class W { // minimal bit writer
      val buf = new ArrayBuffer[Byte](); var cur = 0; var n = 0
      def bit(v: Int): Unit = { cur = (cur << 1) | (v & 1); n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 } }
      def bits(v: Long, k: Int): Unit = (k - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
      def align(): Unit = while (n != 0) bit(0)
    }
    val f = new W
    f.bits(0x3FFE, 14); f.bit(0); f.bit(0)
    f.bits(6, 4); f.bits(0, 4); f.bits(0, 4); f.bits(4, 3); f.bit(0)
    f.bits(0, 8); f.bits(15, 8); f.align()
    val c8 = { var c = 0; f.buf.foreach { b => c = FlacCodecSpec.crc8Step(c, b) }; c }
    f.bits(c8, 8)
    f.bit(0); f.bits(32, 6); f.bit(0)  // LPC order 1
    f.bits(100L & 0xFFFF, 16)          // warmup
    f.bits(1, 4)                        // precision-1 = 1 → 2-bit coeffs
    f.bits(0, 5)                        // shift 0
    f.bits(1, 2)                        // coeff = 1 (2-bit signed)
    // residual: method 0, partition order 0, ESCAPE param 15, raw 3 bits
    f.bits(0, 2); f.bits(0, 4); f.bits(15, 4); f.bits(3, 5)
    (0 until 15).foreach(_ => f.bits(1, 3)) // 15 residuals of +1 (3-bit signed)
    f.align()
    val c16 = { var c = 0; f.buf.foreach { b => c = FlacCodecSpec.crc16Step(c, b) }; c }
    f.bits(c16, 16)
    bw ++= f.buf
    val pcm = FlacCodec.decode(bw.toArray)
      .getOrElse(fail("hand-assembled LPC/escape stream must decode"))
    assert(pcm.channels(0).sameElements(Array.tabulate(16)(100 + _)),
      "LPC(coeff=1) + escape residuals of 1 must yield 100..115")
  }
}

object FlacCodecSpec {
  // standalone CRC steps (poly 0x07 / 0x8005, init 0) for hand-assembly
  def crc8Step(c: Int, b: Byte): Int = {
    var x = c ^ (b & 0xFF)
    var k = 0
    while (k < 8) { x = if ((x & 0x80) != 0) ((x << 1) ^ 0x07) & 0xFF else (x << 1) & 0xFF; k += 1 }
    x
  }
  def crc16Step(c: Int, b: Byte): Int = {
    var x = c ^ ((b & 0xFF) << 8)
    var k = 0
    while (k < 8) { x = if ((x & 0x8000) != 0) ((x << 1) ^ 0x8005) & 0xFFFF else (x << 1) & 0xFFFF; k += 1 }
    x
  }
}
