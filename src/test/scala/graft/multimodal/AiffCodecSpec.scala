package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** AIFF codec proof set: exact round-trips, 80-bit extended sample-rate
  * pins against hand-computed encodings (the field the format is
  * notorious for), chunk-walk robustness (unknown chunks, odd-size
  * padding, SSND offset prelude), and totality on truncations/mangles.
  */
class AiffCodecSpec extends AnyFunSuite {

  test("round-trip: mono and stereo 16-bit PCM") {
    val rnd = new scala.util.Random(0xA1FF)
    for (k <- 0 until 40) {
      val n = 1 + rnd.nextInt(5000)
      val nCh = 1 + rnd.nextInt(2)
      val chans = Array.fill(nCh)(Array.fill(n)(rnd.nextInt(65536) - 32768))
      val rate = 1 + rnd.nextInt(192000)
      val got = AiffCodec.decode(AiffCodec.encode(rate, chans))
        .getOrElse(fail(s"case $k"))
      assert(got.sampleRate == rate, s"case $k rate")
      assert(got.channels.length == nCh)
      chans.indices.foreach(c =>
        assert(got.channels(c).sameElements(chans(c)), s"case $k ch $c"))
    }
  }

  test("80-bit extended sample-rate pins (hand-computed encodings)") {
    // 44100 = 0xAC44: exponent 16383+15 = 0x400E, mantissa 0xAC44 << 48
    val b44 = AiffCodec.encode(44100, Array(Array(0)))
    val comm = 20 // FORM(12) + COMM id+size(8): rate at +8 within COMM body
    val rateOff = comm + 8
    assert((b44(rateOff) & 0xFF) == 0x40 && (b44(rateOff + 1) & 0xFF) == 0x0E)
    assert((b44(rateOff + 2) & 0xFF) == 0xAC && (b44(rateOff + 3) & 0xFF) == 0x44)
    assert((4 to 9).forall(i => b44(rateOff + i) == 0))
    // 8000 = 0x1F40: exponent 16383+12 = 0x400B, mantissa 0x1F40 << 51 =
    // top bytes FA 00
    val b8k = AiffCodec.encode(8000, Array(Array(0)))
    assert((b8k(rateOff) & 0xFF) == 0x40 && (b8k(rateOff + 1) & 0xFF) == 0x0B)
    assert((b8k(rateOff + 2) & 0xFF) == 0xFA && (b8k(rateOff + 3) & 0xFF) == 0x00)
    // rate 1: exponent 16383, mantissa 1L << 63 = 0x80...
    val b1 = AiffCodec.encode(1, Array(Array(0)))
    assert((b1(rateOff) & 0xFF) == 0x3F && (b1(rateOff + 1) & 0xFF) == 0xFF)
    assert((b1(rateOff + 2) & 0xFF) == 0x80)
  }

  test("chunk walk: unknown chunks, odd-size padding, SSND offset prelude") {
    val base = AiffCodec.encode(8000, Array(Array(100, -200, 300)))
    // rebuild with an unknown odd-sized chunk before COMM and an SSND
    // offset prelude of 4 junk bytes
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Int): Unit = { w16(v >>> 16); w16(v & 0xFFFF) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    val comm = java.util.Arrays.copyOfRange(base, 12, 12 + 8 + 18)
    tag("FORM"); w32(4 + 8 + 3 + 1 + 26 + 8 + 8 + 4 + 6)
    tag("AIFF")
    tag("ANNO"); w32(3); out.write('h'); out.write('i'); out.write('!')
    out.write(0) // pad byte for the odd size
    out.write(comm)
    tag("SSND"); w32(8 + 4 + 6); w32(4); w32(0)
    out.write(Array[Byte](9, 9, 9, 9)) // offset prelude: skipped
    w16(100 & 0xFFFF); w16(-200 & 0xFFFF); w16(300 & 0xFFFF)
    val got = AiffCodec.decode(out.toByteArray).getOrElse(fail("decode"))
    assert(got.channels(0).sameElements(Array(100, -200, 300)))
  }

  test("rejection subset: wrong magic, bad COMM, non-integer rate") {
    val ok = AiffCodec.encode(8000, Array(Array(1, 2, 3)))
    val wrongForm = ok.clone(); wrongForm(0) = 'X'.toByte
    assert(AiffCodec.decode(wrongForm).isEmpty)
    val wrongType = ok.clone(); wrongType(8) = 'W'.toByte
    assert(AiffCodec.decode(wrongType).isEmpty)
    // low mantissa bit set → non-integer rate must be rejected, not rounded
    val fracRate = ok.clone(); fracRate(37) = 1 // last mantissa byte
    assert(AiffCodec.decode(fracRate).isEmpty)
  }

  test("totality: truncations and mangles never throw") {
    val rnd = new scala.util.Random(0xA1FF2)
    val bytes = AiffCodec.encode(44100,
      Array(Array.fill(500)(rnd.nextInt(65536) - 32768),
        Array.fill(500)(rnd.nextInt(65536) - 32768)))
    for (n <- 0 to bytes.length)
      AiffCodec.decode(java.util.Arrays.copyOf(bytes, n))
    for (_ <- 1 to 300) {
      val m = bytes.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      AiffCodec.decode(m)
    }
    succeed
  }
}
