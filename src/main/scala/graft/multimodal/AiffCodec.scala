package graft.multimodal

/** Pure-JVM AIFF codec from the public Audio Interchange File Format 1.3
  * specification (Apple, 1989): EA IFF 85 `FORM`/`AIFF` grouping, `COMM`
  * common chunk (channels, sample frames, 16-bit sample size, sample rate
  * as an 80-bit IEEE 754 extended-precision big-endian float), and `SSND`
  * sound-data chunk (offset/blockSize prelude, interleaved big-endian
  * two's-complement PCM). The big-endian sibling of [[WavCodec]]'s RIFF
  * layout — together they cover both classic uncompressed-PCM containers.
  * TOTAL on arbitrary bytes; the writer is deterministic byte-for-byte so
  * fixture trees are pinnable by `read_blob` identity.
  */
object AiffCodec {

  final case class Aiff(sampleRate: Int, channels: Array[Array[Int]])

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  def decode(bytes: Array[Byte]): Option[Aiff] =
    try Some(decodeOrThrow(bytes))
    catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  private def u8(b: Array[Byte], i: Int): Int = {
    if (i < 0 || i >= b.length) fail(); b(i) & 0xFF
  }
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2).toLong

  /** 80-bit extended → integer sample rate. Layout: 1 sign + 15 exponent
    * bits (bias 16383), 64-bit mantissa with EXPLICIT integer bit; value =
    * mantissa × 2^(exp − 16383 − 63). Only exact positive integer rates
    * are accepted — which is every rate a writer of PCM audio emits.
    */
  private def readExtendedRate(b: Array[Byte], i: Int): Int = {
    val se = be16(b, i)
    if ((se & 0x8000) != 0) fail() // negative rate
    val exp = se & 0x7FFF
    var mant = 0L
    var k = 0
    while (k < 8) { mant = (mant << 8) | u8(b, i + 2 + k); k += 1 }
    if (mant == 0L) { if (exp == 0) return 0 else fail() }
    val shift = 16383 + 63 - exp
    if (shift < 0 || shift > 63) fail()
    if (shift > 0 && (mant & ((1L << shift) - 1)) != 0) fail() // non-integer
    val r = mant >>> shift
    if (r <= 0 || r > Int.MaxValue) fail()
    r.toInt
  }

  private def writeExtendedRate(out: java.io.ByteArrayOutputStream, rate: Int): Unit = {
    require(rate > 0)
    val hi = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong)
    val exp = 16383 + hi
    val mant = rate.toLong << (63 - hi)
    out.write((exp >> 8) & 0xFF); out.write(exp & 0xFF)
    var k = 7
    while (k >= 0) { out.write(((mant >>> (8 * k)) & 0xFF).toInt); k -= 1 }
  }

  private def decodeOrThrow(b: Array[Byte]): Aiff = {
    if (b.length < 12 || be32(b, 0) != 0x464F524DL /* FORM */ ||
      be32(b, 8) != 0x41494646L /* AIFF */ ) fail()
    val formEnd = math.min(b.length.toLong, 8 + be32(b, 4)).toInt
    var pos = 12
    var nCh = -1; var nFrames = -1L; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = 0L
    while (pos + 8 <= formEnd) {
      val id = be32(b, pos)
      val sz = be32(b, pos + 4)
      if (sz < 0 || pos + 8 + sz > formEnd) fail()
      if (id == 0x434F4D4DL /* COMM */ ) {
        if (sz < 18) fail()
        nCh = be16(b, pos + 8)
        nFrames = be32(b, pos + 10)
        bits = be16(b, pos + 14)
        rate = readExtendedRate(b, pos + 16)
      } else if (id == 0x53534E44L /* SSND */ ) {
        if (sz < 8) fail()
        val off = be32(b, pos + 8)
        // blockSize at pos+12 is informational; data begins after offset
        if (off < 0 || 8 + off > sz) fail()
        dataOff = pos + 16 + off.toInt
        dataLen = sz - 8 - off
      }
      pos += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (nCh <= 0 || nCh > 64 || nFrames < 0 || bits != 16 || rate <= 0 ||
      dataOff < 0) fail()
    if (dataLen < nFrames * nCh * 2) fail()
    val chans = Array.fill(nCh)(new Array[Int](nFrames.toInt))
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < nCh) {
        val v = be16(b, dataOff + 2 * (f * nCh + c))
        chans(c)(f) = (v << 16) >> 16 // sign-extend
        c += 1
      }
      f += 1
    }
    Aiff(rate, chans)
  }

  /** Mono-mix to the [[WavCodec.Wav]] shape so AIFF payloads feed the same
    * band-energy featurizer as WAV/FLAC (the [[FlacCodec.toWav]] stance).
    */
  def toWav(a: Aiff): WavCodec.Wav = {
    val n = if (a.channels.isEmpty) 0 else a.channels(0).length
    val out = new Array[Float](n)
    var t = 0
    while (t < n) {
      var acc = 0f
      var c = 0
      while (c < a.channels.length) {
        acc += a.channels(c)(t).toFloat / 32768f; c += 1
      }
      out(t) = acc / a.channels.length
      t += 1
    }
    WavCodec.Wav(a.sampleRate, a.channels.length, out)
  }

  /** Deterministic writer: FORM/AIFF with one COMM and one SSND chunk,
    * zero SSND offset/blockSize, interleaved big-endian int16.
    */
  def encode(sampleRate: Int, channels: Array[Array[Int]]): Array[Byte] = {
    require(channels.nonEmpty && channels.forall(_.length == channels(0).length))
    val nCh = channels.length
    val n = channels(0).length
    val dataBytes = n * nCh * 2
    val out = new java.io.ByteArrayOutputStream(54 + dataBytes)
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xFFFF).toInt); w16((v & 0xFFFF).toInt) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    tag("FORM"); w32(4 + (8 + 18) + (8 + 8 + dataBytes))
    tag("AIFF")
    tag("COMM"); w32(18)
    w16(nCh); w32(n); w16(16)
    writeExtendedRate(out, sampleRate)
    tag("SSND"); w32(8 + dataBytes); w32(0); w32(0)
    var f = 0
    while (f < n) {
      var c = 0
      while (c < nCh) { w16(channels(c)(f) & 0xFFFF); c += 1 }
      f += 1
    }
    out.toByteArray
  }
}
