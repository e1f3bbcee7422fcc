package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM FLAC codec (decode + a deterministic subset encoder),
  * implemented from the PUBLIC format specification (RFC 9639 / the
  * xiph.org FLAC format document) — no external codec library, no code
  * taken from libFLAC. This replaces the hash-fake feature path for
  * `audio/flac` payloads in [[Multimodal.DefaultDecoder]]: FLAC is a
  * LOSSLESS integer-predictor format, so the decode is exact integer
  * arithmetic end to end — the same determinism class as the PNG chain —
  * and the `q_flac_scan` oracle replays the decoded samples in closed
  * form (encode(pcm) → binary scan → decode == pcm, verified by hash).
  *
  * Decoder coverage (what real encoders emit): CONSTANT / VERBATIM /
  * FIXED(0–4) / LPC(1–32) subframes, Rice residuals (4- and 5-bit
  * parameters, any partition order, escape partitions), wasted bits,
  * all four channel assignments (independent, left/side, right/side,
  * mid/side), sample sizes 8–24 bits, CRC-8-validated frame headers and
  * CRC-16-validated frames. Anything outside that (reserved codes,
  * corrupt CRCs, truncated bitstreams) returns None — the decoder is
  * TOTAL on arbitrary bytes, the same contract as [[WavCodec.decode]].
  *
  * Encoder subset (fixture/production-write tier): 16-bit, fixed 4096
  * block size (16-bit-coded shorter last block), fixed predictors
  * (order 0–2 chosen per block by residual cost), one Rice partition per
  * subframe with the parameter chosen by exact bit cost, independent or
  * explicit stereo decorrelation modes. Every choice is deterministic —
  * identical input bytes on every JVM — so fixture trees are pinnable by
  * `read_blob` byte identity like the PNG trees.
  */
object FlacCodec {

  /** Decoded stream: exact integer samples per channel (no float mixing —
    * the oracle tier needs bit-exact values; [[toWav]] adapts to the
    * spectral-feature path).
    */
  final case class Pcm(sampleRate: Int, bitsPerSample: Int,
      channels: Array[Array[Int]]) {
    def numChannels: Int = channels.length
    def numSamples: Int = if (channels.isEmpty) 0 else channels(0).length
  }

  /** Mono-mix to the [[WavCodec.Wav]] shape so FLAC payloads feed the same
    * band-energy featurizer as WAV.
    */
  def toWav(p: Pcm): WavCodec.Wav = {
    val n = p.numSamples
    val scale = 1 << (p.bitsPerSample - 1)
    val out = new Array[Float](n)
    var t = 0
    while (t < n) {
      var acc = 0f
      var c = 0
      while (c < p.numChannels) { acc += p.channels(c)(t).toFloat / scale; c += 1 }
      out(t) = acc / p.numChannels
      t += 1
    }
    WavCodec.Wav(p.sampleRate, p.numChannels, out)
  }

  // ---------------------------------------------------------------- CRCs
  // CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — frame headers.
  private val crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF; k += 1 }
    c
  }
  private def crc8(bytes: ArrayBuffer[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc8Table((c ^ (bytes(i) & 0xFF)) & 0xFF); i += 1 }
    c
  }
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc8Table((c ^ (bytes(i) & 0xFF)) & 0xFF); i += 1 }
    c
  }

  // CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 — whole frame.
  private val crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF; k += 1 }
    c
  }
  private def crc16(bytes: ArrayBuffer[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = (((c << 8) & 0xFFFF) ^ crc16Table(((c >> 8) ^ (bytes(i) & 0xFF)) & 0xFF)); i += 1 }
    c
  }
  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = (((c << 8) & 0xFFFF) ^ crc16Table(((c >> 8) ^ (bytes(i) & 0xFF)) & 0xFF)); i += 1 }
    c
  }

  // ------------------------------------------------------------- decoder

  /** Thrown internally on any malformed input; caught once in [[decode]].
    * (Control-flow exception: keeps the bit-level readers allocation-free.)
    */
  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** MSB-first bit reader with hard bounds checks. */
  private final class BitReader(val b: Array[Byte]) {
    var bytePos = 0
    var bitPos = 0 // 0..7, bits already consumed in b(bytePos)
    def byteAligned: Boolean = bitPos == 0
    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def remainingBits: Long = (b.length.toLong - bytePos) * 8 - bitPos
    def readBit(): Int = {
      if (bytePos >= b.length) fail()
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    /** n in 0..56, MSB-first, unsigned. */
    def readBits(n: Int): Long = {
      if (n == 0) return 0L
      if (remainingBits < n) fail()
      var v = 0L
      var left = n
      while (left > 0) {
        val avail = 8 - bitPos
        val take = math.min(avail, left)
        val chunk = ((b(bytePos) & 0xFF) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        left -= take
      }
      v
    }
    /** Two's-complement signed read. */
    def readSigned(n: Int): Int = {
      val u = readBits(n)
      val shift = 64 - n
      ((u << shift).toLong >> shift).toInt
    }
    /** Unary: count of 0 bits before the terminating 1 bit. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 24)) fail() // runaway guard on garbage input
      }
      q
    }
    /** UTF-8-style coded number (frame/sample number, up to 36 bits). */
    def readUtf8Number(): Long = {
      val first = readBits(8).toInt
      if ((first & 0x80) == 0) return first
      var nCont = 0
      var mask = 0x40
      while ((first & mask) != 0) { nCont += 1; mask >>= 1 }
      if (nCont < 1 || nCont > 6) fail()
      var v: Long = first & (mask - 1)
      var i = 0
      while (i < nCont) {
        val c = readBits(8).toInt
        if ((c & 0xC0) != 0x80) fail()
        v = (v << 6) | (c & 0x3F)
        i += 1
      }
      v
    }
  }

  private val FixedCoeffs: Array[Array[Int]] = Array(
    Array(),
    Array(1),
    Array(2, -1),
    Array(3, -3, 1),
    Array(4, -6, 4, -1))

  /** Decode a complete FLAC stream. None on anything malformed or outside
    * the supported envelope (sample sizes > 24 bits).
    */
  def decode(bytes: Array[Byte]): Option[Pcm] =
    try Some(decodeOrThrow(bytes))
    catch { case _: Malformed | _: ArrayIndexOutOfBoundsException => None }

  /** Stream layout for container mappings (FLAC-in-MP4, [[Mp4Codec]]):
    * the raw 34-byte STREAMINFO payload plus each audio frame's
    * ([start, end) byte range, block size) — found by actually decoding
    * (FLAC records frame lengths nowhere; only a decoder can split a
    * stream into the per-frame samples ISO-BMFF needs). Total on
    * arbitrary bytes, same contract as [[decode]].
    */
  def streamLayout(bytes: Array[Byte]): Option[(Array[Byte], Seq[(Int, Int, Int)])] =
    try {
      if (bytes.length < 42) fail()
      if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C')) fail()
      var pos = 4
      var sampleRate = 0; var nChannels = 0; var bps = 0; var totalSamples = 0L
      var streamInfo: Array[Byte] = null
      var last = false
      while (!last) {
        if (pos + 4 > bytes.length) fail()
        val h = ((bytes(pos) & 0xFF) << 24) | ((bytes(pos + 1) & 0xFF) << 16) |
          ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
        last = (h & 0x80000000) != 0
        val blockType = (h >>> 24) & 0x7F
        val len = h & 0xFFFFFF
        if (pos.toLong + 4 + len > bytes.length) fail()
        if (blockType == 0) {
          if (len < 34) fail()
          val o = pos + 4
          streamInfo = java.util.Arrays.copyOfRange(bytes, o, o + 34)
          sampleRate = ((bytes(o + 10) & 0xFF) << 12) | ((bytes(o + 11) & 0xFF) << 4) |
            ((bytes(o + 12) & 0xFF) >> 4)
          nChannels = ((bytes(o + 12) >> 1) & 0x07) + 1
          bps = (((bytes(o + 12) & 0x01) << 4) | ((bytes(o + 13) & 0xFF) >> 4)) + 1
          totalSamples = ((bytes(o + 13) & 0x0FL) << 32) |
            ((bytes(o + 14) & 0xFFL) << 24) | ((bytes(o + 15) & 0xFFL) << 16) |
            ((bytes(o + 16) & 0xFFL) << 8) | (bytes(o + 17) & 0xFFL)
        }
        pos += 4 + len
      }
      if (streamInfo == null || sampleRate <= 0 || bps < 4 || bps > 24) fail()
      if (totalSamples <= 0 || totalSamples > (1 << 28)) fail() // need a known end
      val out = Array.fill(nChannels)(new ArrayBuffer[Int]())
      val ranges = Seq.newBuilder[(Int, Int, Int)]
      var decoded = 0L
      while (decoded < totalSamples) {
        val start = pos
        val before = out(0).length
        pos = decodeFrame(bytes, pos, sampleRate, nChannels, bps, out)
        ranges += ((start, pos, out(0).length - before))
        decoded = out(0).length.toLong
      }
      if (decoded != totalSamples) fail()
      Some((streamInfo, ranges.result()))
    } catch { case _: Malformed | _: ArrayIndexOutOfBoundsException => None }

  private def decodeOrThrow(bytes: Array[Byte]): Pcm = {
    if (bytes.length < 42) fail()
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C')) fail()
    var pos = 4
    // metadata blocks: 1-bit last flag, 7-bit type, 24-bit length
    var sampleRate = 0; var nChannels = 0; var bps = 0; var totalSamples = 0L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (pos + 4 > bytes.length) fail()
      val h = ((bytes(pos) & 0xFF) << 24) | ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      last = (h & 0x80000000) != 0
      val blockType = (h >>> 24) & 0x7F
      val len = h & 0xFFFFFF
      if (pos.toLong + 4 + len > bytes.length) fail()
      if (blockType == 0) { // STREAMINFO
        if (len < 34) fail()
        val o = pos + 4
        sampleRate = ((bytes(o + 10) & 0xFF) << 12) | ((bytes(o + 11) & 0xFF) << 4) |
          ((bytes(o + 12) & 0xFF) >> 4)
        nChannels = ((bytes(o + 12) >> 1) & 0x07) + 1
        bps = (((bytes(o + 12) & 0x01) << 4) | ((bytes(o + 13) & 0xFF) >> 4)) + 1
        totalSamples = ((bytes(o + 13) & 0x0FL) << 32) |
          ((bytes(o + 14) & 0xFFL) << 24) | ((bytes(o + 15) & 0xFFL) << 16) |
          ((bytes(o + 16) & 0xFFL) << 8) | (bytes(o + 17) & 0xFFL)
        sawStreamInfo = true
      } else if (blockType == 127) fail() // invalid per spec
      pos += 4 + len
    }
    if (!sawStreamInfo || sampleRate <= 0 || bps < 4 || bps > 24) fail()
    if (totalSamples < 0 || totalSamples > (1 << 28)) fail() // sandbox bound
    val out = Array.fill(nChannels)(new ArrayBuffer[Int](
      math.min(totalSamples, 1 << 20).toInt))
    var decoded = 0L
    // frames until total_samples reached (or EOF when unknown)
    while ((totalSamples == 0L && pos < bytes.length) ||
           (totalSamples > 0L && decoded < totalSamples)) {
      pos = decodeFrame(bytes, pos, sampleRate, nChannels, bps, out)
      decoded = out(0).length.toLong
      if (totalSamples == 0L && decoded > (1 << 28)) fail()
    }
    if (totalSamples > 0L && decoded != totalSamples) fail()
    Pcm(sampleRate, bps, out.map(_.toArray))
  }

  /** Decode one frame starting at byte `start`; returns the byte offset
    * just past its CRC-16 footer.
    */
  private def decodeFrame(bytes: Array[Byte], start: Int, siRate: Int,
      siChannels: Int, siBps: Int, out: Array[ArrayBuffer[Int]]): Int = {
    val r = new BitReader(bytes)
    r.bytePos = start
    if (r.readBits(14) != 0x3FFE) fail() // sync
    if (r.readBit() != 0) fail()         // reserved
    r.readBit()                          // blocking strategy (value unused)
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val chanAsgn = r.readBits(4).toInt
    val ssCode = r.readBits(3).toInt
    if (r.readBit() != 0) fail()         // reserved
    r.readUtf8Number()                   // frame/sample number (unused)
    val blockSize = bsCode match {
      case 0 => fail()
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match { // only consume the optional field; STREAMINFO is binding
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case 15 => fail()
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case _ => fail()
    }
    if (bps != siBps) fail()
    val nCh = if (chanAsgn < 8) chanAsgn + 1 else 2
    if (nCh != siChannels || chanAsgn > 10) fail()
    // CRC-8 covers the header bytes up to (not including) the CRC byte
    if (!r.byteAligned) fail() // header fields are byte-multiples by construction
    val headerEnd = r.bytePos
    val expectedCrc8 = r.readBits(8).toInt
    if (crc8(bytes, start, headerEnd) != expectedCrc8) fail()

    val chans = Array.ofDim[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      // side channels carry one extra bit of sample depth
      val extra = chanAsgn match {
        case 8 => if (c == 1) 1 else 0  // left/side
        case 9 => if (c == 0) 1 else 0  // right/side
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bps + extra)
      c += 1
    }
    // inverse stereo decorrelation (libFLAC's canonical integer forms)
    chanAsgn match {
      case 8 => // left/side: R = L - side
        var t = 0; while (t < blockSize) { chans(1)(t) = chans(0)(t) - chans(1)(t); t += 1 }
      case 9 => // right/side: channel 0 is side, channel 1 is R; L = R + side
        var t = 0
        while (t < blockSize) { chans(0)(t) = chans(1)(t) + chans(0)(t); t += 1 }
      case 10 => // mid/side
        var t = 0
        while (t < blockSize) {
          val side = chans(1)(t)
          val mid = (chans(0)(t) << 1) | (side & 1)
          chans(0)(t) = (mid + side) >> 1
          chans(1)(t) = (mid - side) >> 1
          t += 1
        }
      case _ => ()
    }
    r.alignToByte()
    val frameEnd = r.bytePos
    val expectedCrc16 = r.readBits(16).toInt
    if (crc16(bytes, start, frameEnd) != expectedCrc16) fail()
    c = 0
    while (c < nCh) { out(c) ++= chans(c); c += 1 }
    r.bytePos
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int): Array[Int] = {
    if (r.readBit() != 0) fail() // zero pad bit
    val typeCode = r.readBits(6).toInt
    val wasted = if (r.readBit() == 1) r.readUnary() + 1 else 0
    val effBps = bps - wasted
    if (effBps <= 0 || effBps > 32) fail()
    val s = typeCode match {
      case 0 => // CONSTANT
        val v = r.readSigned(effBps)
        Array.fill(n)(v)
      case 1 => // VERBATIM
        Array.fill(n)(r.readSigned(effBps))
      case t if t >= 8 && t <= 12 => // FIXED, order 0..4
        val order = t - 8
        if (order > n) fail()
        val warm = Array.fill(order)(r.readSigned(effBps))
        val resid = decodeResiduals(r, n, order)
        reconstruct(warm, FixedCoeffs(order), 0, resid, n)
      case t if t >= 32 => // LPC, order 1..32
        val order = t - 31
        if (order > n) fail()
        val warm = Array.fill(order)(r.readSigned(effBps))
        val precision = r.readBits(4).toInt + 1
        if (precision == 16) fail() // 0b1111 invalid
        val shift = r.readSigned(5)
        if (shift < 0) fail()
        val coeffs = Array.fill(order)(r.readSigned(precision))
        val resid = decodeResiduals(r, n, order)
        reconstruct(warm, coeffs, shift, resid, n)
      case _ => fail() // reserved
    }
    if (wasted > 0) { var i = 0; while (i < n) { s(i) = s(i) << wasted; i += 1 } }
    s
  }

  /** Predictor reconstruction shared by FIXED (shift 0) and LPC: the
    * prediction is the coeff dot product over previous OUTPUT samples,
    * in Long (LPC dot products overflow Int).
    */
  private def reconstruct(warm: Array[Int], coeffs: Array[Int], shift: Int,
      resid: Array[Int], n: Int): Array[Int] = {
    val order = warm.length
    val s = new Array[Int](n)
    System.arraycopy(warm, 0, s, 0, order)
    var t = order
    while (t < n) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coeffs(j).toLong * s(t - 1 - j); j += 1 }
      s(t) = resid(t - order) + (acc >> shift).toInt
      t += 1
    }
    s
  }

  private def decodeResiduals(r: BitReader, blockSize: Int, order: Int): Array[Int] = {
    val method = r.readBits(2).toInt // 0 = 4-bit rice, 1 = 5-bit rice
    if (method > 1) fail()
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = r.readBits(4).toInt
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) fail()
    val perPart = blockSize >> partOrder
    val out = new Array[Int](blockSize - order)
    var w = 0
    var p = 0
    while (p < nParts) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) fail()
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val rawBits = r.readBits(5).toInt
        var i = 0
        while (i < count) {
          out(w) = if (rawBits == 0) 0 else r.readSigned(rawBits)
          w += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val u = (q.toLong << param) | r.readBits(param)
          out(w) = ((u >>> 1) ^ -(u & 1L)).toInt // un-zigzag
          w += 1; i += 1
        }
      }
      p += 1
    }
    out
  }

  // ------------------------------------------------------------- encoder

  /** Stereo decorrelation mode for [[encode]] (2-channel input only; more
    * channels always encode independently).
    */
  sealed abstract class StereoMode(private[multimodal] val assignment: Int)
  case object Independent extends StereoMode(-1)
  case object LeftSide extends StereoMode(8)
  case object RightSide extends StereoMode(9)
  case object MidSide extends StereoMode(10)

  /** MSB-first bit writer. */
  private final class BitWriter {
    val buf = new ArrayBuffer[Byte](1024)
    private var cur = 0
    private var nBits = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def alignToByte(): Unit = while (nBits != 0) writeBit(0)
    def writeUtf8Number(v: Long): Unit = {
      if (v < 0x80) writeBits(v, 8)
      else {
        // count payload bits → continuation byte count
        var bits = 64 - java.lang.Long.numberOfLeadingZeros(v)
        var nCont = 1
        while (bits > 6 * nCont + (6 - nCont)) nCont += 1
        val leadPayload = 6 - nCont
        var lead = 0
        var i = 0
        while (i <= nCont) { lead = (lead << 1) | 1; i += 1 } // nCont+1 ones
        lead = (lead << 1) << leadPayload // then a zero, then payload space
        writeBits((lead | ((v >> (6 * nCont)) & ((1 << leadPayload) - 1))).toLong, 8)
        var k = nCont - 1
        while (k >= 0) { writeBits(0x80L | ((v >> (6 * k)) & 0x3F), 8); k -= 1 }
      }
    }
  }

  private def zigzag(r: Int): Long = ((r.toLong << 1) ^ (r.toLong >> 63))

  /** Exact Rice bit cost of a residual array at parameter k. */
  private def riceCost(resid: Array[Int], k: Int): Long = {
    var total = 0L
    var i = 0
    while (i < resid.length) { total += (zigzag(resid(i)) >>> k) + 1 + k; i += 1 }
    total
  }

  /** Encode 16-bit PCM into a subset FLAC stream (fixed predictors,
    * single Rice partition, block size `blockSize`). Deterministic.
    */
  def encode(sampleRate: Int, channels: Array[Array[Int]],
      blockSize: Int = 4096, stereo: StereoMode = Independent): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 8, "1..8 channels")
    require(channels.forall(_.length == channels(0).length), "equal lengths")
    require(stereo == Independent || channels.length == 2,
      "stereo modes need exactly 2 channels")
    val bps = 16
    require(channels.forall(_.forall(s => s >= -32768 && s <= 32767)), "16-bit range")
    val n = channels(0).length
    require(n > 0, "empty stream")
    require(sampleRate > 0 && sampleRate < (1 << 20), "sample rate range")
    val out = new ArrayBuffer[Byte](n * channels.length / 2 + 128)
    out ++= "fLaC".getBytes("US-ASCII")
    // STREAMINFO (last metadata block), 34 bytes
    out += 0x80.toByte; out += 0; out += 0; out += 34
    val minBlock = math.min(blockSize, n)
    val lastBlock = if (n % blockSize == 0) blockSize else n % blockSize
    val realMin = math.min(minBlock, lastBlock)
    out += ((realMin >> 8) & 0xFF).toByte; out += (realMin & 0xFF).toByte
    out += ((blockSize >> 8) & 0xFF).toByte; out += (blockSize & 0xFF).toByte
    for (_ <- 0 until 6) out += 0 // min/max frame size unknown
    // 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit total samples
    val chField = channels.length - 1
    out += ((sampleRate >> 12) & 0xFF).toByte
    out += ((sampleRate >> 4) & 0xFF).toByte
    out += (((sampleRate & 0xF) << 4) | (chField << 1) | ((bps - 1) >> 4)).toByte
    out += ((((bps - 1) & 0xF) << 4) | ((n.toLong >> 32) & 0xF).toInt).toByte
    out += ((n >> 24) & 0xFF).toByte; out += ((n >> 16) & 0xFF).toByte
    out += ((n >> 8) & 0xFF).toByte; out += (n & 0xFF).toByte
    for (_ <- 0 until 16) out += 0 // MD5 unknown (valid per spec)

    var frameNo = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val w = new BitWriter
      w.writeBits(0x3FFE, 14) // sync
      w.writeBit(0)           // reserved
      w.writeBit(0)           // fixed blocking strategy
      val bsCode =
        if (bs == blockSize && Integer.bitCount(bs) == 1 && bs >= 256 && bs <= 32768)
          8 + Integer.numberOfTrailingZeros(bs / 256)
        else 7 // 16-bit blocksize-1 follows header
      w.writeBits(bsCode, 4)
      w.writeBits(0, 4)       // sample rate: from STREAMINFO
      val asgn = if (stereo == Independent) channels.length - 1 else stereo.assignment
      w.writeBits(asgn, 4)
      w.writeBits(4, 3)       // sample size: 16 bit
      w.writeBit(0)           // reserved
      w.writeUtf8Number(frameNo)
      if (bsCode == 7) w.writeBits(bs - 1, 16)
      w.alignToByte()
      w.writeBits(crc8(w.buf, 0, w.buf.length), 8)
      // channel streams after decorrelation
      val streams: Array[(Array[Int], Int)] = stereo match {
        case Independent =>
          channels.map(ch => (ch.slice(off, off + bs), bps))
        case LeftSide =>
          val l = channels(0).slice(off, off + bs)
          val r0 = channels(1).slice(off, off + bs)
          Array((l, bps), (Array.tabulate(bs)(t => l(t) - r0(t)), bps + 1))
        case RightSide =>
          val l = channels(0).slice(off, off + bs)
          val r0 = channels(1).slice(off, off + bs)
          Array((Array.tabulate(bs)(t => l(t) - r0(t)), bps + 1), (r0, bps))
        case MidSide =>
          val l = channels(0).slice(off, off + bs)
          val r0 = channels(1).slice(off, off + bs)
          Array((Array.tabulate(bs)(t => (l(t) + r0(t)) >> 1), bps),
            (Array.tabulate(bs)(t => l(t) - r0(t)), bps + 1))
      }
      streams.foreach { case (s, chBps) => encodeSubframe(w, s, chBps) }
      w.alignToByte()
      val frameStart = out.length
      out ++= w.buf
      val c16 = crc16(out, frameStart, out.length)
      out += ((c16 >> 8) & 0xFF).toByte; out += (c16 & 0xFF).toByte
      frameNo += 1
      off += bs
    }
    out.toArray
  }

  private def encodeSubframe(w: BitWriter, s: Array[Int], bps: Int): Unit = {
    val n = s.length
    if (s.forall(_ == s(0))) { // CONSTANT
      w.writeBit(0); w.writeBits(0, 6); w.writeBit(0)
      w.writeBits(s(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // fixed orders 0..2: order residuals, pick (order, riceParam) by exact cost
    val maxOrder = math.min(2, n - 1)
    var best: (Int, Array[Int], Int, Long) = null // order, resid, k, cost
    var order = 0
    while (order <= maxOrder) {
      val resid = new Array[Int](n - order)
      var t = order
      while (t < n) {
        val e = order match {
          case 0 => s(t).toLong
          case 1 => s(t).toLong - s(t - 1)
          case 2 => s(t).toLong - 2L * s(t - 1) + s(t - 2)
        }
        // 17/18-bit residuals fit Int comfortably at bps<=17
        resid(t - order) = e.toInt
        t += 1
      }
      var k = 0
      while (k <= 14) {
        val cost = riceCost(resid, k) + order.toLong * bps
        if (best == null || cost < best._4) best = (order, resid, k, cost)
        k += 1
      }
      order += 1
    }
    val (o, resid, k, _) = best
    w.writeBit(0); w.writeBits(8 + o, 6); w.writeBit(0) // FIXED header
    var i = 0
    while (i < o) { w.writeBits(s(i).toLong & ((1L << bps) - 1), bps); i += 1 }
    w.writeBits(0, 2) // residual method 0: 4-bit rice
    w.writeBits(0, 4) // partition order 0
    w.writeBits(k, 4)
    i = 0
    while (i < resid.length) {
      val u = zigzag(resid(i))
      val q = (u >>> k).toInt
      var j = 0
      while (j < q) { w.writeBit(0); j += 1 }
      w.writeBit(1)
      w.writeBits(u & ((1L << k) - 1), k)
      i += 1
    }
  }
}
