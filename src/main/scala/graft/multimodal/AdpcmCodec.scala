package graft.multimodal

/** Pure-JVM compressed-PCM WAV codecs, written from the public specs:
  *
  *   - IMA/DVI ADPCM (WAV format tag 0x11) — the IMA Digital Audio
  *     Interchange 4-bit adaptive-step codec: per-block header carrying
  *     the verbatim first sample + step-table index, then one nibble per
  *     sample (low nibble first), 89-entry step table, successive-
  *     approximation quantizer, exact integer reconstruction.
  *   - ITU-T G.711 µ-law (tag 7) and A-law (tag 6) — the telephony
  *     companding codecs: 8 bits per sample, segment + mantissa layout.
  *
  * All three are deterministic INTEGER state machines (no float anywhere),
  * so — unlike perceptual codecs (mp3/AAC) — a decoded fixture is exactly
  * replayable in closed form by the DuckDB oracle: `q_adpcm_scan` replays
  * the full encoder+decoder recursion per sample, `q_g711_scan` the
  * memoryless companding arithmetic. Decoders are TOTAL on arbitrary
  * bytes (return None, never throw) — same contract as [[FlacCodec]] /
  * [[ZmbvCodec]].
  *
  * Reference behavior anchored (file:line cites per house rule): the
  * reference decodes no audio at all (pyspark_stats.py / pyspark_yolox.py
  * are image-only) — this extends the north-star multimodal surface.
  */
object AdpcmCodec {

  /** Decoded compressed-PCM clip with EXACT integer samples (mono). */
  final case class Pcm(codec: String, sampleRate: Int, samples: Array[Int])

  // ---------------------------------------------------------------- IMA

  /** IMA step-size table (89 entries, from the IMA ADPCM spec). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index-adjustment table, keyed by nibble magnitude (nibble & 7). */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clamp(v: Int, lo: Int, hi: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** One IMA quantize step: (nibble, newPredictor, newIndex). The
    * successive-approximation loop and the reconstruction are BOTH here so
    * encoder and decoder can never drift (the encoder tracks the decoder's
    * predictor, as the spec requires).
    */
  def imaEncodeStep(sample: Int, predictor: Int, index: Int): (Int, Int, Int) = {
    val step = StepTable(index)
    var diff = sample - predictor
    val sign = if (diff < 0) 8 else 0
    if (diff < 0) diff = -diff
    var delta = 0
    var ts = step
    if (diff >= ts) { delta = 4; diff -= ts }
    ts >>= 1
    if (diff >= ts) { delta |= 2; diff -= ts }
    ts >>= 1
    if (diff >= ts) delta |= 1
    val nibble = delta | sign
    val (np, ni) = imaDecodeStep(nibble, predictor, index)
    (nibble, np, ni)
  }

  /** One IMA reconstruction step: (newPredictor, newIndex). */
  def imaDecodeStep(nibble: Int, predictor: Int, index: Int): (Int, Int) = {
    val step = StepTable(index)
    var diffq = step >> 3
    if ((nibble & 4) != 0) diffq += step
    if ((nibble & 2) != 0) diffq += step >> 1
    if ((nibble & 1) != 0) diffq += step >> 2
    val np = clamp(
      if ((nibble & 8) != 0) predictor - diffq else predictor + diffq,
      -32768, 32767)
    (np, clamp(index + IndexTable(nibble & 7), 0, 88))
  }

  // --------------------------------------------------------------- G.711

  private val Bias = 0x84 // µ-law bias (ITU-T G.711)
  private val Clip = 32635

  /** ITU-T G.711 µ-law compress: 16-bit sample → 8-bit code. */
  def muEncode(pcm0: Int): Int = {
    var pcm = pcm0
    val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
    if (pcm > Clip) pcm = Clip
    pcm += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (pcm >> (exp + 3)) & 0x0F
    ~(sign | (exp << 4) | mant) & 0xFF
  }

  /** ITU-T G.711 µ-law expand: 8-bit code → 16-bit sample. */
  def muDecode(code: Int): Int = {
    val u = ~code & 0xFF
    val exp = (u >> 4) & 7
    val mant = u & 0x0F
    val t = (((mant << 3) + Bias) << exp) - Bias
    if ((u & 0x80) != 0) -t else t
  }

  /** ITU-T G.711 A-law compress: 16-bit sample → 8-bit code. The
    * magnitude domain is 13-bit (sample >> 3), per the spec.
    */
  def aEncode(pcm: Int): Int = {
    var mask = 0xD5
    var p = pcm
    if (p < 0) { mask = 0x55; p = -p - 1 }
    var p13 = p >> 3
    if (p13 > 0xFFF) p13 = 0xFFF
    var seg = 0
    while (seg < 7 && p13 > ((0x1F << seg) | ((1 << seg) - 1))) seg += 1
    val mant = if (seg < 2) (p13 >> 1) & 0x0F else (p13 >> seg) & 0x0F
    ((seg << 4) | mant) ^ mask
  }

  /** ITU-T G.711 A-law expand: 8-bit code → 16-bit sample. */
  def aDecode(code: Int): Int = {
    val a = (code ^ 0x55) & 0xFF
    val seg = (a >> 4) & 7
    val mant = a & 0x0F
    var t = mant << 4
    t += (if (seg == 0) 8 else 0x108)
    if (seg > 1) t <<= seg - 1
    if ((a & 0x80) != 0) t else -t
  }

  // ------------------------------------------------------ WAV container

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private final case class Fmt(tag: Int, channels: Int, rate: Int,
      blockAlign: Int, bits: Int, dataOff: Int, dataLen: Int, factSamples: Int)

  /** RIFF walk shared by the three compressed decode paths. Total: any
    * malformed chunk layout yields None (long-domain bound check, like
    * [[WavCodec.decode]]).
    */
  private def parseWav(bytes: Array[Byte]): Option[Fmt] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E')) return None
    var pos = 12
    var tag = 0; var channels = 0; var rate = 0; var blockAlign = 0
    var bits = 0; var dataOff = -1; var dataLen = 0; var factSamples = -1
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes.slice(pos, pos + 4), "US-ASCII")
      val len = le32(bytes, pos + 4)
      if (len < 0 || pos.toLong + 8 + len > bytes.length) return None
      id match {
        case "fmt " if len >= 16 =>
          tag = le16(bytes, pos + 8)
          channels = le16(bytes, pos + 10)
          rate = le32(bytes, pos + 12)
          blockAlign = le16(bytes, pos + 20)
          bits = le16(bytes, pos + 22)
        case "fact" if len >= 4 =>
          factSamples = le32(bytes, pos + 8)
        case "data" =>
          dataOff = pos + 8; dataLen = len
        case _ => ()
      }
      pos += 8 + len + (len & 1)
    }
    if (dataOff < 0 || channels != 1 || rate <= 0) None
    else Some(Fmt(tag, channels, rate, blockAlign, bits, dataOff, dataLen,
      factSamples))
  }

  /** Decode a mono compressed-PCM WAV (IMA ADPCM / µ-law / A-law) to exact
    * integer samples. None for PCM WAV (that's [[WavCodec]]'s job), other
    * tags, multi-channel, or malformed bytes.
    */
  def decodePcm(bytes: Array[Byte]): Option[Pcm] = parseWav(bytes).flatMap { f =>
    f.tag match {
      case 0x11 if f.bits == 4 && f.blockAlign > 4 =>
        val spb = (f.blockAlign - 4) * 2 + 1
        val total =
          if (f.factSamples >= 0) f.factSamples
          else {
            // derive from block layout: full blocks carry spb samples,
            // a trailing partial block 1 + 2·(avail − 4)
            val full = f.dataLen / f.blockAlign
            val rem = f.dataLen % f.blockAlign
            full * spb + (if (rem > 4) 1 + (rem - 4) * 2 else if (rem == 4) 1 else 0)
          }
        if (total < 0) None
        else {
          val out = new Array[Int](total)
          var n = 0
          var blockStart = f.dataOff
          val dataEnd = f.dataOff + f.dataLen
          while (n < total && blockStart + 4 <= dataEnd) {
            var predictor = le16(bytes, blockStart).toShort.toInt
            var index = clamp(bytes(blockStart + 2) & 0xFF, 0, 88)
            out(n) = predictor; n += 1
            val blockEnd = math.min(blockStart + f.blockAlign, dataEnd)
            var bp = blockStart + 4
            var inBlock = 1
            while (bp < blockEnd && n < total && inBlock < spb) {
              val byte = bytes(bp) & 0xFF
              var half = 0
              while (half < 2 && n < total && inBlock < spb) {
                val nib = if (half == 0) byte & 0x0F else (byte >> 4) & 0x0F
                val (np, ni) = imaDecodeStep(nib, predictor, index)
                predictor = np; index = ni
                out(n) = predictor; n += 1; inBlock += 1
                half += 1
              }
              bp += 1
            }
            blockStart += f.blockAlign
          }
          if (n != total) None else Some(Pcm("ima_adpcm", f.rate, out))
        }
      case 7 if f.bits == 8 =>
        Some(Pcm("ulaw", f.rate,
          Array.tabulate(f.dataLen)(i => muDecode(bytes(f.dataOff + i) & 0xFF))))
      case 6 if f.bits == 8 =>
        Some(Pcm("alaw", f.rate,
          Array.tabulate(f.dataLen)(i => aDecode(bytes(f.dataOff + i) & 0xFF))))
      case _ => None
    }
  }

  /** Decode to the [[WavCodec.Wav]] float shape so the audio featurizer
    * ([[WavCodec.bandEnergies]]) runs unchanged on compressed payloads.
    */
  def decode(bytes: Array[Byte]): Option[WavCodec.Wav] =
    decodePcm(bytes).map { p =>
      WavCodec.Wav(p.sampleRate, 1, p.samples.map(_ / 32768f))
    }

  // ------------------------------------------------------------ encoders

  private def wavHeader(bos: java.io.ByteArrayOutputStream, tag: Int,
      rate: Int, blockAlign: Int, bits: Int, avgBps: Int, extra: Array[Byte],
      factSamples: Int, dataLen: Int): Unit = {
    def w32(v: Int): Unit = (0 until 4).foreach(b => bos.write((v >> (8 * b)) & 0xFF))
    def w16(v: Int): Unit = (0 until 2).foreach(b => bos.write((v >> (8 * b)) & 0xFF))
    val fmtLen = 18 + extra.length
    val riffLen = 4 + (8 + fmtLen) + (8 + 4) + (8 + dataLen + (dataLen & 1))
    bos.write("RIFF".getBytes("US-ASCII")); w32(riffLen)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); w32(fmtLen)
    w16(tag); w16(1); w32(rate); w32(avgBps); w16(blockAlign); w16(bits)
    w16(extra.length); bos.write(extra)
    bos.write("fact".getBytes("US-ASCII")); w32(4); w32(factSamples)
    bos.write("data".getBytes("US-ASCII")); w32(dataLen)
  }

  /** Deterministic IMA ADPCM WAV encoder (mono): fixed block size, step
    * index carried across blocks (stored in each block header, as the
    * format requires), first sample of every block stored verbatim.
    */
  def encodeImaWav(rate: Int, samples: Array[Int], blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign > 4 && blockAlign % 4 == 0, "blockAlign must be 4-aligned > 4")
    val spb = (blockAlign - 4) * 2 + 1
    val data = new java.io.ByteArrayOutputStream()
    var index = 0
    var i = 0
    while (i < samples.length) {
      val s0 = samples(i)
      data.write(s0 & 0xFF); data.write((s0 >> 8) & 0xFF)
      data.write(index); data.write(0)
      var predictor = s0
      var inBlock = 1
      i += 1
      var pending = -1
      while (inBlock < spb && i < samples.length) {
        val (nib, np, ni) = imaEncodeStep(samples(i), predictor, index)
        predictor = np; index = ni
        if (pending < 0) pending = nib
        else { data.write(pending | (nib << 4)); pending = -1 }
        inBlock += 1; i += 1
      }
      if (pending >= 0) data.write(pending) // odd tail: high nibble zero
      // NB: the final block is NOT padded to blockAlign; the fact chunk
      // carries the exact sample count, so the decoder stops correctly.
    }
    val d = data.toByteArray
    val bos = new java.io.ByteArrayOutputStream()
    val extra = Array[Byte]((spb & 0xFF).toByte, ((spb >> 8) & 0xFF).toByte)
    wavHeader(bos, 0x11, rate, blockAlign, 4,
      (rate.toLong * blockAlign / spb).toInt, extra, samples.length, d.length)
    bos.write(d)
    if ((d.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  /** Deterministic G.711 WAV encoder (mono, µ-law or A-law). */
  def encodeG711Wav(rate: Int, samples: Array[Int], mu: Boolean): Array[Byte] = {
    val d = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      d(i) = (if (mu) muEncode(samples(i)) else aEncode(samples(i))).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    wavHeader(bos, if (mu) 7 else 6, rate, 1, 8, rate, Array.empty,
      samples.length, d.length)
    bos.write(d)
    if ((d.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }
}
