package graft.multimodal

/** Pure-JVM WAV (RIFF PCM) decode + spectral band energies — the one audio
  * container that needs no native codec, replacing the hash-fake feature
  * path for `audio/wav` payloads in [[Multimodal.DefaultDecoder]].
  * Deterministic: fixed-point-free float math, fixed FFT size, fixed
  * Hann window — identical features on every executor/JVM.
  */
object WavCodec {

  /** Decoded clip: samples mono-mixed to [-1, 1]. */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Float])

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  /** Parse a RIFF/WAVE container with 16-bit integer PCM (format code 1).
    * Returns None for anything else (compressed codecs, float PCM, broken
    * headers) — callers fall back to their non-decoding path.
    */
  def decode(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E')) return None
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var fmtCode = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length && (dataOff < 0 || fmtCode == 0)) {
      val id = new String(bytes.slice(pos, pos + 4), "US-ASCII")
      val len = le32(bytes, pos + 4)
      // Compare in Long: a crafted length near 2^31 would wrap the Int
      // sum negative and slip past the bound (decoders must be TOTAL).
      if (len < 0 || pos.toLong + 8 + len > bytes.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmtCode = le16(bytes, pos + 8)
          channels = le16(bytes, pos + 10)
          sampleRate = le32(bytes, pos + 12)
          bits = le16(bytes, pos + 22)
        case "data" =>
          dataOff = pos + 8; dataLen = len
        case _ => ()
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmtCode != 1 || bits != 16 || channels < 1 || sampleRate <= 0 ||
        dataOff < 0) return None
    val frameBytes = 2 * channels
    val nFrames = dataLen / frameBytes
    val out = new Array[Float](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0f
      var c = 0
      while (c < channels) {
        val s = le16(bytes, dataOff + f * frameBytes + 2 * c).toShort
        acc += s / 32768f
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    Some(Wav(sampleRate, channels, out))
  }

  /** In-place iterative radix-2 FFT (re/im pairs). n must be a power of 2. */
  private def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    var i = 1
    while (i < n) { // bit-reversal permutation
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var s = 0
      while (s < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val er = re(s + k); val ei = im(s + k)
          val or0 = re(s + k + len / 2); val oi = im(s + k + len / 2)
          val xr = or0 * cr - oi * ci
          val xi = or0 * ci + oi * cr
          re(s + k) = er + xr; im(s + k) = ei + xi
          re(s + k + len / 2) = er - xr; im(s + k + len / 2) = ei - xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** Relative spectral energy in `nBands` equal-width bands of
    * [0, Nyquist): Hann-windowed `fftSize`-point frames (hop = fftSize,
    * up to `maxFrames`), power accumulated per band, normalized to sum 1.
    * The distribution shape — not absolute level — is the curation
    * feature (silence/tone/noise discrimination, bandwidth checks).
    */
  def bandEnergies(w: Wav, nBands: Int = 5, fftSize: Int = 1024,
      maxFrames: Int = 64): Array[Float] = {
    val bands = new Array[Double](nBands)
    val nFrames = math.min(maxFrames, w.samples.length / fftSize)
    val half = fftSize / 2
    var fr = 0
    while (fr < nFrames) {
      val re = new Array[Double](fftSize)
      val im = new Array[Double](fftSize)
      var i = 0
      while (i < fftSize) {
        val hann = 0.5 * (1 - math.cos(2.0 * math.Pi * i / (fftSize - 1)))
        re(i) = w.samples(fr * fftSize + i) * hann
        i += 1
      }
      fft(re, im)
      var k = 1 // skip DC
      while (k < half) {
        val p = re(k) * re(k) + im(k) * im(k)
        bands(k * nBands / half) += p
        k += 1
      }
      fr += 1
    }
    val tot = bands.sum
    if (tot <= 0) new Array[Float](nBands)
    else bands.map(b => (b / tot).toFloat)
  }

  /** Test helper: synthesize a 16-bit mono PCM WAV of summed sine tones
    * `(freqHz, amplitude)`. */
  def synthesize(sampleRate: Int, tones: Seq[(Double, Double)],
      seconds: Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val t = i.toDouble / sampleRate
      val v = tones.map { case (f, a) => a * math.sin(2 * math.Pi * f * t) }.sum
      val s = math.max(-32768, math.min(32767, (v * 32767).round)).toInt
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit =
      (0 until 4).foreach(b => bos.write((v >> (8 * b)) & 0xFF))
    def w16(v: Int): Unit =
      (0 until 2).foreach(b => bos.write((v >> (8 * b)) & 0xFF))
    bos.write("RIFF".getBytes("US-ASCII")); w32(36 + data.length)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(1); w32(sampleRate); w32(sampleRate * 2); w16(2); w16(16)
    bos.write("data".getBytes("US-ASCII")); w32(data.length)
    bos.write(data)
    bos.toByteArray
  }
}
