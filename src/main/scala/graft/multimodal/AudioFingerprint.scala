package graft.multimodal

/** Integer-exact audio fingerprint for the dedup tier — the audio twin
  * of the image aHash ([[graft.images.ImageOps.aHash64]]) and the
  * document fingerprint: a 31-bit ENERGY CONTOUR over 32 equal-count
  * frames of the decoded PCM. Sample t belongs to frame 32·t div n (the
  * same pixel-partition rule as the aHash grid — exact, no boundaries to
  * round), a frame's energy is the plain integer sum of |s|, and bit f
  * (0 ≤ f < 31) is set iff frame f's energy exceeds frame f+1's — the
  * shape of the loudness curve, invariant to absolute gain ordering and
  * robust to small per-sample noise, which is what audio near-dup
  * detection keys on. Everything is integer arithmetic on int PCM, so a
  * SQL oracle replays every bit from the fixture formulas; no float, no
  * FFT (the spectral featurizer [[WavCodec.bandEnergies]] serves the
  * feature tier — this serves the DEDUP tier, where bit-exactness is
  * the contract).
  */
object AudioFingerprint {

  val Frames = 32

  /** The 31-bit contour (bit f ⇔ E_f > E_{f+1}) of one channel's PCM.
    * Fewer samples than frames leaves the empty frames at energy 0 —
    * still total and deterministic. Int.MinValue's |·| is handled in
    * Long space (no abs overflow).
    */
  def energyContour(samples: Array[Int]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val e = new Array[Long](Frames)
    var t = 0
    while (t < n) {
      val v = samples(t).toLong
      e(Frames * t / n) += (if (v < 0) -v else v)
      t += 1
    }
    var fp = 0L
    var f = 0
    while (f < Frames - 1) {
      if (e(f) > e(f + 1)) fp |= 1L << f
      f += 1
    }
    fp
  }
}
