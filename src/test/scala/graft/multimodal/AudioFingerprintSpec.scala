package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.AudioFingerprint.energyContour

/** Energy-contour fingerprint contract: pinned by an independent
  * recompute (grouped map, BigInt energies), total on edge inputs
  * (empty, shorter-than-32, Int.MinValue), gain-monotone (scaling all
  * samples up preserves the contour), and container-invariant (the same
  * PCM fingerprints identically through bare FLAC, Ogg, and Matroska —
  * the property the cross-container near-dup join relies on).
  */
class AudioFingerprintSpec extends AnyFunSuite {

  private def refContour(s: Array[Int]): Long = {
    if (s.isEmpty) return 0L
    val e = s.indices.groupBy(t => 32 * t / s.length)
      .view.mapValues(_.map(t => BigInt(s(t)).abs).sum).toMap
      .withDefaultValue(BigInt(0))
    (0 until 31).foldLeft(0L)((h, f) => if (e(f) > e(f + 1)) h | (1L << f) else h)
  }

  test("matches the independent recompute on 300 random signals (incl. n < 32)") {
    val rnd = new scala.util.Random(0xE1E2)
    for (k <- 0 until 300) {
      val n = rnd.nextInt(5000)
      val s = Array.fill(n)(rnd.nextInt(65536) - 32768)
      assert(energyContour(s) == refContour(s), s"case $k (n=$n)")
    }
  }

  test("edge inputs are total: empty → 0, Int.MinValue does not overflow abs") {
    assert(energyContour(Array.empty[Int]) == 0L)
    val s = Array.fill(64)(Int.MinValue)
    assert(energyContour(s) == refContour(s), "MinValue |.| must be exact in Long space")
  }

  test("uniform gain preserves the contour (the near-dup property)") {
    val rnd = new scala.util.Random(0x6A1)
    val s = Array.fill(4096)(rnd.nextInt(4096) - 2048)
    val loud = s.map(_ * 7)
    assert(energyContour(s) == energyContour(loud))
  }

  test("container-invariant: identical fp through bare FLAC, Ogg, and MKV") {
    val pcm = Array.tabulate(9000)(t => ((t * 13 + 5) % 65536) - 32768)
    val flac = FlacCodec.encode(9000, Array(pcm))
    def fp(stream: Array[Byte]): Long =
      energyContour(FlacCodec.decode(stream).get.channels(0))
    val bare = fp(flac)
    val viaOgg = fp(OggCodec.flacStream(OggCodec.muxFlac(flac).get).get)
    val viaMkv = fp(MkvCodec.flacStream(
      MkvCodec.demux(MkvCodec.muxFlac(flac).get).get.head).get)
    assert(bare == viaOgg && bare == viaMkv,
      "the fingerprint must depend only on the samples, never the carriage")
    assert(bare == energyContour(pcm), "and equal the source PCM's contour")
  }
}
