package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import WebpCodec.Layout

/** VP8L codec differentials: every encoder feature class must
  * round-trip bit-exactly through the decoder on structured AND
  * random pixels; the 2D distance table is pinned against the prefix
  * RFC 9649 lists; the decoder is total on garbage. No JDK WebP
  * decoder exists to differential against — the honest external
  * anchors are the hand-pinned header/container bytes and the RFC's
  * table prefix.
  */
class WebpCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, i: Int): Array[Int] =
    Array.tabulate(w * h) { o =>
      val x = o % w
      val y = o / w
      (((5 * i + 2 * x + 3 * y) % 256) << 16) |
        (((3 * i + 4 * x + y) % 256) << 8) | ((7 * i + x + 2 * y) % 256)
    }

  private def roundtrip(w: Int, h: Int, px: Array[Int],
      layout: Layout, tag: String): Unit = {
    val bytes = WebpCodec.encode(w, h, px, layout)
    val d = WebpCodec.decode(bytes).getOrElse(fail(s"$tag: decode failed"))
    assert(d.width == w && d.height == h, tag)
    val got = d.argb.map(_ & 0xFFFFFF)
    val want = px.map(_ & 0xFFFFFF)
    assert(java.util.Arrays.equals(got, want),
      s"$tag: pixel mismatch at ${got.zip(want).indexWhere(t => t._1 != t._2)}")
    assert(d.argb.forall(p => (p >>> 24) == 0xFF), s"$tag: alpha must be 255")
  }

  test("literal-only image with normal prefix codes round-trips") {
    roundtrip(21, 13, gradient(21, 13, 0), Layout(), "plain")
    roundtrip(1, 1, Array(0x123456), Layout(), "1x1")
  }

  test("two-color image exercises the simple 2-symbol code form") {
    val px = Array.tabulate(21 * 13)(o =>
      if ((o % 21 + o / 21) % 2 == 0) 0x204060 else 0xA0C0E0)
    roundtrip(21, 13, px, Layout(), "checker")
    // single-color image: 1-symbol (0-bit) codes
    roundtrip(9, 5, Array.fill(45)(0x808080), Layout(), "const")
  }

  test("color cache hits round-trip (plateau image, cacheBits 6)") {
    val px = Array.tabulate(20 * 14) { o =>
      val tx = (o % 20) / 5
      val ty = (o / 20) / 3
      ((tx * 50 + 10) << 16) | ((ty * 40 + 20) << 8) | ((tx + ty) * 30)
    }
    roundtrip(20, 14, px, Layout(cacheBits = 6), "cache")
  }

  test("LZ77 backward references round-trip, incl. overlapping copies " +
    "and long lengths") {
    // rows repeat with period 3: one long overlapping copy at dist 3w
    val w = 21
    val h = 13
    val px = Array.tabulate(w * h) { o =>
      val x = o % w
      val y = (o / w) % 3
      ((7 * y + 2 * x) % 256 << 16) | ((x + y) % 256 << 8) | (3 * y % 256)
    }
    roundtrip(w, h, px, Layout(lz77 = true), "lz77")
    roundtrip(w, h, px, Layout(lz77 = true, cacheBits = 4), "lz77+cache")
  }

  test("subtract-green + predictor transform round-trips through all " +
    "14 modes") {
    // sizeBits 2 → 4×4 blocks; 6×4 = 24 blocks cycle modes 0..13
    roundtrip(21, 13, gradient(21, 13, 3),
      Layout(subtractGreen = true, predictorBits = 2), "sg+pred")
    roundtrip(21, 13, gradient(21, 13, 4),
      Layout(predictorBits = 3), "pred8")
  }

  test("color transform round-trips (signed-8 cross-channel deltas)") {
    roundtrip(21, 13, gradient(21, 13, 5), Layout(colorBits = 3), "ct")
  }

  test("color-indexing transform round-trips: bundled (2/4/8 px per " +
    "byte) and unbundled palettes") {
    def palImg(w: Int, h: Int, n: Int): Array[Int] = {
      val pal = Array.tabulate(n)(j =>
        (((3 * j + 50) % 256) << 16) | (((5 * j + 99) % 256) << 8) |
          ((7 * j + 11) % 256))
      Array.tabulate(w * h)(o => pal((o % w + 2 * (o / w)) % n))
    }
    roundtrip(21, 13, palImg(21, 13, 2), Layout(palette = true), "pal2")
    roundtrip(21, 13, palImg(21, 13, 4), Layout(palette = true), "pal4")
    roundtrip(21, 13, palImg(21, 13, 12), Layout(palette = true), "pal12")
    roundtrip(21, 13, palImg(21, 13, 40), Layout(palette = true), "pal40")
  }

  test("meta prefix groups round-trip (two huffman groups by column)") {
    val w = 40
    val h = 12
    // left half dark gradient, right half light — two distinct
    // literal distributions worth separate groups
    val px = Array.tabulate(w * h) { o =>
      val x = o % w
      val y = o / w
      if (x < 20) ((x + y) % 64 << 16) | ((2 * x) % 64 << 8) | (y % 64)
      else (192 + (x + y) % 64 << 16) | (192 + x % 64 << 8) | (192 + y % 64)
    }
    roundtrip(w, h, px, Layout(metaBits = 4), "meta")
  }

  test("random pixels round-trip under every layout (seeded)") {
    val rnd = new scala.util.Random(42)
    val layouts = Seq(
      Layout(), Layout(cacheBits = 8), Layout(lz77 = true),
      Layout(subtractGreen = true), Layout(predictorBits = 4),
      Layout(colorBits = 4), Layout(metaBits = 5),
      Layout(subtractGreen = true, predictorBits = 2, cacheBits = 5,
        lz77 = true))
    for ((lo, k) <- layouts.zipWithIndex) {
      val w = 5 + rnd.nextInt(40)
      val h = 3 + rnd.nextInt(20)
      val px = Array.fill(w * h)(rnd.nextInt(1 << 24))
      roundtrip(w, h, px, lo, s"rand$k")
    }
    // low-entropy randoms (few colors) hit cache/lz77 paths harder
    for (k <- 0 until 4) {
      val w = 17 + k
      val h = 11
      val colors = Array.fill(5)(rnd.nextInt(1 << 24))
      val px = Array.fill(w * h)(colors(rnd.nextInt(5)))
      roundtrip(w, h, px,
        Layout(cacheBits = 4, lz77 = true), s"lowent$k")
    }
  }

  test("container and header bytes are the pinned public layout") {
    val bytes = WebpCodec.encode(2, 2,
      Array(0x010203, 0x040506, 0x070809, 0x0A0B0C), Layout())
    assert(new String(bytes.slice(0, 4), "ISO-8859-1") == "RIFF")
    assert(new String(bytes.slice(8, 12), "ISO-8859-1") == "WEBP")
    assert(new String(bytes.slice(12, 16), "ISO-8859-1") == "VP8L")
    // RIFF size = file length - 8, LE
    val riffSz = (bytes(4) & 0xFF) | ((bytes(5) & 0xFF) << 8) |
      ((bytes(6) & 0xFF) << 16) | ((bytes(7) & 0xFF) << 24)
    assert(riffSz == bytes.length - 8)
    // VP8L signature byte
    assert((bytes(20) & 0xFF) == 0x2F)
    // 14-bit width-1 = 1 in the LSB-first stream: byte 21 = 0x01,
    // height-1 = 1 lands at bits 14..27 → byte 21..24 pattern
    assert((bytes(21) & 0xFF) == 0x01)
    assert(graft.multimodal.MagicBytes.sniffMime(bytes) == "image/webp")
  }

  test("distance mapping table: the RFC-listed prefix is pinned and " +
    "plane codes beyond 120 carry distance directly") {
    // RFC 9649 §4.2.2's first 24 (dx, dy) entries
    assert(WebpCodec.distMapPrefix(24) == Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0)))
    assert(WebpCodec.planeToDistance(30, 1) == 30)  // (0,1): one row up
    assert(WebpCodec.planeToDistance(30, 2) == 1)   // (1,0): previous px
    assert(WebpCodec.planeToDistance(30, 4) == 29)  // (-1,1)
    assert(WebpCodec.planeToDistance(30, 121) == 1) // direct form
    assert(WebpCodec.planeToDistance(30, 320) == 200)
    // negative dx at tiny widths clamps to 1, never 0 or negative
    assert(WebpCodec.planeToDistance(1, 4) == 1)
  }

  test("decoder is total on garbage, truncation, and non-VP8L WebP") {
    val rnd = new scala.util.Random(7)
    assert(WebpCodec.decode(Array.emptyByteArray).isEmpty)
    assert(WebpCodec.decode("RIFFxxxxWEBP".getBytes("ISO-8859-1")).isEmpty)
    for (_ <- 0 until 200) {
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte)
      WebpCodec.decode(junk) // must not throw
    }
    val good = WebpCodec.encode(9, 7, gradient(9, 7, 1), Layout())
    for (cut <- 0 until good.length by 3)
      WebpCodec.decode(good.take(cut)) // truncations must not throw
    for (_ <- 0 until 300) { // bit flips must not throw
      val b = good.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      WebpCodec.decode(b)
    }
  }
}
