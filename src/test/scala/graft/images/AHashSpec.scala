package graft.images

import org.scalatest.funsuite.AnyFunSuite
import graft.images.ImageOps.{aHash64, Image}

/** aHash contract: the 64-bit perceptual fingerprint is pinned by an
  * INDEPENDENT recompute (map-of-cells built the naive way, no shared
  * code with the pixel-loop implementation), plus the closed-form cases
  * the DuckDB oracles replay (solid → 0, two-tone → region masks) and
  * the pigeonhole recall guarantee the banded near-dup join relies on.
  */
class AHashSpec extends AnyFunSuite {

  /** Naive independent recompute: materialize cell pixel lists via the
    * same partition rule (8x div w, 8y div h), compare with BigInt
    * exact rationals instead of cross-multiplication.
    */
  private def refHash(img: Image): Long = {
    val cells = (0 until img.height).flatMap { y =>
      (0 until img.width).map { x =>
        val p = img.pixels(y * img.width + x)
        val luma = BigInt(299) * ((p >> 16) & 0xFF) +
          BigInt(587) * ((p >> 8) & 0xFF) + BigInt(114) * (p & 0xFF)
        ((8 * y / img.height) * 8 + 8 * x / img.width, luma)
      }
    }
    val total = cells.map(_._2).sum
    val n = BigInt(img.pixels.length)
    val byCell = cells.groupBy(_._1).view.mapValues(_.map(_._2))
    byCell.foldLeft(0L) { case (h, (k, lumas)) =>
      // mean(cell) > mean(all) as exact rationals
      if (lumas.sum * n > total * lumas.length) h | (1L << k) else h
    }
  }

  test("matches the independent recompute on 200 random images (odd dims included)") {
    val rnd = new scala.util.Random(0xA4A5)
    for (k <- 0 until 200) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val img = Image(w, h, Array.fill(w * h)(rnd.nextInt(1 << 24)))
      assert(aHash64(img) == refHash(img), s"case $k (${w}x$h)")
    }
  }

  test("solid images hash to 0 (ties clear bits) — the s-tree closed form") {
    for (c <- Seq(0x000000, 0xFFFFFF, 0x123456, 0x0A0B0C))
      assert(aHash64(Image(16, 16, Array.fill(256)(c))) == 0L)
  }

  test("two-tone 10/6 split yields the left or right region mask — the t-tree closed form") {
    def img(i: Int): Image = {
      val a = ((i * 10) << 16) | ((255 - i * 10) << 8) | i
      val b = ((i * 5) << 16) | (100 << 8) | (200 - i * 5)
      Image(16, 16, Array.tabulate(256)(p => if (p % 16 < 10) a else b))
    }
    val left = 31L * 16843009 | (31L * 16843009) << 32 // cells c0..c4, all rows
    val right = 224L * 16843009 | (224L * 16843009) << 32 // cells c5..c7
    assert(aHash64(img(0)) == left, "i=0: brighter left half sets the A-region bits")
    assert(aHash64(img(23)) == right, "i=23: luma order flips at i=19")
  }

  test("near-dup invariance: small luma perturbation moves few bits; inversion moves many") {
    val base = Image(32, 32, Array.tabulate(1024)(o => {
      val v = (o * 7) % 256
      (v << 16) | (v << 8) | v
    }))
    val h0 = aHash64(base)
    // brighten one pixel per cell slightly: cell means barely move
    val tweaked = Image(32, 32, base.pixels.clone())
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val o = (cy * 4) * 32 + cx * 4
      val p = tweaked.pixels(o)
      tweaked.pixels(o) = p | 0x010101
    }
    val h1 = aHash64(tweaked)
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 8, "near-identical images stay Hamming-close")
    val inverted = Image(32, 32, base.pixels.map(p => ~p & 0xFFFFFF))
    assert(java.lang.Long.bitCount(h0 ^ aHash64(inverted)) >= 32,
      "inversion flips most set/clear decisions")
  }

  test("pigeonhole: Hamming < 4 implies at least one shared 16-bit band (join recall bound)") {
    val rnd = new scala.util.Random(0xBA2D)
    for (_ <- 0 until 500) {
      val h0 = rnd.nextLong()
      val flips = rnd.nextInt(4) // 0..3 bit flips
      val h1 = (0 until flips).foldLeft(h0)((h, _) => h ^ (1L << rnd.nextInt(64)))
      val bands0 = (0 until 4).map(b => (h0 >>> (16 * b)) & 0xFFFF)
      val bands1 = (0 until 4).map(b => (h1 >>> (16 * b)) & 0xFFFF)
      assert(bands0.zip(bands1).exists { case (a, b) => a == b },
        f"dist=${java.lang.Long.bitCount(h0 ^ h1)} must share a band")
    }
  }
}
