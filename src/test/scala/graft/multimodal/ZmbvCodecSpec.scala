package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ZmbvCodec contract: lossless round-trip across formats / keyframe
  * cadences / palette deltas, genuine motion compensation (inter frames
  * compress and carry non-zero vectors), shared-zlib-context handling,
  * zero-border motion semantics against a hand-assembled frame (an
  * independent check of the bit layout, not just self-consistency),
  * totality on garbage, and AVI header round-trip.
  */
class ZmbvCodecSpec extends AnyFunSuite {

  private val Z = ZmbvCodec

  private def pal(seed: Int): Array[Byte] =
    Array.tabulate(768)(k => ((k * 31 + seed * 7) % 256).toByte)

  /** Deterministic pseudo-random pixel buffer. */
  private def noise(seed: Int, n: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(256).toByte)
  }

  /** A w×h 8bpp frame sequence scrolling `dx` px per frame — the shape
    * motion compensation exists for.
    */
  private def scroll(w: Int, h: Int, nFrames: Int, dx: Int): Seq[(Array[Byte], Array[Byte])] = {
    val p = pal(1)
    (0 until nFrames).map { f =>
      val px = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w)
        px(y * w + x) = java.lang.Math.floorMod((x - dx * f) * 3 + y * 11, 256).toByte
      (px, p)
    }
  }

  private def assertLossless(w: Int, h: Int, fmt: Int,
      frames: Seq[(Array[Byte], Array[Byte])], keyEvery: Int = Int.MaxValue): Unit = {
    val payloads = Z.encode(w, h, fmt, frames, keyEvery = keyEvery)
    val v = Z.decode(w, h, payloads).getOrElse(fail("decode refused own encoding"))
    assert(v.frames.length == frames.length)
    v.frames.zip(frames).zipWithIndex.foreach { case ((got, (px, p)), i) =>
      assert(got.pixels.sameElements(px), s"frame $i pixels differ")
      if (fmt == Z.FmtPal8) assert(got.palette.sameElements(p), s"frame $i palette differs")
    }
  }

  test("round-trip: 8bpp scroll, edge blocks on both axes, mid-stream keyframe") {
    assertLossless(24, 18, Z.FmtPal8, scroll(24, 18, 7, 3), keyEvery = 4)
  }

  test("round-trip: 8bpp noise (no exploitable motion) and static frames") {
    val p = pal(3)
    val static = (0 until 4).map(_ => (noise(5, 40 * 32), p))
    assertLossless(40, 32, Z.FmtPal8, static)
    val moving = (0 until 4).map(f => (noise(f, 40 * 32), p))
    assertLossless(40, 32, Z.FmtPal8, moving)
  }

  test("round-trip: 15/16/32bpp formats (no palette)") {
    for (fmt <- Seq(Z.Fmt15, Z.Fmt16, Z.Fmt32)) {
      val bpp = if (fmt == Z.Fmt32) 4 else 2
      val frames = (0 until 3).map(f => (noise(f + 10 * fmt, 20 * 12 * bpp), Array.emptyByteArray))
      assertLossless(20, 12, fmt, frames)
    }
  }

  test("palette delta mid-GOP sets flags bit 1 and round-trips") {
    val px = noise(2, 16 * 16)
    val frames = Seq((px, pal(1)), (px, pal(1)), (px, pal(9)))
    val payloads = Z.encode(16, 16, Z.FmtPal8, frames)
    assert((payloads(1)(0) & 2) == 0, "unchanged palette must not flag a delta")
    assert((payloads(2)(0) & 2) == 2, "changed palette must flag a delta")
    assertLossless(16, 16, Z.FmtPal8, frames)
  }

  test("inter frames genuinely motion-compensate: smaller than intra, and smaller than zero-motion-only encoding") {
    val frames = scroll(64, 48, 6, 3)
    val payloads = Z.encode(64, 48, Z.FmtPal8, frames)
    val intraSize = payloads.head.length
    payloads.tail.foreach(p => assert(p.length < intraSize / 2,
      s"inter frame ${p.length} B should be far under the ${intraSize} B intra"))
    // restricting the search to (0,0) forces XOR-everything — real motion
    // search must beat it on a scrolling scene
    val noSearch = Z.encode(64, 48, Z.FmtPal8, frames, search = 0)
    assert(payloads.tail.map(_.length).sum < noSearch.tail.map(_.length).sum / 2,
      "±8 search should compress a 3-px scroll far better than zero-motion")
  }

  test("raw (compression 0) round-trips") {
    val frames = scroll(24, 18, 3, 3)
    val payloads = Z.encode(24, 18, Z.FmtPal8, frames, compress = false)
    val v = Z.decode(24, 18, payloads).getOrElse(fail("raw decode failed"))
    v.frames.zip(frames).foreach { case (got, (px, _)) =>
      assert(got.pixels.sameElements(px))
    }
  }

  test("hand-assembled payloads pin the bit layout (independent of the encoder)") {
    // 8×4 frame, 16×16 blocks → exactly one block. Intra: solid 5s.
    // Inter: vector (2, 1) with the XOR flag, residual all zero except
    // one byte — so expected pixels are fully hand-computable, including
    // the zero border read by off-frame sources.
    val w = 8; val h = 4
    val p = pal(0)
    val intraBody = new java.io.ByteArrayOutputStream()
    intraBody.write(p); intraBody.write(Array.fill(w * h)(5.toByte))
    val intra = Array[Byte](1, 0, 1, 0 /* comp=0 */, 4, 16, 16) ++ intraBody.toByteArray
    // block info: 1 block, 2 bytes, padded to 4
    val mv = Array[Byte](((2 << 1) | 1).toByte, (1 << 1).toByte, 0, 0)
    val resid = new Array[Byte](w * h)
    resid(0) = 0x0F // flips pixel (0,0) of the motion-compensated result
    val inter = Array[Byte](0) ++ mv ++ resid
    val v = Z.decode(w, h, Seq(intra, inter)).getOrElse(fail("hand-built stream refused"))
    val f1 = v.frames(1)
    for (y <- 0 until h; x <- 0 until w) {
      // source (x+2, y+1): rows y=3 read the border (0), cols x>=6 read border
      val mc = if (x + 2 < w && y + 1 < h) 5 else 0
      val expect = if (x == 0 && y == 0) mc ^ 0x0F else mc
      assert((f1.pixels(y * w + x) & 0xFF) == expect, s"pixel ($x,$y)")
    }
  }

  test("negative vectors read the zero border on the leading edge") {
    val w = 4; val h = 4
    val intra = Array[Byte](1, 0, 1, 0, 4, 16, 16) ++ pal(0) ++
      Array.tabulate(w * h)(k => (k + 1).toByte)
    val mv = Array[Byte]((((-1) << 1) | 0).toByte, ((-1) << 1).toByte, 0, 0)
    val inter = Array[Byte](0) ++ mv
    val v = Z.decode(w, h, Seq(intra, inter)).getOrElse(fail("decode refused"))
    val f1 = v.frames(1)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = if (x == 0 || y == 0) 0 else ((y - 1) * w + (x - 1)) + 1
      assert((f1.pixels(y * w + x) & 0xFF) == expect, s"pixel ($x,$y)")
    }
  }

  test("total on garbage: truncated, non-ZMBV, inter-first, bad versions") {
    val good = Z.encode(16, 16, Z.FmtPal8, scroll(16, 16, 2, 1))
    assert(Z.decode(16, 16, Seq(Array[Byte]())).isEmpty)
    assert(Z.decode(16, 16, Seq(Array[Byte](1, 0, 1))).isEmpty)
    assert(Z.decode(16, 16, Seq(Array.fill(100)(0x42.toByte))).isEmpty, "inter before any intra")
    assert(Z.decode(16, 16, Seq(Array[Byte](1, 9, 9, 1, 4, 16, 16))).isEmpty, "bad version")
    assert(Z.decode(16, 16, Seq(good.head.take(10))).isEmpty, "truncated zlib")
    assert(Z.decode(16, 16, good.map(p => p.take(p.length - 1))).isEmpty ||
      Z.decode(16, 16, good).nonEmpty) // never throws either way
  }

  test("inter frames continue ONE zlib stream: dropping the first inter breaks the second") {
    val frames = scroll(32, 32, 4, 2)
    val payloads = Z.encode(32, 32, Z.FmtPal8, frames)
    // full stream decodes…
    assert(Z.decode(32, 32, payloads).nonEmpty)
    // …but frame 2's deflate segment references frame 1's dictionary, so
    // skipping frame 1 must NOT reproduce frame 2's pixels (either the
    // inflate fails → None, or the bytes inflate differently)
    val skipped = Z.decode(32, 32, Seq(payloads(0), payloads(2)))
    val truth = Z.decode(32, 32, payloads).get.frames(2).pixels
    assert(skipped.isEmpty || !skipped.get.frames(1).pixels.sameElements(truth),
      "inter frames must depend on the shared zlib context")
  }

  test("encodeAvi: header carries fourcc + dims; demux + decode round-trips") {
    val frames = scroll(24, 18, 5, 3)
    val avi = Z.encodeAvi(24, 18, Z.FmtPal8, frames, keyEvery = 4)
    val info = AviCodec.videoInfo(avi)
    assert(info.contains(("ZMBV", 24, 18)))
    val payloads = AviCodec.frames(avi).getOrElse(fail("demux failed"))
    assert(payloads.length == 5)
    val v = Z.decode(24, 18, payloads).getOrElse(fail("decode failed"))
    v.frames.zip(frames).foreach { case (got, (px, _)) =>
      assert(got.pixels.sameElements(px))
    }
    // rgb() agrees with the palette on a probe pixel
    val f0 = v.frames.head
    val j = f0.pixels(0) & 0xFF
    assert(f0.rgb(0, 0) == ((pal(1)(3 * j) & 0xFF, pal(1)(3 * j + 1) & 0xFF, pal(1)(3 * j + 2) & 0xFF)))
  }

  test("Multimodal routes ZMBV-AVI through the real decode path") {
    val frames = scroll(24, 18, 5, 3)
    val avi = Z.encodeAvi(24, 18, Z.FmtPal8, frames, keyEvery = 4)
    val row = Multimodal.MediaRow("clip.avi", "video", "application/avi", avi, Map())
    val feats = new Multimodal.DefaultDecoder(strict = true).features(row)
    assert(feats.length == 5)
    assert(feats.forall(_.feature_real), "ZMBV must be a REAL path (strict mode passes)")
    assert(feats.forall(f => f.width == 24 && f.height == 18))
    // avg-color feature matches a direct computation on frame 0
    val v = Z.decode(24, 18, Z.encode(24, 18, Z.FmtPal8, frames, keyEvery = 4)).get
    val f0 = v.frames.head
    var sr = 0L
    for (y <- 0 until 18; x <- 0 until 24) sr += f0.rgb(x, y)._1
    assert(math.abs(feats.head.feature(0) - sr / (24f * 18f) / 255f) < 1e-6f)
  }

  test("decompression bomb: a tiny frame whose zlib body inflates to megabytes is rejected") {
    // A conforming 4x4 8bpp intra body is at most 768 (palette) + 16
    // (pixels) bytes; the stream bound derived from (w, h, bpp) must
    // reject a crafted segment that would balloon to 8 MiB — previously
    // it was fully inflated (and an intra body LARGER than needed was
    // accepted), an untrusted-.avi decompression-bomb DoS.
    val bomb = new Array[Byte](8 << 20) // 8 MiB of zeros -> ~8 KiB deflated
    val d = new java.util.zip.Deflater(6)
    d.setInput(bomb); d.finish()
    val buf = new Array[Byte](1 << 16)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val payload = Array[Byte](1, 0, 1, 1, Z.FmtPal8.toByte, 16, 16) ++ out.toByteArray
    assert(payload.length < 32768, "precondition: the bomb frame is tiny on the wire")
    assert(Z.decode(4, 4, Seq(payload)).isEmpty,
      "oversized decompressed body must be rejected, not inflated")
    // the engine's own streams still decode under the same bound
    val frames = scroll(24, 18, 4, 3)
    assert(Z.decode(24, 18, Z.encode(24, 18, Z.FmtPal8, frames, keyEvery = 2)).isDefined)
  }
}
