package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** MsRleCodec contract: hand-assembled payloads (independent of the
  * encoder) pin the BI_RLE8 byte layout — runs, absolute mode with word
  * padding, delta skips, EOL/EOI, bottom-up rows; round-trips are exact;
  * the conditional-replenishment property holds (dropping an inter frame
  * corrupts the next); the 255 bounds split correctly; decode is total;
  * and the AVI container carries fourcc/dims/palette faithfully.
  */
class MsRleCodecSpec extends AnyFunSuite {

  private val grayPal: Array[Byte] =
    Array.tabulate(768)(i => (i / 3).toByte)

  test("hand-assembled payload: runs, absolute mode, delta, EOL, EOI") {
    // 4×3 canvas. Bottom-up: row yUp=0 = image row 2, etc.
    val p = Array[Int](
      0, 3, 7, 8, 9, 0, // absolute mode: 3 literals + pad byte
      1, 6,             // run 1×6
      0, 0,             // EOL
      0, 2, 1, 0,       // delta: skip 1 right (pixel keeps canvas init 0)
      3, 4,             // run 3×4
      0, 0,             // EOL
      4, 2,             // run 4×2
      0, 1              // end of bitmap
    ).map(_.toByte)
    val v = MsRleCodec.decode(4, 3, grayPal, Seq(p))
      .getOrElse(fail("decode refused hand-assembled payload"))
    assert(v.frames.head.pixels.toSeq.map(_.toInt) ==
      Seq(2, 2, 2, 2, /* image row 0 = yUp 2 */
          0, 4, 4, 4, /* image row 1 = yUp 1 (x=0 skipped, init 0) */
          7, 8, 9, 6  /* image row 2 = yUp 0 */))
  }

  test("round-trip: random frames across keyframes and inter frames") {
    val rnd = new scala.util.Random(31)
    val w = 16; val h = 12
    val frames = (0 until 7).map { _ =>
      Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    }
    val payloads = MsRleCodec.encodePayloads(w, h, frames, keyEvery = 3)
    val v = MsRleCodec.decode(w, h, grayPal, payloads)
      .getOrElse(fail("self-decode failed"))
    frames.indices.foreach { i =>
      assert(v.frames(i).pixels.sameElements(frames(i)), s"frame $i differs")
    }
  }

  test("inter frames are deltas: small, and dropping one corrupts the next") {
    val w = 16; val h = 12
    val f0 = Array.fill[Byte](w * h)(1)
    val f1 = f0.clone(); f1(37) = 2
    val f2 = f1.clone(); f2(101) = 3
    val ps = MsRleCodec.encodePayloads(w, h, Seq(f0, f1, f2), keyEvery = 0)
    // inter payloads paint 1 pixel + row plumbing: smaller than the
    // keyframe and carrying a genuine delta escape (00 02 dx dy)
    assert(ps(1).length < ps(0).length,
      s"inter frame not delta-coded: ${ps(1).length} vs key ${ps(0).length}")
    assert(ps(1).toSeq.sliding(2).exists(w => w == Seq[Byte](0, 2)),
      "inter frame contains no delta escape")
    assert(!ps(0).toSeq.sliding(2).exists(w => w == Seq[Byte](0, 2)),
      "keyframe should not need delta escapes")
    val ok = MsRleCodec.decode(w, h, grayPal, ps).get
    assert(ok.frames(2).pixels.sameElements(f2))
    // conditional replenishment: frame 2's payload assumes frame 1's
    // canvas — decoding it right after frame 0 must NOT reproduce f2
    val skipped = MsRleCodec.decode(w, h, grayPal, Seq(ps(0), ps(2))).get
    assert(!skipped.frames(1).pixels.sameElements(f2))
    assert(skipped.frames(1).pixels(101) == 3 && skipped.frames(1).pixels(37) == 1)
  }

  test("run and delta lengths split at the format's 255 bound") {
    val w = 600; val h = 1
    val f0 = Array.fill[Byte](w)(9)
    val f1 = f0.clone(); f1(599) = 5 // forces delta skips 255+255+89
    val ps = MsRleCodec.encodePayloads(w, h, Seq(f0, f1), keyEvery = 0)
    val v = MsRleCodec.decode(w, h, grayPal, ps).get
    assert(v.frames(0).pixels.sameElements(f0))
    assert(v.frames(1).pixels.sameElements(f1))
  }

  test("decode is total on arbitrary and truncated payloads") {
    val rnd = new scala.util.Random(41)
    for (len <- Seq(0, 1, 2, 7, 64, 500); _ <- 0 until 30) {
      val b = new Array[Byte](len); rnd.nextBytes(b)
      MsRleCodec.decode(8, 8, grayPal, Seq(b)) // must not throw
    }
    val good = MsRleCodec.encodePayloads(8, 8,
      Seq(Array.fill[Byte](64)(3)), keyEvery = 1).head
    for (cut <- 0 until good.length)
      assert(MsRleCodec.decode(8, 8, grayPal, Seq(good.take(cut))).isEmpty,
        s"truncation at $cut must fail (no EOI)")
  }

  test("AVI container carries fourcc, dims, and the strf palette") {
    val w = 16; val h = 12
    val pal = Array.tabulate[Byte](768)(i => ((i * 37 + 5) % 256).toByte)
    val frames = Seq(Array.tabulate[Byte](w * h)(o => (o % 251).toByte))
    val avi = MsRleCodec.encodeAvi(w, h, pal, frames)
    assert(AviCodec.videoInfo(avi).contains(("MRLE", w, h)))
    assert(AviCodec.palette8(avi).exists(_.sameElements(pal)))
    val payloads = AviCodec.frames(avi).get
    val v = MsRleCodec.decode(w, h, pal, payloads).get
    assert(v.frames.head.pixels.sameElements(frames.head))
    // rgb() resolves through the palette
    val (r, g, b) = v.frames.head.rgb(0, 0)
    assert((r, g, b) == ((pal(0) & 0xFF, pal(1) & 0xFF, pal(2) & 0xFF)))
  }

  test("decoder routes MS-RLE AVI into the real video path (strict passes)") {
    val w = 16; val h = 12
    val pal = Array.tabulate[Byte](768)(i => (i % 256).toByte)
    val frames = (0 until 4).map(f =>
      Array.tabulate[Byte](w * h)(o => ((o + 13 * f) % 256).toByte))
    val avi = MsRleCodec.encodeAvi(w, h, pal, frames, keyEvery = 2)
    val dec = new Multimodal.DefaultDecoder(strict = true)
    val rows = dec.features(Multimodal.MediaRow(
      "clip.avi", "video", "application/avi", avi, Map.empty))
    assert(rows.length == 4)
    assert(rows.forall(r => r.feature_real && r.width == w && r.height == h))
    assert(rows.map(_.frame_index) == Seq(0, 1, 2, 3))
  }
}
