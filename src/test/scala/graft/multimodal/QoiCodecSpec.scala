package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** QoiCodec contract: a hand-assembled stream (independent of the
  * encoder) pins every op's byte layout and the index-hash definition;
  * round-trips are exact including wraparound deltas; the greedy encoder
  * actually emits all five op families on plateau images; decode is
  * total; and the decoder routes .qoi payloads as real image features.
  */
class QoiCodecSpec extends AnyFunSuite {

  private def px(q: QoiCodec.Qoi, i: Int): (Int, Int, Int) =
    ((q.r(i) & 0xFF), (q.g(i) & 0xFF), (q.b(i) & 0xFF))

  test("hand-assembled stream: RGB, DIFF, RUN, INDEX, LUMA decode exactly") {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("qoif".getBytes("US-ASCII"))
    Seq(0, 0, 0, 5, 0, 0, 0, 1).foreach(bos.write) // 5×1, BE dims
    bos.write(3); bos.write(0)
    bos.write(0xFE); bos.write(16); bos.write(32); bos.write(48) // RGB
    bos.write(0x79) // DIFF dr=+1 dg=0 db=−1 → (17,32,47)
    bos.write(0xC0) // RUN 1 → (17,32,47)
    // INDEX of (16,32,48,255): (16·3+32·5+48·7+255·11) mod 64 = 21
    bos.write(21)
    bos.write(0xAA); bos.write(0xB4) // LUMA dg=10, drg=3, dbg=−4 → (29,42,54)
    (0 until 7).foreach(_ => bos.write(0)); bos.write(1)
    val q = QoiCodec.decode(bos.toByteArray)
      .getOrElse(fail("decode refused hand-assembled stream"))
    assert(q.width == 5 && q.height == 1 && q.channels == 3)
    assert((0 until 5).map(px(q, _)) == Seq(
      (16, 32, 48), (17, 32, 47), (17, 32, 47), (16, 32, 48), (29, 42, 54)))
  }

  test("round-trip: random and plateau images, wraparound deltas included") {
    val rnd = new scala.util.Random(0x401)
    // wraparound: prev (0,0,0) → (255,255,255) is DIFF −1 each channel
    val shapes = Seq(
      (1, 1, Array(0xFFFFFF)),
      (2, 1, Array(0xFFFFFF, 0x000000)),
      (20, 14, Array.tabulate(280) { o =>
        val tx = (o % 20) / 5; val ty = (o / 20) / 3
        (((5 + 3 * tx + 7 * ty) % 256) << 16) |
          (((3 + 2 * tx + 5 * ty) % 256) << 8) | ((7 + tx + ty) % 256)
      }),
      (37, 23, Array.fill(851)(rnd.nextInt(1 << 24))),
      (64, 64, Array.fill(4096)(rnd.nextInt(8) * 0x040201)) // heavy runs/index
    )
    for ((w, h, pix) <- shapes) {
      val q = QoiCodec.decode(QoiCodec.encode(w, h, pix))
        .getOrElse(fail(s"self-decode failed ${w}x$h"))
      assert(q.width == w && q.height == h)
      pix.indices.foreach { i =>
        assert(px(q, i) == (((pix(i) >> 16) & 0xFF, (pix(i) >> 8) & 0xFF,
          pix(i) & 0xFF)), s"${w}x$h pixel $i")
      }
    }
  }

  test("plateau images exercise all five op families") {
    val pix = Array.tabulate(280) { o =>
      val tx = (o % 20) / 5; val ty = (o / 20) / 3
      (((5 + 3 * tx + 7 * ty) % 256) << 16) |
        (((3 + 2 * tx + 5 * ty) % 256) << 8) | ((7 + tx + ty) % 256)
    }
    pix(137) = 0x80FF01 // one un-delta-able jump forces an RGB literal
    val body = QoiCodec.encode(20, 14, pix).drop(14).dropRight(8)
    def has(p: Int => Boolean): Boolean = {
      // walk the stream so multi-byte ops don't masquerade as tags
      var pos = 0; var found = false
      while (pos < body.length && !found) {
        val b = body(pos) & 0xFF
        if (p(b)) found = true
        pos += (if (b == 0xFE) 4 else if (b == 0xFF) 5
          else if ((b >> 6) == 2) 2 else 1)
      }
      found
    }
    assert(has(b => b == 0xFE), "no RGB literal")
    assert(has(b => b < 0x40), "no INDEX op")
    assert(has(b => b != 0xFE && b != 0xFF && (b >> 6) == 1), "no DIFF op")
    assert(has(b => b != 0xFE && b != 0xFF && (b >> 6) == 2), "no LUMA op")
    assert(has(b => b != 0xFE && b != 0xFF && (b >> 6) == 3), "no RUN op")
  }

  test("decode is total on arbitrary bytes and truncations") {
    val rnd = new scala.util.Random(0x402)
    for (len <- Seq(0, 5, 14, 22, 100, 1000); _ <- 0 until 30) {
      val b = new Array[Byte](len); rnd.nextBytes(b)
      QoiCodec.decode(b) // must not throw
      "qoif".getBytes.copyToArray(b, 0)
      QoiCodec.decode(b)
    }
    val good = QoiCodec.encode(20, 14, Array.fill(280)(0x123456))
    for (cut <- 0 until good.length)
      assert(QoiCodec.decode(good.take(cut)).isEmpty,
        s"truncation at $cut must fail")
  }

  test("decoder routes .qoi payloads as real image features") {
    import graft.TestSpark.spark
    import spark.implicits._
    val pix = Array.fill(12 * 10)(0x00FF00) // pure green
    val bytes = QoiCodec.encode(12, 10, pix)
    val dec = new Multimodal.DefaultDecoder(strict = true)
    val rows = dec.features(Multimodal.MediaRow(
      "img.qoi", "image", "application/qoi", bytes, Map.empty))
    assert(rows.length == 1 && rows.head.feature_real)
    assert(rows.head.width == 12 && rows.head.height == 10)
    assert(rows.head.feature(1) == 1.0f) // green channel saturated
    // and the ingestion edge classifies the extension as image
    val dir = java.nio.file.Files.createTempDirectory("qoi_route")
    java.nio.file.Files.write(dir.resolve("img.qoi"), bytes)
    val media = Multimodal.scanMedia(spark, dir.toString).collect()
    assert(media.length == 1 && media.head.modality == "image")
  }
}
