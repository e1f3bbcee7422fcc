package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** PnmCodec contract: hand-assembled bytes against the published
  * grammar (independent of the builder), the ASCII/binary encoding
  * pairs decoding IDENTICALLY for the same pixel function (P1≡P4,
  * P2≡P5, P3≡P6 — six encoders, three decode results), PBM's
  * 1-is-black rule, maxval scaling, comment/whitespace tolerance,
  * strict rejection, and totality.
  */
class PnmCodecSpec extends AnyFunSuite {

  test("hand-assembled P2: grammar fields decode per the spec text") {
    val ascii = "P2\n# comment\n3 2\n15\n0 7 15\n15 7 0\n"
    val img = PnmCodec.decode(ascii.getBytes("US-ASCII"))
      .getOrElse(fail("conforming P2 rejected"))
    assert(img.kind == 2 && img.width == 3 && img.height == 2 && img.maxval == 15)
    // 0→0, 7→7*255/15=119, 15→255, replicated to RGB
    assert(img.rgb.toSeq == Seq(0x000000, 0x777777, 0xFFFFFF,
      0xFFFFFF, 0x777777, 0x000000))
  }

  test("hand-assembled P4: MSB-first packed rows, 1 is black, row padding") {
    // 10 px wide → 2 bytes/row; row0 = 1000000001, row1 = all white
    val head = "P4\n10 2\n".getBytes("US-ASCII")
    val raster = Array[Byte](0x80.toByte, 0x40, 0x00, 0x00)
    // bit layout: byte0 MSB = x0, byte1 bit6 = x9
    val img = PnmCodec.decode(head ++ raster).getOrElse(fail("P4 rejected"))
    assert(img.width == 10 && img.height == 2)
    assert(img.rgb(0) == 0x000000, "x0 black")
    assert(img.rgb(9) == 0x000000, "x9 black (second byte bit 6)")
    assert(img.rgb(1) == 0xFFFFFF && img.rgb(10) == 0xFFFFFF)
  }

  test("encoding pairs decode identically: P1=P4, P2=P5, P3=P6") {
    val (w, h) = (11, 7) // 11 exercises P4 row padding
    val bit = (x: Int, y: Int) => (((x * 3 + y) % 2), 0, 0)
    val gray = (x: Int, y: Int) => { val g = (x * 17 + y * 5) % 201; (g, g, g) }
    val rgbf = (x: Int, y: Int) => ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)
    def dec(k: Int, mv: Int, f: (Int, Int) => (Int, Int, Int)) =
      PnmCodec.decode(PnmCodec.build(k, w, h, mv, f,
        comment = k % 2 == 0)).getOrElse(fail(s"P$k rejected"))
    assert(dec(1, 1, bit).rgb.toSeq == dec(4, 1, bit).rgb.toSeq)
    assert(dec(2, 200, gray).rgb.toSeq == dec(5, 200, gray).rgb.toSeq)
    assert(dec(3, 255, rgbf).rgb.toSeq == dec(6, 255, rgbf).rgb.toSeq)
    // and the pairs really used different encodings
    assert(PnmCodec.build(2, w, h, 200, gray).length !=
      PnmCodec.build(5, w, h, 200, gray).length)
  }

  test("strictness: junk, short rasters, out-of-range, trailing garbage") {
    val ok = PnmCodec.build(6, 4, 3, 255, (x, y) => (x, y, x + y))
    assert(PnmCodec.decode(ok).isDefined)
    assert(PnmCodec.decode(ok.dropRight(1)).isEmpty, "short binary raster")
    assert(PnmCodec.decode(ok ++ Array[Byte](0)).isEmpty, "trailing garbage")
    assert(PnmCodec.decode("P7\n1 1\n255\n x".getBytes).isEmpty, "bad magic")
    assert(PnmCodec.decode("P2\n2 1\n255\n12 999\n".getBytes).isEmpty,
      "sample above maxval")
    assert(PnmCodec.decode("P2\n2 1\n300\n1 2\n".getBytes).isEmpty,
      "maxval > 255 (2-byte form, documented unsupported)")
    assert(PnmCodec.decode("P2\n2 1\n255\n1\n".getBytes).isEmpty,
      "short ASCII raster")
    assert(PnmCodec.decode("P1\n2 1\n0 2\n".getBytes).isEmpty,
      "PBM digit beyond 0/1")
    val rnd = new scala.util.Random(0x9E)
    for (_ <- 0 until 300)
      PnmCodec.decode(Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte))
  }
}
