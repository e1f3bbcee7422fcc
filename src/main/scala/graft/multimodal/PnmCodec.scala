package graft.multimodal

/** Netpbm (PBM/PGM/PPM) decoder implemented from the public format
  * grammar (netpbm.sourceforge.net/doc/{pbm,pgm,ppm}.html): magic
  * P1–P6, whitespace-and-`#`-comment-separated ASCII header tokens
  * (width, height, and — except for bitmaps — maxval), ONE whitespace
  * byte, then the raster. ASCII variants (P1/P2/P3) carry
  * whitespace-separated decimal samples; binary variants carry one
  * byte per sample (P5/P6, maxval ≤ 255 — the 2-byte big-endian
  * maxval > 255 form is rejected, documented) or MSB-first bit-packed
  * rows (P4, each row padded to a byte boundary). PBM semantics: 1 is
  * BLACK (the classic trap — inverted relative to every other format
  * here).
  *
  * The still-ubiquitous interchange format of CV datasets and codec
  * test suites — the image tier's cheapest real container. Strict and
  * total: short rasters, junk tokens, out-of-range samples, maxval
  * > 255, or trailing garbage (beyond one terminal newline in ASCII
  * variants) → None.
  */
object PnmCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  /** Decoded image: `kind` 1–6 (the magic digit), RGB per pixel
    * (grayscale replicated; PBM 1 → black 0, 0 → white 255).
    */
  final case class Pnm(kind: Int, width: Int, height: Int, maxval: Int,
      rgb: Array[Int]) // 0xRRGGBB row-major

  private final class Cursor(val b: Array[Byte]) {
    var i = 0
    def done: Boolean = i >= b.length
    /** Skip whitespace and `#` comments (to end of line). */
    def skipWs(): Unit = {
      var more = true
      while (more) {
        while (i < b.length && (b(i) == ' ' || b(i) == '\t' ||
          b(i) == '\n' || b(i) == '\r' || b(i) == '\f' || b(i) == 11)) i += 1
        if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
        } else more = false
      }
    }
    def int(maxDigits: Int = 7): Int = {
      skipWs()
      var v = 0
      var n = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        n += 1
        if (n > maxDigits) fail()
        i += 1
      }
      if (n == 0) fail()
      v
    }
    /** Exactly one whitespace byte separates the header from a BINARY
      * raster (the grammar's single-whitespace rule — a comment here
      * would be raster bytes).
      */
    def rasterSep(): Unit = {
      if (i >= b.length || !(b(i) == ' ' || b(i) == '\t' || b(i) == '\n' ||
        b(i) == '\r')) fail()
      i += 1
    }
  }

  def decode(bytes: Array[Byte]): Option[Pnm] =
    try {
      if (bytes.length < 2 || bytes(0) != 'P') fail()
      val kind = bytes(1) - '0'
      if (kind < 1 || kind > 6) fail()
      val c = new Cursor(bytes)
      c.i = 2
      val w = c.int()
      val h = c.int()
      if (w <= 0 || h <= 0 || w.toLong * h > (1 << 24)) fail()
      val bitmap = kind == 1 || kind == 4
      val maxval = if (bitmap) 1 else c.int()
      if (!bitmap && (maxval <= 0 || maxval > 255)) fail()
      val color = kind == 3 || kind == 6
      val rgb = new Array[Int](w * h)
      kind match {
        case 1 => // ASCII bitmap: 0/1 tokens (whitespace optional per spec,
          // but tokens are single digits so int() reads them one at a
          // time only when separated; accept dense digit runs too)
          var p = 0
          while (p < w * h) {
            c.skipWs()
            if (c.done) fail()
            val ch = c.b(c.i)
            if (ch != '0' && ch != '1') fail()
            c.i += 1
            rgb(p) = if (ch == '1') 0x000000 else 0xFFFFFF
            p += 1
          }
        case 2 | 3 =>
          var p = 0
          val n = w * h * (if (color) 3 else 1)
          val tmp = new Array[Int](n)
          while (p < n) {
            val v = c.int()
            if (v > maxval) fail()
            tmp(p) = v * 255 / maxval
            p += 1
          }
          var q = 0
          while (q < w * h) {
            rgb(q) =
              if (color) (tmp(3 * q) << 16) | (tmp(3 * q + 1) << 8) | tmp(3 * q + 2)
              else (tmp(q) << 16) | (tmp(q) << 8) | tmp(q)
            q += 1
          }
        case 4 =>
          c.rasterSep()
          val rowBytes = (w + 7) / 8
          if (c.i + rowBytes * h > bytes.length) fail()
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val bit = (bytes(c.i + y * rowBytes + x / 8) >> (7 - x % 8)) & 1
              rgb(y * w + x) = if (bit == 1) 0x000000 else 0xFFFFFF
              x += 1
            }
            y += 1
          }
          c.i += rowBytes * h
        case _ => // 5 | 6
          c.rasterSep()
          val n = w * h * (if (color) 3 else 1)
          if (c.i + n > bytes.length) fail()
          var q = 0
          while (q < w * h) {
            def s(k: Int): Int = {
              val v = bytes(c.i + (if (color) 3 * q + k else q)) & 0xFF
              if (v > maxval) fail()
              v * 255 / maxval
            }
            rgb(q) =
              if (color) (s(0) << 16) | (s(1) << 8) | s(2)
              else { val g = s(0); (g << 16) | (g << 8) | g }
            q += 1
          }
          c.i += n
      }
      // strictness: nothing may follow the raster except, for ASCII
      // variants, trailing whitespace (writers end with a newline)
      if (kind <= 3) c.skipWs()
      if (!c.done) fail()
      Some(Pnm(kind, w, h, maxval, rgb))
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  /** Deterministic builder for all six variants. `px(x, y)` yields the
    * RAW sample(s): for bitmaps 0/1, otherwise (r, g, b) or (g, g, g)
    * each ≤ maxval.
    */
  def build(kind: Int, w: Int, h: Int, maxval: Int,
      px: (Int, Int) => (Int, Int, Int), comment: Boolean = false): Array[Byte] = {
    require(kind >= 1 && kind <= 6)
    val out = new java.io.ByteArrayOutputStream()
    def s(str: String): Unit =
      out.write(str.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    s(s"P$kind\n")
    if (comment) s("# graft fixture\n")
    s(s"$w $h\n")
    val bitmap = kind == 1 || kind == 4
    if (!bitmap) s(s"$maxval\n")
    kind match {
      case 1 =>
        for (y <- 0 until h)
          s((0 until w).map(x => px(x, y)._1).mkString("", " ", "\n"))
      case 2 =>
        for (y <- 0 until h)
          s((0 until w).map(x => px(x, y)._1).mkString("", " ", "\n"))
      case 3 =>
        for (y <- 0 until h)
          s((0 until w).flatMap { x =>
            val (r, g, b) = px(x, y); Seq(r, g, b)
          }.mkString("", " ", "\n"))
      case 4 =>
        val rowBytes = (w + 7) / 8
        for (y <- 0 until h) {
          val row = new Array[Byte](rowBytes)
          for (x <- 0 until w if px(x, y)._1 == 1)
            row(x / 8) = (row(x / 8) | (1 << (7 - x % 8))).toByte
          out.write(row)
        }
      case 5 =>
        for (y <- 0 until h; x <- 0 until w) out.write(px(x, y)._1)
      case _ =>
        for (y <- 0 until h; x <- 0 until w) {
          val (r, g, b) = px(x, y)
          out.write(r); out.write(g); out.write(b)
        }
    }
    out.toByteArray
  }
}
