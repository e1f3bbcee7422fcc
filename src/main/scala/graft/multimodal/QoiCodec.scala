package graft.multimodal

/** Pure-JVM QOI ("Quite OK Image") codec, written from the public
  * one-page spec (qoiformat.org): 14-byte header (magic `qoif`, BE dims,
  * channels, colorspace), then a byte stream of
  *
  *   QOI_OP_RGB 0xFE / QOI_OP_RGBA 0xFF  — literal pixels
  *   QOI_OP_INDEX 00xxxxxx               — 64-entry hash table recall
  *                                         (hash = (3r+5g+7b+11a) mod 64)
  *   QOI_OP_DIFF  01drdgdb               — per-channel deltas in [−2, 1]
  *   QOI_OP_LUMA  10dddddd + drdg|dbdg   — green delta in [−32, 31],
  *                                         red/blue deltas vs green in [−8, 7]
  *   QOI_OP_RUN   11xxxxxx               — repeat previous pixel 1..62×
  *
  * with byte-wraparound difference arithmetic and an 8-byte end marker.
  * Lossless, so decoded fixtures replay in closed form under the DuckDB
  * hash gate (`q_qoi_scan`) — the image tier's first from-spec codec in
  * the engine itself (PNG/JPEG/BMP decode via ImageIO, a library).
  * Decoder TOTAL on arbitrary bytes; encoder deterministic greedy
  * (run → index → diff → luma → literal, the reference encoder's order).
  */
object QoiCodec {

  /** Decoded image: RGBA per pixel, row-major. */
  final case class Qoi(width: Int, height: Int, channels: Int,
      r: Array[Byte], g: Array[Byte], b: Array[Byte], a: Array[Byte])

  private def be32(x: Array[Byte], o: Int): Int =
    ((x(o) & 0xFF) << 24) | ((x(o + 1) & 0xFF) << 16) |
      ((x(o + 2) & 0xFF) << 8) | (x(o + 3) & 0xFF)

  def decode(bytes: Array[Byte]): Option[Qoi] = {
    if (bytes.length < 14 + 8) return None
    if (!(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' &&
        bytes(3) == 'f')) return None
    val w = be32(bytes, 4)
    val h = be32(bytes, 8)
    val channels = bytes(12) & 0xFF
    if (w <= 0 || h <= 0 || (channels != 3 && channels != 4)) return None
    val n = w.toLong * h
    if (n > 64000000L) return None // sanity bound: decoders must be TOTAL
    val rA = new Array[Byte](n.toInt); val gA = new Array[Byte](n.toInt)
    val bA = new Array[Byte](n.toInt); val aA = new Array[Byte](n.toInt)
    val idx = new Array[Int](64) // packed RGBA, init 0 per spec
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var pos = 14
    var i = 0
    val end = bytes.length - 8 // chunks stop before the end marker
    while (i < n && pos < end) {
      val b1 = bytes(pos) & 0xFF
      if (b1 == 0xFE) { // RGB
        if (pos + 4 > end) return None
        pr = bytes(pos + 1) & 0xFF; pg = bytes(pos + 2) & 0xFF
        pb = bytes(pos + 3) & 0xFF
        pos += 4
      } else if (b1 == 0xFF) { // RGBA
        if (pos + 5 > end) return None
        pr = bytes(pos + 1) & 0xFF; pg = bytes(pos + 2) & 0xFF
        pb = bytes(pos + 3) & 0xFF; pa = bytes(pos + 4) & 0xFF
        pos += 5
      } else (b1 >> 6) match {
        case 0 => // INDEX
          val v = idx(b1 & 63)
          pr = (v >>> 24) & 0xFF; pg = (v >>> 16) & 0xFF
          pb = (v >>> 8) & 0xFF; pa = v & 0xFF
          pos += 1
        case 1 => // DIFF
          pr = (pr + ((b1 >> 4) & 3) - 2) & 0xFF
          pg = (pg + ((b1 >> 2) & 3) - 2) & 0xFF
          pb = (pb + (b1 & 3) - 2) & 0xFF
          pos += 1
        case 2 => // LUMA
          if (pos + 2 > end) return None
          val b2 = bytes(pos + 1) & 0xFF
          val dg = (b1 & 63) - 32
          pr = (pr + dg + ((b2 >> 4) & 15) - 8) & 0xFF
          pg = (pg + dg) & 0xFF
          pb = (pb + dg + (b2 & 15) - 8) & 0xFF
          pos += 2
        case _ => // RUN of the previous pixel (1..62)
          val run = (b1 & 63) + 1
          if (i + run > n) return None
          var k = 0
          while (k < run - 1) { // run repeats prev; last copy falls through
            rA(i) = pr.toByte; gA(i) = pg.toByte
            bA(i) = pb.toByte; aA(i) = pa.toByte
            i += 1; k += 1
          }
          pos += 1
      }
      rA(i) = pr.toByte; gA(i) = pg.toByte; bA(i) = pb.toByte
      aA(i) = pa.toByte
      idx((pr * 3 + pg * 5 + pb * 7 + pa * 11) % 64) =
        (pr << 24) | (pg << 16) | (pb << 8) | pa
      i += 1
    }
    if (i != n) None
    else Some(Qoi(w, h, channels, rA, gA, bA, aA))
  }

  /** To the engine's packed-RGB image shape (alpha dropped, like
    * [[graft.images.ImageOps.decode]] masks ARGB).
    */
  def toImage(q: Qoi): graft.images.ImageOps.Image =
    graft.images.ImageOps.Image(q.width, q.height,
      Array.tabulate(q.width * q.height)(i =>
        ((q.r(i) & 0xFF) << 16) | ((q.g(i) & 0xFF) << 8) | (q.b(i) & 0xFF)))

  /** Deterministic greedy encoder over packed-RGB pixels (alpha 255,
    * channels 3): run → index → diff → luma → literal, the reference
    * implementation's precedence. Byte-wraparound difference tests per
    * the spec.
    */
  def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == width * height, "bad pixel count")
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be(v: Int): Unit =
      (3 to 0 by -1).foreach(s => out.write((v >> (8 * s)) & 0xFF))
    be(width); be(height); out.write(3); out.write(0)
    val idx = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0
    val pa = 255 // spec prev starts (0, 0, 0, 255)
    var run = 0
    def sdelta(cur: Int, prev: Int): Int = {
      val d = (cur - prev) & 0xFF
      if (d > 127) d - 256 else d
    }
    var i = 0
    while (i < rgb.length) {
      val r = (rgb(i) >> 16) & 0xFF
      val g = (rgb(i) >> 8) & 0xFF
      val b = rgb(i) & 0xFF
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xC0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xC0 | (run - 1)); run = 0 }
        val h = (r * 3 + g * 5 + b * 7 + pa * 11) % 64
        val packed = (r << 24) | (g << 16) | (b << 8) | pa
        if (idx(h) == packed) out.write(h)
        else {
          idx(h) = packed
          val dr = sdelta(r, pr); val dg = sdelta(g, pg); val db = sdelta(b, pb)
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else {
            val drg = dr - dg; val dbg = db - dg
            if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                dbg >= -8 && dbg <= 7) {
              out.write(0x80 | (dg + 32)); out.write(((drg + 8) << 4) | (dbg + 8))
            } else {
              out.write(0xFE); out.write(r); out.write(g); out.write(b)
            }
          }
        }
        pr = r; pg = g; pb = b
      }
      i += 1
    }
    if (run > 0) out.write(0xC0 | (run - 1))
    (0 until 7).foreach(_ => out.write(0))
    out.write(1)
    out.toByteArray
  }
}
