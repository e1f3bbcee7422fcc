package graft.multimodal

/** Pure-JVM Microsoft RLE8 video codec (BI_RLE8 — the `MRLE` AVI codec),
  * written from the public BMP/AVI compression spec:
  *
  *   - encoded run:  `count index` (count ≥ 1) — count pixels of index
  *   - escapes (`0x00 code`): 0 = end of line, 1 = end of bitmap,
  *     2 = delta (`dx dy` unsigned — skip right/up without painting),
  *     n ≥ 3 = absolute mode (n literal indices, padded to a word)
  *   - rows run BOTTOM-UP (BMP coordinate space), pixels the delta/EOL
  *     escapes skip keep their PREVIOUS frame's value — so MS-RLE is a
  *     genuine inter-frame codec: a frame that only paints a moving
  *     block depends on the whole history before it.
  *
  * Lossless palette video, so decoded fixtures are exactly replayable in
  * closed form by the DuckDB oracle (`q_msrle_scan`). The decoder is
  * TOTAL on arbitrary payloads (None, never throws); the deterministic
  * encoder emits full-coverage keyframes and delta-skipped inter frames
  * (runs + both escape kinds), splitting runs/deltas at the format's
  * 255 bound.
  *
  * The reference decodes no video at all (pyspark_yolox.py:67 reads
  * still JPEGs) — this extends the north-star multimodal surface, next
  * to [[ZmbvCodec]] (motion compensation + zlib) with the OTHER classic
  * inter-frame mechanism: skip-based conditional replenishment.
  */
object MsRleCodec {

  /** One decoded frame: palette indices in TOP-DOWN row order plus the
    * clip palette (r, g, b per entry) — same access shape as
    * [[ZmbvCodec.Frame]].
    */
  final case class Frame(width: Int, height: Int,
      pixels: Array[Byte], palette: Array[Byte]) {
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val i = (pixels(y * width + x) & 0xFF) * 3
      ((palette(i) & 0xFF), (palette(i + 1) & 0xFF), (palette(i + 2) & 0xFF))
    }
  }

  final case class Video(width: Int, height: Int, frames: Seq[Frame])

  /** Decode a payload sequence against a shared palette. The canvas
    * persists across frames (conditional replenishment); it starts as
    * index 0, which every keyframe fully overwrites.
    */
  def decode(width: Int, height: Int, palette: Array[Byte],
      payloads: Seq[Array[Byte]]): Option[Video] = {
    if (width <= 0 || height <= 0 || palette.length < 768) return None
    val canvas = new Array[Byte](width * height)
    val frames = Seq.newBuilder[Frame]
    for (p <- payloads) {
      if (!decodeFrame(width, height, p, canvas)) return None
      frames += Frame(width, height, canvas.clone(), palette)
    }
    Some(Video(width, height, frames.result()))
  }

  /** One frame into the persistent canvas; false on malformed data. */
  private def decodeFrame(width: Int, height: Int, p: Array[Byte],
      canvas: Array[Byte]): Boolean = {
    var pos = 0
    var x = 0
    var yUp = 0 // BMP bottom-up row
    def paint(idx: Byte, n: Int): Boolean = {
      if (yUp >= height || x + n > width) return false
      val row = (height - 1 - yUp) * width
      java.util.Arrays.fill(canvas, row + x, row + x + n, idx)
      x += n
      true
    }
    while (pos + 2 <= p.length) {
      val count = p(pos) & 0xFF
      val b2 = p(pos + 1) & 0xFF
      pos += 2
      if (count > 0) {
        if (!paint(b2.toByte, count)) return false
      } else b2 match {
        case 0 => x = 0; yUp += 1 // end of line
        case 1 => return true // end of bitmap
        case 2 =>
          if (pos + 2 > p.length) return false
          x += p(pos) & 0xFF
          yUp += p(pos + 1) & 0xFF
          pos += 2
          if (x > width || yUp > height) return false
        case n => // absolute mode: n literal indices, word-aligned
          if (pos + n > p.length || yUp >= height || x + n > width)
            return false
          val row = (height - 1 - yUp) * width
          var k = 0
          while (k < n) { canvas(row + x + k) = p(pos + k); k += 1 }
          x += n
          pos += n + (n & 1)
      }
    }
    false // ran off the payload without an end-of-bitmap escape
  }

  /** Deterministic encoder: frame 0 and every `keyEvery`-th frame are
    * full-coverage keyframes (row runs, bottom-up, EOL per row, EOI at
    * the end); other frames paint only pixels that CHANGED vs the
    * previous frame, skipping unchanged spans with delta escapes and
    * unchanged row suffixes/whole rows with EOLs — the format's
    * conditional-replenishment idiom. Runs and deltas split at 255.
    * `frames` are palette-index arrays in top-down order.
    */
  def encodePayloads(width: Int, height: Int, frames: Seq[Array[Byte]],
      keyEvery: Int = 4): Seq[Array[Byte]] = {
    require(frames.forall(_.length == width * height), "bad frame size")
    var prev: Array[Byte] = null
    frames.zipWithIndex.map { case (f, i) =>
      val key = prev == null || (keyEvery > 0 && i % keyEvery == 0)
      val out = new java.io.ByteArrayOutputStream()
      var yUp = 0
      while (yUp < height) {
        val row = (height - 1 - yUp) * width
        var x = 0
        var cursorX = 0 // decoder cursor within this row (after EOL/deltas)
        while (x < width) {
          if (!key && f(row + x) == prev(row + x)) x += 1 // skip unchanged
          else {
            // delta-skip the gap (multiples of 255 then the remainder)
            var gap = x - cursorX
            while (gap > 0) {
              val d = math.min(gap, 255)
              out.write(0); out.write(2); out.write(d); out.write(0)
              gap -= d
            }
            // emit the changed span as runs (split at 255)
            var end = x
            while (end < width &&
                (key || f(row + end) != prev(row + end))) end += 1
            while (x < end) {
              var runEnd = x + 1
              while (runEnd < end && f(row + runEnd) == f(row + x)) runEnd += 1
              var n = runEnd - x
              while (n > 0) {
                val c = math.min(n, 255)
                out.write(c); out.write(f(row + x) & 0xFF)
                n -= c
              }
              x = runEnd
            }
            cursorX = x
          }
        }
        yUp += 1
        if (yUp < height) { out.write(0); out.write(0) } // EOL
      }
      out.write(0); out.write(1) // end of bitmap
      prev = f.clone()
      out.toByteArray
    }
  }

  /** Full-container encode: payloads + `hdrl` (fourcc `MRLE`, dims) +
    * the 256-entry palette in `strf` — via [[AviCodec.synthesize]].
    */
  def encodeAvi(width: Int, height: Int, palette: Array[Byte],
      frames: Seq[Array[Byte]], keyEvery: Int = 4): Array[Byte] =
    AviCodec.synthesize(encodePayloads(width, height, frames, keyEvery),
      "MRLE", width, height, palette)
}
