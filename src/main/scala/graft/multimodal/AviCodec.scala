package graft.multimodal

/** Pure-JVM RIFF-AVI demux. Two codecs decode without a native library:
  * MJPEG (each frame is a plain JPEG, which ImageIO reads) and ZMBV
  * (inter-frame, via [[ZmbvCodec]]). Completes the real-multimodal set:
  * images (ImageIO), audio (RIFF PCM via [[WavCodec]], FLAC via
  * [[FlacCodec]]), video here; non-AVI containers and codecs (H.264 in
  * mp4…) remain behind the documented fake.
  */
object AviCodec {

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Extract compressed video frame payloads (`..dc`/`..db` chunks inside
    * the `movi` LIST) from a RIFF AVI container. Returns None unless the
    * RIFF/AVI signature matches; empty-frame AVIs yield Some(Nil).
    */
  def frames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = fourcc(bytes, pos)
        val len = le32(bytes, pos + 4)
        // Compare in Long: a crafted length near 2^31 would wrap the Int
        // sum negative and slip past the bound (decoders must be TOTAL).
        if (len < 0 || pos.toLong + 8 + len > until) return
        if (id == "LIST") {
          // LIST payload starts with its own 4-byte type (movi, hdrl, …)
          walk(pos + 12, pos + 8 + len)
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          out += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
    }

    walk(12, bytes.length)
    Some(out.toSeq)
  }

  /** Test/ingest helper: wrap pre-encoded frame payloads (JPEGs for
    * MJPEG) into a minimal RIFF AVI with a bare `movi` LIST — enough
    * structure for [[frames]] and for players that scan `movi`.
    */
  def synthesize(framePayloads: Seq[Array[Byte]]): Array[Byte] =
    synthesize(framePayloads, handler = null, width = 0, height = 0)

  /** Full variant: also writes the standard `hdrl` LIST (`avih` + one
    * `vids` stream's `strh`/`strf`) carrying the codec fourcc and the
    * frame dimensions — which codecs like ZMBV need from the container
    * (their frame payloads carry no size). `handler = null` keeps the
    * original header-less shape.
    */
  def synthesize(framePayloads: Seq[Array[Byte]], handler: String,
      width: Int, height: Int): Array[Byte] =
    synthesize(framePayloads, handler, width, height, palette = null)

  /** Palette variant: an RGB palette (768 bytes, r g b per entry) is
    * written into `strf` after the BITMAPINFOHEADER as the standard
    * 256-entry RGBQUAD color table (stored b, g, r, 0 — BMP order), with
    * biBitCount = 8 and biClrUsed = 256 — the layout BI_RLE8 (MS-RLE)
    * players read the palette from.
    */
  def synthesize(framePayloads: Seq[Array[Byte]], handler: String,
      width: Int, height: Int, palette: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit =
      (0 until 4).foreach(b => bos.write((v >> (8 * b)) & 0xFF))
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val strfLen = 40 + (if (palette == null) 0 else 1024)
    val hdrlPayload = if (handler == null) 0 else {
      4 + (8 + 56) + // avih
        (8 + 4 + (8 + 56) + (8 + strfLen)) // LIST strl { strh, strf }
    }
    val moviPayload = 4 + framePayloads.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlChunk = if (hdrlPayload == 0) 0 else 8 + hdrlPayload
    cc("RIFF"); w32(4 + hdrlChunk + 8 + moviPayload); cc("AVI ")
    if (handler != null) {
      cc("LIST"); w32(hdrlPayload); cc("hdrl")
      cc("avih"); w32(56)
      w32(40000) // usec/frame (25 fps — informational)
      w32(0); w32(0); w32(0)
      w32(framePayloads.length) // dwTotalFrames
      w32(0); w32(1) // dwInitialFrames, dwStreams
      w32(0)
      w32(width); w32(height)
      (0 until 4).foreach(_ => w32(0)) // reserved
      cc("LIST"); w32(4 + (8 + 56) + (8 + strfLen)); cc("strl")
      cc("strh"); w32(56)
      cc("vids"); cc(handler)
      w32(0); w32(0); w32(0) // flags, prio+lang, initial frames
      w32(1); w32(25) // scale, rate → 25 fps
      w32(0); w32(framePayloads.length) // start, length
      w32(0); w32(0); w32(0) // bufsize, quality, sample size
      w32(0); w32((height << 16) | width) // rcFrame (informational)
      cc("strf"); w32(strfLen) // BITMAPINFOHEADER [+ color table]
      w32(40); w32(width); w32(height)
      if (palette == null) {
        w32(1 << 16) // planes=1, bitcount=0 (codec-defined)
        cc(handler) // biCompression
        w32(0); w32(0); w32(0); w32(0); w32(0)
      } else {
        w32((8 << 16) | 1) // planes=1, bitcount=8
        cc(handler) // biCompression
        w32(0); w32(0); w32(0)
        w32(256); w32(0) // biClrUsed, biClrImportant
        for (j <- 0 until 256) { // RGBQUAD: b, g, r, reserved
          bos.write(palette(3 * j + 2) & 0xFF)
          bos.write(palette(3 * j + 1) & 0xFF)
          bos.write(palette(3 * j) & 0xFF)
          bos.write(0)
        }
      }
    }
    cc("LIST"); w32(moviPayload); cc("movi")
    framePayloads.foreach { f =>
      cc("00dc"); w32(f.length); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  /** Video stream info from the `hdrl` LIST: (handler fourcc from the
    * first `vids` `strh`, width, height from `avih`). None when the
    * container is not AVI or carries no header (e.g. the minimal MJPEG
    * fixtures, whose frames are self-describing JPEGs).
    */
  def videoInfo(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
    var dims: Option[(Int, Int)] = None
    var handler: Option[String] = None

    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = fourcc(bytes, pos)
        val len = le32(bytes, pos + 4)
        if (len < 0 || pos.toLong + 8 + len > until) return
        if (id == "LIST") walk(pos + 12, pos + 8 + len)
        else if (id == "avih" && len >= 40)
          dims = Some((le32(bytes, pos + 8 + 32), le32(bytes, pos + 8 + 36)))
        else if (id == "strh" && len >= 8 && fourcc(bytes, pos + 8) == "vids" &&
                 handler.isEmpty)
          handler = Some(fourcc(bytes, pos + 12))
        pos += 8 + len + (len & 1)
      }
    }

    walk(12, bytes.length)
    for { (w, h) <- dims; fcc <- handler } yield (fcc, w, h)
  }

  /** 8-bit palette from the video stream's `strf` color table: 768 bytes
    * (r, g, b per entry), converted back from the stored RGBQUAD (b, g,
    * r, 0) layout. None when the header carries no 256-entry table.
    */
  def palette8(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
    var pal: Option[Array[Byte]] = None

    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = fourcc(bytes, pos)
        val len = le32(bytes, pos + 4)
        if (len < 0 || pos.toLong + 8 + len > until) return
        if (id == "LIST") walk(pos + 12, pos + 8 + len)
        else if (id == "strf" && len >= 40 + 1024 && pal.isEmpty &&
            le32(bytes, pos + 8 + 32) == 256) { // biClrUsed
          val out = new Array[Byte](768)
          for (j <- 0 until 256) {
            out(3 * j) = bytes(pos + 8 + 40 + 4 * j + 2)     // r
            out(3 * j + 1) = bytes(pos + 8 + 40 + 4 * j + 1) // g
            out(3 * j + 2) = bytes(pos + 8 + 40 + 4 * j)     // b
          }
          pal = Some(out)
        }
        pos += 8 + len + (len & 1)
      }
    }

    walk(12, bytes.length)
    pal
  }
}
