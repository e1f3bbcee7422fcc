package graft.multimodal

/** Pure-JVM MJPEG-AVI demux — the one video container whose frames decode
  * without a native codec (each frame is a plain JPEG, which ImageIO
  * reads). Completes the real-multimodal set: images (ImageIO), audio
  * (RIFF PCM via [[WavCodec]]), video (RIFF AVI + JPEG frames here);
  * inter-frame codecs (H.264…) remain behind the documented fake.
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
  def synthesize(framePayloads: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit =
      (0 until 4).foreach(b => bos.write((v >> (8 * b)) & 0xFF))
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val moviPayload = 4 + framePayloads.map(f => 8 + f.length + (f.length & 1)).sum
    cc("RIFF"); w32(4 + 8 + moviPayload); cc("AVI ")
    cc("LIST"); w32(moviPayload); cc("movi")
    framePayloads.foreach { f =>
      cc("00dc"); w32(f.length); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }
}
