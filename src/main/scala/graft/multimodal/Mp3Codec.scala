package graft.multimodal

/** MP3 (MPEG-1 Audio Layer III) FRAME-LEVEL parser implemented from the
  * public bitstream layout — ISO/IEC 11172-3 §2.4.1.3 (the 32-bit frame
  * header: 11 sync bits, version, layer, protection, bitrate index,
  * sampling-frequency index, padding, mode) and §2.4.2.3 (frame length
  * arithmetic: 144 · bitrate / sampling_rate + padding bytes for Layer
  * III), plus the de-facto-standard ingest framing around it: ID3v2
  * prefix tags (id3.org — syncsafe 28-bit size), ID3v1 trailer tags
  * (128 bytes, "TAG"), and the Xing/Info VBR header (frame count at the
  * start of the first frame's main-data area).
  *
  * SCOPE — metadata, not PCM. This is the tier a 100 TB ingest needs
  * for cataloging, routing, deduplication keys, and duration/bitrate
  * audit of mp3 assets: a strict whole-stream frame walk (every frame
  * header validated and mutually consistent; truncated or corrupt
  * streams → None — TOTAL like every codec here). Full PCM decode
  * remains the documented stand-in behind [[Multimodal.MediaDecoder]]:
  * the spec's NORMATIVE data tables (Annex B.7 Huffman code tables,
  * Table B.3's 512-entry synthesis window) are not reproducible in this
  * offline environment and the container ships no reference decoder to
  * differentiate a transcription against — a decoder verified only
  * against its own fixtures would be a closed loop, not MP3 support.
  * The boundary is deliberate and documented (ROUND9.md); everything on
  * THIS side of it is exactly verifiable and hash-gated (`q_mp3_scan`).
  */
object Mp3Codec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  /** One validated frame: byte offset, header fields, and total size. */
  final case class Frame(
      offset: Int,
      bitrateKbps: Int,
      sampleRate: Int,
      padding: Boolean,
      crc: Boolean,
      mode: Int,        // 0 stereo, 1 joint, 2 dual, 3 mono
      sizeBytes: Int)   // whole frame incl. the 4-byte header

  /** Stream-level summary: the catalog row shape. */
  final case class Info(
      frames: Seq[Frame],
      sampleRate: Int,
      mode: Int,
      id3v2Bytes: Int,       // 0 if absent
      id3v1: Boolean,
      xingFrames: Option[Int]) { // from a Xing/Info header, if present
    def nFrames: Int = frames.length
    /** 1152 samples per MPEG-1 Layer III frame (§2.4.2.3). */
    def nSamples: Long = frames.length.toLong * 1152
    def durationMs: Long = nSamples * 1000 / sampleRate
    def vbr: Boolean = frames.map(_.bitrateKbps).distinct.length > 1
  }

  // §2.4.2.3 Layer III / MPEG-1 bitrate table (kbps); index 0 = free
  // format (rejected — frame size would be undefined), 15 = forbidden.
  private[multimodal] val Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  // §2.4.2.3 sampling_frequency index for MPEG-1; index 3 reserved.
  private[multimodal] val SampleRates = Array(44100, 48000, 32000)

  /** Layer III MPEG-1 frame size in bytes (§2.4.3.1 figure of merit:
    * 144 · bitrate / sampling_frequency, +1 when the padding bit is set).
    */
  private[multimodal] def frameSize(bitrateKbps: Int, sampleRate: Int,
      padding: Boolean): Int =
    144000 * bitrateKbps / sampleRate + (if (padding) 1 else 0)

  /** Parse one frame header at `off`; None if the 4 bytes there are not
    * a valid MPEG-1 Layer III header.
    */
  private def header(b: Array[Byte], off: Int): Option[Frame] = {
    if (off + 4 > b.length) return None
    val h = ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
    if ((h >>> 21) != 0x7FF) return None            // 11 sync bits
    if (((h >>> 19) & 3) != 3) return None          // version: MPEG-1 only
    if (((h >>> 17) & 3) != 1) return None          // layer: III (01)
    val crc = ((h >>> 16) & 1) == 0                 // protection_bit 0 = CRC
    val bi = (h >>> 12) & 0xF
    if (bi == 0 || bi == 15) return None            // free/forbidden
    val si = (h >>> 10) & 3
    if (si == 3) return None                        // reserved
    val pad = ((h >>> 9) & 1) == 1
    val mode = (h >>> 6) & 3
    val rate = SampleRates(si)
    val kbps = Bitrates(bi)
    Some(Frame(off, kbps, rate, pad, crc, mode, frameSize(kbps, rate, pad)))
  }

  /** ID3v2 prefix length (header + syncsafe size + optional footer), or
    * 0 when no tag is present. Malformed tags fail the stream.
    */
  private def id3v2Len(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    // four syncsafe bytes, high bit of each must be clear (id3v2 §3.1)
    val ss = (6 to 9).map(i => b(i) & 0xFF)
    if (ss.exists(_ >= 0x80)) fail()
    val size = (ss(0) << 21) | (ss(1) << 14) | (ss(2) << 7) | ss(3)
    val footer = if ((b(5) & 0x10) != 0) 10 else 0
    val total = 10 + size + footer
    if (total > b.length) fail()
    total
  }

  /** Xing/Info VBR header frame count, if the FIRST frame carries one.
    * The tag sits at the start of the first frame's main-data area:
    * header (4) + CRC (2 if present) + side info (17 mono / 32 otherwise)
    * — the public layout every VBR-aware walker uses.
    */
  private def xingFrames(b: Array[Byte], f: Frame): Option[Int] = {
    val off = f.offset + 4 + (if (f.crc) 2 else 0) +
      (if (f.mode == 3) 17 else 32)
    if (off + 8 > b.length) return None
    val tag = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag != "Xing" && tag != "Info") return None
    val flags = ((b(off + 4) & 0xFF) << 24) | ((b(off + 5) & 0xFF) << 16) |
      ((b(off + 6) & 0xFF) << 8) | (b(off + 7) & 0xFF)
    if ((flags & 1) == 0) return None // frames field absent
    if (off + 12 > b.length) return None
    Some(((b(off + 8) & 0xFF) << 24) | ((b(off + 9) & 0xFF) << 16) |
      ((b(off + 10) & 0xFF) << 8) | (b(off + 11) & 0xFF))
  }

  /** Strict whole-stream walk: optional ID3v2 prefix, then back-to-back
    * validated frames to the end (or to an ID3v1 trailer). Every frame
    * must parse AND agree with the first on sampling rate and channel
    * mode (§2.4.1.3 keeps these constant within a stream); any gap,
    * truncation, or disagreement → None. Total on arbitrary bytes.
    */
  def parse(bytes: Array[Byte]): Option[Info] =
    try {
      val pre = id3v2Len(bytes)
      var end = bytes.length
      val id3v1 = end - pre >= 128 && bytes(end - 128) == 'T' &&
        bytes(end - 127) == 'A' && bytes(end - 126) == 'G'
      if (id3v1) end -= 128
      var off = pre
      val frames = Seq.newBuilder[Frame]
      var first: Frame = null
      var n = 0
      while (off < end) {
        val f = header(bytes, off).getOrElse(fail())
        if (first == null) first = f
        else if (f.sampleRate != first.sampleRate || f.mode != first.mode)
          fail()
        if (off + f.sizeBytes > end) fail() // truncated final frame
        frames += f
        off += f.sizeBytes
        n += 1
        if (n > (1 << 22)) fail() // > ~4M frames: not a plausible asset
      }
      if (first == null) fail() // zero frames is not an mp3
      val fs = frames.result()
      Some(Info(fs, first.sampleRate, first.mode, pre, id3v1,
        xingFrames(bytes, first)))
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  // ------------------------------------------------------------- build

  /** Deterministic fixture builder: a syntactically valid MPEG-1 Layer
    * III stream with the requested per-frame bitrate indices, whose
    * payload bytes are a pure LCG function of (seed, position) — valid
    * FRAMING with engine-chosen main data, the fixture shape the
    * metadata tier is specified against (a frame walker never inspects
    * payload bytes: it jumps by the computed frame size, §2.4.3.1).
    * Optional ID3v2 prefix and ID3v1 trailer exercise the tag skips.
    */
  def build(bitrateIdx: Seq[Int], sampleRateIdx: Int, mode: Int, seed: Int,
      id3v2PayloadLen: Int = 0, id3v1: Boolean = false,
      paddingEvery: Int = 0, xing: Boolean = false): Array[Byte] = {
    require(bitrateIdx.nonEmpty && bitrateIdx.forall(i => i >= 1 && i <= 14))
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2)
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2PayloadLen > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((id3v2PayloadLen >> 21) & 0x7F)
      out.write((id3v2PayloadLen >> 14) & 0x7F)
      out.write((id3v2PayloadLen >> 7) & 0x7F)
      out.write(id3v2PayloadLen & 0x7F)
      var k = 0
      while (k < id3v2PayloadLen) { out.write((seed * 31 + k * 7) & 0x7F); k += 1 }
    }
    var state = seed * 2654435761L + 1
    def nextByte(): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) & 0xFF).toInt
    }
    bitrateIdx.zipWithIndex.foreach { case (bi, fi) =>
      val pad = paddingEvery > 0 && fi % paddingEvery == 0
      val kbps = Bitrates(bi)
      val rate = SampleRates(sampleRateIdx)
      val size = frameSize(kbps, rate, pad)
      val frame = new Array[Byte](size)
      // header: sync(11) version 11 layer 01 protection 1 (no CRC)
      frame(0) = 0xFF.toByte
      frame(1) = 0xFB.toByte // 1111_1011: vers 11, layer 01, no CRC
      frame(2) = ((bi << 4) | (sampleRateIdx << 2) | (if (pad) 2 else 0)).toByte
      frame(3) = (mode << 6).toByte
      var k = 4
      while (k < size) {
        // LCG payload masked to 7 bits: a payload byte can never start
        // an 0xFFE sync pattern (nor spell TAG/Xing by anything but the
        // astronomically unlikely, fixture-verified accident)
        frame(k) = (nextByte() & 0x7F).toByte
        k += 1
      }
      if (xing && fi == 0) {
        // Xing VBR tag at the start of the main-data area: header (4,
        // no CRC here) + side info (17 mono / 32 otherwise)
        val off = 4 + (if (mode == 3) 17 else 32)
        val n = bitrateIdx.length
        val tag = Array[Byte]('X', 'i', 'n', 'g', 0, 0, 0, 1, // flags: frames
          (n >> 24).toByte, (n >> 16).toByte, (n >> 8).toByte, n.toByte)
        System.arraycopy(tag, 0, frame, off, tag.length)
      }
      out.write(frame)
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      var k = 0
      while (k < 125) { out.write((seed * 13 + k * 3) & 0x7F); k += 1 }
    }
    out.toByteArray
  }
}
