package graft.multimodal

/** MPEG audio (MP1/MP2/MP3) FRAME-LEVEL parser implemented from the
  * public bitstream layout — ISO/IEC 11172-3 §2.4.1.3 (the 32-bit frame
  * header: 11 sync bits, version, layer, protection, bitrate index,
  * sampling-frequency index, padding, mode) and §2.4.2.3 (frame length
  * arithmetic), widened in round 10 to the full header matrix real
  * crawls contain: MPEG-2 (ISO/IEC 13818-3 — halved sampling rates and,
  * for Layer III, 576 samples per frame) and the de-facto MPEG-2.5
  * extension (version code 00, quarter rates), plus Layers I and II
  * (slot-based §2.4.2.3 sizing: Layer I frames are 4-byte slots,
  * 12·bitrate/rate slots per frame). Also handled: the de-facto-standard
  * ingest framing — ID3v2 prefix tags (id3.org — syncsafe 28-bit size),
  * ID3v1 trailer tags (128 bytes, "TAG"), and the Xing/Info VBR header
  * (Layer III convention; its offset depends on the version-dependent
  * side-info size).
  *
  * SCOPE — metadata, not PCM. This is the tier a 100 TB ingest needs
  * for cataloging, routing, deduplication keys, and duration/bitrate
  * audit of MPEG-audio assets: a strict whole-stream frame walk (every
  * frame header validated and mutually consistent; truncated or corrupt
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

  /** One validated frame: byte offset, header fields, and total size.
    * `verRaw` is the 2-bit version field (3 = MPEG-1, 2 = MPEG-2,
    * 0 = MPEG-2.5); `layerRaw` the 2-bit layer field (3 = Layer I,
    * 2 = Layer II, 1 = Layer III) — raw codes, exactly as in §2.4.1.3.
    */
  final case class Frame(
      offset: Int,
      verRaw: Int,
      layerRaw: Int,
      bitrateKbps: Int,
      sampleRate: Int,
      padding: Boolean,
      crc: Boolean,
      mode: Int,        // 0 stereo, 1 joint, 2 dual, 3 mono
      sizeBytes: Int)   // whole frame incl. the 4-byte header

  /** Stream-level summary: the catalog row shape. */
  final case class Info(
      frames: Seq[Frame],
      verRaw: Int,
      layerRaw: Int,
      sampleRate: Int,
      mode: Int,
      id3v2Bytes: Int,       // 0 if absent
      id3v1: Boolean,
      xingFrames: Option[Int]) { // from a Xing/Info header, if present
    def nFrames: Int = frames.length
    /** MPEG version × 10 (10 / 20 / 25) — integer-exact catalog form. */
    def versionX10: Int = verRaw match {
      case 3 => 10
      case 2 => 20
      case _ => 25
    }
    /** Logical layer number: 1 = Layer I, 2 = II, 3 = III. */
    def layer: Int = 4 - layerRaw
    def samplesPerFrame: Int = Mp3Codec.samplesPerFrame(verRaw, layerRaw)
    def nSamples: Long = frames.length.toLong * samplesPerFrame
    def durationMs: Long = nSamples * 1000 / sampleRate
    def vbr: Boolean = frames.map(_.bitrateKbps).distinct.length > 1
  }

  // §2.4.2.3 bitrate tables (kbps); index 0 = free format (rejected —
  // frame size would be undefined), 15 = forbidden. MPEG-1 has one
  // table per layer; MPEG-2/2.5 (13818-3) share one table for Layers
  // II+III and have their own Layer I table.
  private[multimodal] val BitratesV1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private[multimodal] val BitratesV1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private[multimodal] val BitratesV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private[multimodal] val BitratesV2L1 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private[multimodal] val BitratesV2L23 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private[multimodal] def bitrateTable(verRaw: Int, layerRaw: Int): Array[Int] =
    (verRaw, layerRaw) match {
      case (3, 3) => BitratesV1L1
      case (3, 2) => BitratesV1L2
      case (3, _) => BitratesV1L3
      case (_, 3) => BitratesV2L1
      case _      => BitratesV2L23
    }

  // sampling_frequency index tables: MPEG-1 §2.4.2.3; MPEG-2 halves,
  // MPEG-2.5 quarters. Index 3 reserved in all versions.
  private[multimodal] val SampleRatesV1 = Array(44100, 48000, 32000)
  private[multimodal] val SampleRatesV2 = Array(22050, 24000, 16000)
  private[multimodal] val SampleRatesV25 = Array(11025, 12000, 8000)

  private[multimodal] def sampleRateTable(verRaw: Int): Array[Int] =
    verRaw match {
      case 3 => SampleRatesV1
      case 2 => SampleRatesV2
      case _ => SampleRatesV25
    }

  /** Samples per frame (§2.4.2.3 / 13818-3): Layer I 384, Layer II 1152,
    * Layer III 1152 (MPEG-1) or 576 (MPEG-2/2.5).
    */
  private[multimodal] def samplesPerFrame(verRaw: Int, layerRaw: Int): Int =
    layerRaw match {
      case 3 => 384
      case 2 => 1152
      case _ => if (verRaw == 3) 1152 else 576
    }

  /** Frame size in bytes (§2.4.3.1 arithmetic, integer division):
    * Layer I counts 4-byte SLOTS — (12·bitrate/rate + padding)·4;
    * Layers II/III count bytes — spf/8·bitrate/rate + padding, i.e.
    * 144·bitrate/rate for 1152-sample frames and 72·bitrate/rate for
    * MPEG-2/2.5 Layer III's 576-sample frames.
    */
  private[multimodal] def frameSize(verRaw: Int, layerRaw: Int,
      bitrateKbps: Int, sampleRate: Int, padding: Boolean): Int =
    if (layerRaw == 3)
      (12000 * bitrateKbps / sampleRate + (if (padding) 1 else 0)) * 4
    else {
      val mul = if (samplesPerFrame(verRaw, layerRaw) == 1152) 144000 else 72000
      mul * bitrateKbps / sampleRate + (if (padding) 1 else 0)
    }

  /** Parse one frame header at `off`; None if the 4 bytes there are not
    * a valid MPEG audio header (any version 1/2/2.5, any layer I–III).
    */
  private def header(b: Array[Byte], off: Int): Option[Frame] = {
    if (off + 4 > b.length) return None
    val h = ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
    if ((h >>> 21) != 0x7FF) return None            // 11 sync bits
    val ver = (h >>> 19) & 3
    if (ver == 1) return None                       // reserved version
    val layer = (h >>> 17) & 3
    if (layer == 0) return None                     // reserved layer
    val crc = ((h >>> 16) & 1) == 0                 // protection_bit 0 = CRC
    val bi = (h >>> 12) & 0xF
    if (bi == 0 || bi == 15) return None            // free/forbidden
    val si = (h >>> 10) & 3
    if (si == 3) return None                        // reserved
    val pad = ((h >>> 9) & 1) == 1
    val mode = (h >>> 6) & 3
    val rate = sampleRateTable(ver)(si)
    val kbps = bitrateTable(ver, layer)(bi)
    Some(Frame(off, ver, layer, kbps, rate, pad, crc, mode,
      frameSize(ver, layer, kbps, rate, pad)))
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
    * A Layer III convention: the tag sits at the start of the first
    * frame's main-data area — header (4) + CRC (2 if present) + side
    * info (MPEG-1: 17 mono / 32 otherwise; MPEG-2/2.5: 9 / 17 — the
    * public layout every VBR-aware walker uses). Layers I/II carry no
    * side-info block, so the sniff only runs for Layer III.
    */
  private def xingFrames(b: Array[Byte], f: Frame): Option[Int] = {
    if (f.layerRaw != 1) return None
    val side =
      if (f.verRaw == 3) { if (f.mode == 3) 17 else 32 }
      else { if (f.mode == 3) 9 else 17 }
    val off = f.offset + 4 + (if (f.crc) 2 else 0) + side
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

  /** Back-to-back validated frames from `pre` to exactly `end`. Every
    * frame must parse AND agree with the first on version, layer,
    * sampling rate, and channel mode (§2.4.1.3 keeps these constant
    * within a stream; bitrate may vary — VBR); any gap, truncation, or
    * disagreement → Malformed.
    */
  private def walk(bytes: Array[Byte], pre: Int, end: Int): Seq[Frame] = {
    var off = pre
    val frames = Seq.newBuilder[Frame]
    var first: Frame = null
    var n = 0
    while (off < end) {
      val f = header(bytes, off).getOrElse(fail())
      if (first == null) first = f
      else if (f.verRaw != first.verRaw || f.layerRaw != first.layerRaw ||
          f.sampleRate != first.sampleRate || f.mode != first.mode)
        fail()
      if (off + f.sizeBytes > end) fail() // truncated final frame
      frames += f
      off += f.sizeBytes
      n += 1
      if (n > (1 << 22)) fail() // > ~4M frames: not a plausible asset
    }
    if (first == null) fail() // zero frames is not an mpeg-audio stream
    frames.result()
  }

  /** Strict whole-stream walk: optional ID3v2 prefix, then back-to-back
    * validated frames to the end (or to an ID3v1 trailer). Total on
    * arbitrary bytes. The ID3v1 sniff ('TAG' at end−128) is
    * probabilistic — a payload byte sequence can coincidentally spell it
    * — so a walk that fails AFTER trimming retries untrimmed before the
    * stream is rejected (ADVICE r9: the false-positive trim must not
    * reject a valid untagged stream).
    */
  def parse(bytes: Array[Byte]): Option[Info] =
    try {
      val pre = id3v2Len(bytes)
      val end = bytes.length
      val tagSniff = end - pre >= 128 && bytes(end - 128) == 'T' &&
        bytes(end - 127) == 'A' && bytes(end - 126) == 'G'
      val (frames, id3v1) =
        if (!tagSniff) (walk(bytes, pre, end), false)
        else {
          try (walk(bytes, pre, end - 128), true)
          catch {
            case _: Malformed | _: ArrayIndexOutOfBoundsException =>
              (walk(bytes, pre, end), false) // 'TAG' was frame payload
          }
        }
      val first = frames.head
      Some(Info(frames, first.verRaw, first.layerRaw, first.sampleRate,
        first.mode, pre, id3v1, xingFrames(bytes, first)))
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  // ------------------------------------------------------------- build

  /** Deterministic fixture builder: a syntactically valid MPEG audio
    * stream with the requested version/layer and per-frame bitrate
    * indices, whose payload bytes are a pure LCG function of
    * (seed, position) — valid FRAMING with engine-chosen main data, the
    * fixture shape the metadata tier is specified against (a frame
    * walker never inspects payload bytes: it jumps by the computed
    * frame size, §2.4.3.1). Optional ID3v2 prefix and ID3v1 trailer
    * exercise the tag skips. Defaults preserve the round-9 fixture
    * bytes exactly (MPEG-1 Layer III).
    */
  def build(bitrateIdx: Seq[Int], sampleRateIdx: Int, mode: Int, seed: Int,
      id3v2PayloadLen: Int = 0, id3v1: Boolean = false,
      paddingEvery: Int = 0, xing: Boolean = false,
      verRaw: Int = 3, layerRaw: Int = 1): Array[Byte] = {
    require(bitrateIdx.nonEmpty && bitrateIdx.forall(i => i >= 1 && i <= 14))
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2)
    require(verRaw == 3 || verRaw == 2 || verRaw == 0)
    require(layerRaw >= 1 && layerRaw <= 3)
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
      val kbps = bitrateTable(verRaw, layerRaw)(bi)
      val rate = sampleRateTable(verRaw)(sampleRateIdx)
      val size = frameSize(verRaw, layerRaw, kbps, rate, pad)
      val frame = new Array[Byte](size)
      // header: sync(11) + version + layer + protection 1 (no CRC)
      frame(0) = 0xFF.toByte
      frame(1) = (0xE0 | (verRaw << 3) | (layerRaw << 1) | 1).toByte
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
      if (xing && fi == 0 && layerRaw == 1) {
        // Xing VBR tag at the start of the main-data area: header (4,
        // no CRC here) + side info (MPEG-1: 17 mono / 32; v2/2.5: 9 / 17)
        val off = 4 + (if (verRaw == 3) { if (mode == 3) 17 else 32 }
                       else { if (mode == 3) 9 else 17 })
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
