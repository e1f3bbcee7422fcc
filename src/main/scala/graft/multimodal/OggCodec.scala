package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM Ogg container demux + a deterministic muxer, implemented from
  * the PUBLIC specifications — RFC 3533 (the Ogg encapsulation format:
  * page capture pattern, lacing-value packet segmentation, page CRC) and
  * the Xiph "FLAC-to-Ogg mapping" (first packet `0x7F FLAC` + version +
  * header count + the native `fLaC` signature + STREAMINFO; one FLAC
  * frame per audio packet). No external library, no code taken from any
  * demuxer.
  *
  * This closes the Ogg half of the "non-AVI/MP4 container" seam the same
  * way [[Mp4Codec]] closed ISO-BMFF: an `.ogg` FLAC stream rebuilds the
  * native FLAC byte stream (signature + metadata blocks + concatenated
  * audio packets) and decodes through [[FlacCodec]] — lossless, so
  * `q_ogg_scan` puts the whole chain (page walk → CRC check → packet
  * reassembly → FLAC decode) under the closed-form hash oracle. Vorbis /
  * Opus payloads (perceptual codecs needing native DSP in practice) stay
  * behind the documented fake+strict seam even when carried in Ogg.
  *
  * Demux coverage: packets spanning pages (continued-packet flag +
  * lacing-255 continuation), packets that are an exact multiple of 255
  * bytes (trailing 0 lacing), multi-packet pages, BOS/EOS flags, page
  * sequence continuity, and the Ogg CRC-32 (poly 0x04C11DB7, init 0, no
  * reflection, no final xor — RFC 3533 §6) verified on every page.
  * Everything is bounds-checked against the actual buffer — the demuxer
  * is TOTAL on arbitrary bytes, the same contract as the other codecs in
  * this package.
  *
  * Muxer subset (fixture/production-write tier): single logical
  * bitstream, BOS page carrying exactly the FLAC mapping packet, audio
  * packets packed greedily (page flushed at 255 lacing values or ~16 KiB
  * of data, packets split across pages when needed), EOS on the last
  * page — every byte a pure function of the input, so fixture trees are
  * pinnable by `read_blob` byte identity like the FLAC/ZMBV/MP4 trees.
  */
object OggCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  /** Ogg CRC-32: polynomial 0x04C11DB7, initial value 0, MSB-first (no
    * bit reflection), no final xor — RFC 3533 §6. Computed over the whole
    * page with the 4 checksum bytes zeroed.
    */
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def crcByte(c: Int, v: Int): Int =
    (c << 8) ^ crcTable(((c >>> 24) ^ (v & 0xFF)) & 0xFF)

  private[multimodal] def crc32(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crcByte(c, b(i)); i += 1 }
    c
  }

  /** Page CRC without mutating the buffer: the stored checksum bytes at
    * [crcAt, crcAt+4) are treated as zero, per RFC 3533 §6.
    */
  private def pageCrc(b: Array[Byte], from: Int, crcAt: Int, until: Int): Int = {
    var c = crc32(b, from, crcAt)
    var i = 0
    while (i < 4) { c = crcByte(c, 0); i += 1 }
    var j = crcAt + 4
    while (j < until) { c = crcByte(c, b(j)); j += 1 }
    c
  }

  /** One demuxed page, segment data still packed. */
  private final case class Page(headerType: Int, granule: Long, serial: Int,
      seq: Int, lacing: Array[Int], dataStart: Int, dataEnd: Int)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    (le32(b, o) & 0xFFFFFFFFL) | ((le32(b, o + 4) & 0xFFFFFFFFL) << 32)

  /** Walk and CRC-verify every page. Strict: the buffer must be exactly a
    * well-formed single-bitstream Ogg stream (this engine's storage tier
    * treats a corrupt container as a reject, not a salvage).
    */
  private def pagesOrThrow(b: Array[Byte]): Seq[Page] = {
    val out = Seq.newBuilder[Page]
    var pos = 0
    var expectSeq = 0
    var serial = 0
    var first = true
    if (b.length == 0) fail()
    while (pos < b.length) {
      if (pos + 27 > b.length) fail()
      if (!(b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' && b(pos + 3) == 'S')) fail()
      if (b(pos + 4) != 0) fail() // stream structure version
      val headerType = b(pos + 5) & 0xFF
      val granule = le64(b, pos + 6)
      val pSerial = le32(b, pos + 14)
      val pSeq = le32(b, pos + 18)
      val storedCrc = le32(b, pos + 22)
      val nSegs = b(pos + 26) & 0xFF
      if (pos + 27 + nSegs > b.length) fail()
      val lacing = Array.tabulate(nSegs)(i => b(pos + 27 + i) & 0xFF)
      val dataStart = pos + 27 + nSegs
      val dataEnd = dataStart + lacing.sum
      if (dataEnd > b.length) fail()
      // CRC over the page with the checksum field treated as zero
      if (pageCrc(b, pos, pos + 22, dataEnd) != storedCrc) fail()
      if (first) {
        if ((headerType & 0x02) == 0) fail() // first page must be BOS
        serial = pSerial
        first = false
      } else {
        if (pSerial != serial) fail()        // single logical bitstream
        if ((headerType & 0x02) != 0) fail()
      }
      if (pSeq != expectSeq) fail()
      expectSeq += 1
      out += Page(headerType, granule, serial, pSeq, lacing, dataStart, dataEnd)
      pos = dataEnd
    }
    val pages = out.result()
    if ((pages.last.headerType & 0x04) == 0) fail() // last page must be EOS
    pages
  }

  /** Reassemble the logical packets of a single-bitstream Ogg buffer.
    * Total on arbitrary bytes: None on anything malformed (bad capture,
    * CRC mismatch, sequence gap, dangling packet continuation).
    */
  def packets(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      val pages = pagesOrThrow(bytes)
      val out = Seq.newBuilder[Array[Byte]]
      var pending = new ArrayBuffer[Byte]()
      var open = false // a packet is mid-assembly across a page boundary
      pages.foreach { p =>
        val continued = (p.headerType & 0x01) != 0
        if (continued != open) fail()
        var off = p.dataStart
        var i = 0
        while (i < p.lacing.length) {
          val l = p.lacing(i)
          var j = 0
          while (j < l) { pending += bytes(off + j); j += 1 }
          off += l
          if (l < 255) {
            out += pending.toArray
            pending = new ArrayBuffer[Byte]()
            open = false
          } else open = true
          i += 1
        }
      }
      if (open) fail()
      Some(out.result())
    } catch { case _: Malformed | _: ArrayIndexOutOfBoundsException => None }

  /** FLAC-in-Ogg first-packet layout (Xiph mapping):
    * 0x7F 'F' 'L' 'A' 'C' major minor nHeaderPackets(2, BE) then the
    * native stream head: 'f' 'L' 'a' 'C' + the STREAMINFO metadata block
    * (4-byte block header + 34-byte payload).
    */
  private val MappingHead = Array[Byte](0x7F, 'F', 'L', 'A', 'C')

  /** Rebuild the native FLAC byte stream from a FLAC-in-Ogg buffer: the
    * `fLaC` signature + every metadata block (STREAMINFO from the mapping
    * packet, then each header packet verbatim, last-block flag fixed up)
    * + the audio packets (one FLAC frame each) concatenated. None if the
    * container is malformed or the mapping is not FLAC.
    */
  def flacStream(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val pkts = packets(bytes).getOrElse(fail())
      if (pkts.isEmpty) fail()
      val p0 = pkts.head
      if (p0.length < 13 + 38) fail()
      var i = 0
      while (i < 5) { if (p0(i) != MappingHead(i)) fail(); i += 1 }
      if (p0(5) != 1) fail() // mapping major version 1
      val nHeader = ((p0(7) & 0xFF) << 8) | (p0(8) & 0xFF)
      if (!(p0(9) == 'f' && p0(10) == 'L' && p0(11) == 'a' && p0(12) == 'C')) fail()
      if (((p0(13) & 0x7F) != 0)) fail() // first block must be STREAMINFO
      if (pkts.length < 1 + nHeader) fail()
      val metaBlocks = new ArrayBuffer[Array[Byte]]()
      metaBlocks += java.util.Arrays.copyOfRange(p0, 13, p0.length)
      var h = 0
      while (h < nHeader) {
        val pkt = pkts(1 + h)
        if (pkt.length < 4) fail()
        metaBlocks += pkt
        h += 1
      }
      val out = new ArrayBuffer[Byte]()
      out ++= "fLaC".getBytes("US-ASCII")
      var bi = 0
      while (bi < metaBlocks.length) {
        val blk = metaBlocks(bi).clone()
        val lastFlag = if (bi == metaBlocks.length - 1) 0x80 else 0x00
        blk(0) = ((blk(0) & 0x7F) | lastFlag).toByte
        out ++= blk
        bi += 1
      }
      var ai = 1 + nHeader
      while (ai < pkts.length) { out ++= pkts(ai); ai += 1 }
      Some(out.toArray)
    } catch { case _: Malformed | _: ArrayIndexOutOfBoundsException => None }

  // ---------------------------------------------------------------- muxer

  /** Page assembler. Invariants: `pageStartedOpen` — the buffered page's
    * first segment continues a packet left open by the previous page
    * (sets the 0x01 continued flag at flush); `openPacket` — a packet is
    * currently mid-assembly (its last emitted lacing value was 255);
    * `lastComplete` — granule to stamp on the buffered page = position
    * after the LAST packet that completed on it, or -1 if none did
    * (RFC 3533 §6: granule is -1 when no packet finishes on the page).
    */
  private final class PageWriter(out: ArrayBuffer[Byte], serial: Int) {
    private var seq = 0
    private val lacing = new ArrayBuffer[Int]()
    private val data = new ArrayBuffer[Byte]()
    private var pageStartedOpen = false
    private var openPacket = false
    private var lastComplete = -1L
    private var bosPending = false

    private def flush(eos: Boolean): Unit = {
      val ht = (if (pageStartedOpen) 0x01 else 0x00) |
        (if (bosPending) 0x02 else 0x00) | (if (eos) 0x04 else 0x00)
      val start = out.length
      out ++= "OggS".getBytes("US-ASCII")
      out += 0
      out += ht.toByte
      var g = lastComplete
      for (_ <- 0 until 8) { out += (g & 0xFF).toByte; g >>>= 8 }
      var s = serial
      for (_ <- 0 until 4) { out += (s & 0xFF).toByte; s >>>= 8 }
      var q = seq
      for (_ <- 0 until 4) { out += (q & 0xFF).toByte; q >>>= 8 }
      val crcAt = out.length
      for (_ <- 0 until 4) out += 0
      out += lacing.length.toByte
      lacing.foreach(l => out += l.toByte)
      out ++= data
      val arr = out.toArray // CRC over the serialized page
      val c = crc32(arr, start, arr.length)
      out(crcAt) = (c & 0xFF).toByte
      out(crcAt + 1) = ((c >>> 8) & 0xFF).toByte
      out(crcAt + 2) = ((c >>> 16) & 0xFF).toByte
      out(crcAt + 3) = ((c >>> 24) & 0xFF).toByte
      seq += 1
      lacing.clear()
      data.clear()
      pageStartedOpen = openPacket
      lastComplete = -1L
      bosPending = false
    }

    /** Append one packet; `granuleAfter` is the stream position once this
      * packet is complete. Splits across pages at 255 lacing values.
      */
    def packet(p: Array[Byte], granuleAfter: Long, bos: Boolean = false,
        flushAfter: Boolean = false): Unit = {
      if (bos) bosPending = true
      // RFC 3533 segmentation: floor(len/255) values of 255, then len%255
      // (an exact multiple of 255 therefore ends with a 0 lacing value).
      val nSegs = p.length / 255 + 1
      var seg = 0
      var off = 0
      while (seg < nSegs) {
        if (lacing.length == 255) flush(eos = false) // page full mid-packet
        val isLast = seg == nSegs - 1
        val l = if (isLast) p.length - off else 255
        lacing += l
        var j = 0
        while (j < l) { data += p(off + j); j += 1 }
        off += l
        openPacket = !isLast
        if (isLast) lastComplete = granuleAfter
        seg += 1
      }
      if (bos || flushAfter || data.length >= 16384) flush(eos = false)
    }

    def finish(): Unit = flush(eos = true)
  }

  /** Deterministic FLAC-in-Ogg muxer. Splits the native stream into
    * frames by actually decoding it ([[FlacCodec.streamLayout]] — FLAC
    * records frame lengths nowhere), emits the Xiph mapping packet on its
    * own BOS page (nHeaderPackets = 0, STREAMINFO marked last), then one
    * packet per audio frame with the page granule tracking the last
    * completed frame's final sample number. None if the input is not a
    * decodable FLAC stream.
    */
  def muxFlac(flac: Array[Byte]): Option[Array[Byte]] =
    FlacCodec.streamLayout(flac).map { case (streamInfo, frames) =>
      val out = new ArrayBuffer[Byte](flac.length + 256)
      val w = new PageWriter(out, serial = 0x67726674) // "grft"
      val p0 = new ArrayBuffer[Byte]()
      p0 ++= MappingHead
      p0 += 1; p0 += 0       // mapping version 1.0
      p0 += 0; p0 += 0       // no extra header packets
      p0 ++= "fLaC".getBytes("US-ASCII")
      p0 += 0x80.toByte; p0 += 0; p0 += 0; p0 += 34 // STREAMINFO header, last
      p0 ++= streamInfo
      w.packet(p0.toArray, granuleAfter = 0L, bos = true)
      var samples = 0L
      var i = 0
      while (i < frames.length) {
        val (s, e, blockSize) = frames(i)
        samples += blockSize
        w.packet(java.util.Arrays.copyOfRange(flac, s, e), granuleAfter = samples,
          flushAfter = i == frames.length - 2) // keep ≥1 packet for the EOS page
        i += 1
      }
      w.finish()
      out.toArray
    }
}
