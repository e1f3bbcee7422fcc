package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** OggCodec contract: RFC 3533 page framing pinned by hand-assembled
  * pages (CRC computed by an independent bit-at-a-time implementation,
  * lacing semantics including 255-continuation and exact-multiple-of-255
  * packets), FLAC-in-Ogg mux → de-page → FlacCodec round-trip (the
  * rebuilt native stream is byte-identical to the encoder's), packet
  * spanning across pages in BOTH directions, totality on garbage, and
  * Multimodal routing (Ogg-carried FLAC is a REAL path).
  */
class OggCodecSpec extends AnyFunSuite {

  private def pcm(i: Int, n: Int): Array[Int] =
    Array.tabulate(n)(t => ((i * 41 + t * 17) % 65536) - 32768)

  /** Independent Ogg CRC: bit-at-a-time, poly 0x04C11DB7, init 0, no
    * reflection, no final xor — written from RFC 3533 §6, sharing no
    * code with the table-driven implementation under test.
    */
  private def refCrc(bytes: Array[Byte]): Int = {
    var c = 0
    bytes.foreach { b =>
      c ^= (b & 0xFF) << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
        k += 1
      }
    }
    c
  }

  test("CRC matches the published check value (init 0, xorout 0: POSIX check ^ 0xFFFFFFFF)") {
    val v = refCrc("123456789".getBytes("US-ASCII"))
    // CRC-32/CKSUM("123456789") = 0x765E7680 with xorout 0xFFFFFFFF;
    // Ogg omits the final xor.
    assert(v == 0x89A1897F)
  }

  /** Hand-assemble one page: header + lacing + data, CRC via [[refCrc]].
    * Completely independent of PageWriter.
    */
  private def page(headerType: Int, granule: Long, serial: Int, seq: Int,
      lacing: Seq[Int], data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0)
    out.write(headerType)
    var g = granule
    for (_ <- 0 until 8) { out.write((g & 0xFF).toInt); g >>>= 8 }
    var s = serial
    for (_ <- 0 until 4) { out.write(s & 0xFF); s >>>= 8 }
    var q = seq
    for (_ <- 0 until 4) { out.write(q & 0xFF); q >>>= 8 }
    out.write(Array[Byte](0, 0, 0, 0)) // CRC placeholder
    out.write(lacing.length)
    lacing.foreach(out.write)
    out.write(data)
    val b = out.toByteArray
    val c = refCrc(b)
    b(22) = (c & 0xFF).toByte
    b(23) = ((c >>> 8) & 0xFF).toByte
    b(24) = ((c >>> 16) & 0xFF).toByte
    b(25) = ((c >>> 24) & 0xFF).toByte
    b
  }

  test("hand-assembled single page: two packets from lacing [3, 255, 2]") {
    val p1 = Array[Byte](10, 20, 30)
    val p2 = Array.tabulate(257)(k => (k % 251).toByte)
    val stream = page(0x02 | 0x04, 0L, 7, 0, Seq(3, 255, 2), p1 ++ p2)
    val pkts = OggCodec.packets(stream).getOrElse(fail("well-formed page rejected"))
    assert(pkts.length == 2)
    assert(pkts(0).sameElements(p1))
    assert(pkts(1).sameElements(p2))
  }

  test("hand-assembled pages: packet spanning a page boundary (255 + continued flag)") {
    val big = Array.tabulate(300)(k => (k * 3 % 256).toByte)
    val pg0 = page(0x02, -1L, 9, 0, Seq(255), big.take(255))
    val pg1 = page(0x01 | 0x04, 300L, 9, 1, Seq(45), big.drop(255))
    val pkts = OggCodec.packets(pg0 ++ pg1).getOrElse(fail("spanning packet rejected"))
    assert(pkts.length == 1)
    assert(pkts.head.sameElements(big))
  }

  test("hand-assembled page: exact multiple-of-255 packet needs a trailing 0 lacing") {
    val p = Array.tabulate(510)(k => (k % 253).toByte)
    val stream = page(0x02 | 0x04, 0L, 3, 0, Seq(255, 255, 0), p)
    val pkts = OggCodec.packets(stream).getOrElse(fail("multiple-of-255 packet rejected"))
    assert(pkts.length == 1)
    assert(pkts.head.sameElements(p))
  }

  test("malformed streams are rejected, never thrown on") {
    val good = page(0x02 | 0x04, 0L, 1, 0, Seq(3), Array[Byte](1, 2, 3))
    // corrupt one data byte (CRC now wrong)
    val bad = good.clone(); bad(good.length - 1) = 99
    assert(OggCodec.packets(bad).isEmpty, "CRC mismatch must reject")
    // missing EOS
    val noEos = page(0x02, 0L, 1, 0, Seq(3), Array[Byte](1, 2, 3))
    assert(OggCodec.packets(noEos).isEmpty, "missing EOS must reject")
    // sequence gap
    val pg0 = page(0x02, -1L, 1, 0, Seq(255), Array.fill[Byte](255)(1))
    val pg2 = page(0x01 | 0x04, 1L, 1, 2, Seq(1), Array[Byte](1))
    assert(OggCodec.packets(pg0 ++ pg2).isEmpty, "page-sequence gap must reject")
    // dangling continuation (stream ends mid-packet)
    val dangling = page(0x02 | 0x04, -1L, 1, 0, Seq(255), Array.fill[Byte](255)(1))
    assert(OggCodec.packets(dangling).isEmpty, "open packet at EOS must reject")
    // continued flag without an open packet
    val pgA = page(0x02, 1L, 1, 0, Seq(1), Array[Byte](1))
    val pgB = page(0x01 | 0x04, 2L, 1, 1, Seq(1), Array[Byte](2))
    assert(OggCodec.packets(pgA ++ pgB).isEmpty, "false continued flag must reject")
    // truncation at every prefix must return None, not throw
    val two = pg0 ++ pg2
    (0 until two.length by 7).foreach { k =>
      assert(OggCodec.packets(two.take(k)).isEmpty)
    }
  }

  test("muxFlac → flacStream is byte-identical to the original native stream") {
    val flac = FlacCodec.encode(11025, Array(pcm(2, 6262))) // 2 frames
    val ogg = OggCodec.muxFlac(flac).getOrElse(fail("muxFlac refused own encoder's stream"))
    val rebuilt = OggCodec.flacStream(ogg).getOrElse(fail("no FLAC stream"))
    assert(rebuilt.sameElements(flac),
      "encoder writes fLaC + STREAMINFO(last) + frames; the rebuild must be exact")
  }

  test("muxFlac → packets: one mapping packet + one per FLAC frame; decode is lossless") {
    val samples = pcm(5, 9001) // 3 frames: 4096+4096+809
    val flac = FlacCodec.encode(11025, Array(samples))
    val ogg = OggCodec.muxFlac(flac).get
    val pkts = OggCodec.packets(ogg).getOrElse(fail("own mux rejected"))
    assert(pkts.length == 4)
    assert(pkts.head.take(5).sameElements(Array[Byte](0x7F, 'F', 'L', 'A', 'C')))
    val decoded = FlacCodec.decode(OggCodec.flacStream(ogg).get)
      .getOrElse(fail("rebuilt stream undecodable"))
    assert(decoded.sampleRate == 11025)
    assert(decoded.channels(0).sameElements(samples))
  }

  test("mux is deterministic (byte-identical across calls)") {
    val flac = FlacCodec.encode(8000, Array(pcm(7, 5000)))
    val a = OggCodec.muxFlac(flac).get
    val b = OggCodec.muxFlac(flac).get
    assert(a.sameElements(b))
  }

  test("a frame larger than one segment table spans pages (mux side)") {
    // High-entropy PCM (LCG) at blockSize 32768: the rice/verbatim frame
    // exceeds 255·255 = 65025 bytes, forcing PageWriter to split the
    // packet across pages with the continued flag.
    var seed = 12345L
    val noise = Array.fill(32768) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % 65536) - 32768).toInt
    }
    val flac = FlacCodec.encode(16000, Array(noise), blockSize = 32768)
    val ogg = OggCodec.muxFlac(flac).getOrElse(fail("mux refused"))
    // find page header positions and check at least one continued flag
    var continued = 0
    var pos = 0
    while (pos + 27 <= ogg.length) {
      assert(ogg(pos) == 'O' && ogg(pos + 1) == 'g' && ogg(pos + 2) == 'g' && ogg(pos + 3) == 'S')
      if ((ogg(pos + 5) & 0x01) != 0) continued += 1
      val nSegs = ogg(pos + 26) & 0xFF
      var dataLen = 0
      for (k <- 0 until nSegs) dataLen += ogg(pos + 27 + k) & 0xFF
      pos += 27 + nSegs + dataLen
    }
    assert(continued >= 1, "oversized packet must continue across a page")
    val decoded = FlacCodec.decode(OggCodec.flacStream(ogg).get).get
    assert(decoded.channels(0).sameElements(noise))
  }

  test("Multimodal routes Ogg-FLAC through the REAL audio path (identical features to bare FLAC)") {
    val samples = pcm(9, 6131)
    val flac = FlacCodec.encode(12000, Array(samples))
    val ogg = OggCodec.muxFlac(flac).get
    val dec = new Multimodal.DefaultDecoder(strict = true) // must not hit the fake seam
    val viaOgg = dec.features(
      Multimodal.MediaRow("a1", "audio", "application/ogg", ogg, Map.empty))
    val viaFlac = dec.features(
      Multimodal.MediaRow("a2", "audio", "application/flac", flac, Map.empty))
    assert(viaOgg.length == 1 && viaOgg.head.feature_real)
    assert(viaOgg.head.width == 12000 && viaOgg.head.height == 1)
    assert(viaOgg.head.feature.sameElements(viaFlac.head.feature),
      "container must not change the featurization")
  }

  test("totality: arbitrary bytes never throw") {
    var seed = 99L
    (0 until 200).foreach { k =>
      val b = Array.fill(k * 13 % 700) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (seed >>> 40).toByte
      }
      OggCodec.packets(b)
      OggCodec.flacStream(b)
    }
    // near-miss: valid capture pattern then garbage
    val nearMiss = "OggS".getBytes("US-ASCII") ++ Array.fill[Byte](40)(0x55)
    assert(OggCodec.packets(nearMiss).isEmpty)
  }
}
