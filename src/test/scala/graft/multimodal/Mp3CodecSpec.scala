package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Mp3Codec contract: the metadata tier must be EXACT on conforming
  * streams (frame sizes hand-computed from §2.4.3.1 arithmetic in this
  * spec, independently of the codec's own frameSize), strict on
  * non-conforming ones (every header field violation rejected, mid-
  * stream inconsistencies rejected), and total on garbage. Hand-
  * assembled headers verify the bit layout against the spec text, not
  * just build()/parse() self-consistency.
  */
class Mp3CodecSpec extends AnyFunSuite {

  private val M = Mp3Codec

  test("hand-assembled single frame: header bit layout matches the spec text") {
    // 128 kbps (idx 9), 44100 Hz (idx 0), no padding, mono, no CRC:
    // size = 144000*128/44100 = 417 bytes (independent arithmetic here)
    val size = 144000 * 128 / 44100
    assert(size == 417)
    val b = new Array[Byte](size)
    b(0) = 0xFF.toByte            // sync 11111111
    b(1) = 0xFB.toByte            // 111 (sync) 11 (MPEG-1) 01 (L3) 1 (no CRC)
    b(2) = 0x90.toByte            // 1001 (idx 9) 00 (44100) 0 (pad) 0
    b(3) = 0xC0.toByte            // 11 (mono) ...
    val info = M.parse(b).getOrElse(fail("conforming frame rejected"))
    assert(info.nFrames == 1 && info.sampleRate == 44100 && info.mode == 3)
    assert(info.frames.head.bitrateKbps == 128)
    assert(info.frames.head.sizeBytes == 417)
    assert(info.durationMs == 1152L * 1000 / 44100)
  }

  test("build/parse round-trip across the full parameter matrix") {
    for {
      si <- 0 to 2
      mode <- Seq(0, 3)
      vbr <- Seq(false, true)
      id3v2 <- Seq(0, 57)
      id3v1 <- Seq(false, true)
    } {
      val nf = 11
      val bis = if (vbr) (0 until nf).map(f => 1 + (f * 3) % 14)
                else Seq.fill(nf)(9)
      val bytes = M.build(bis, si, mode, seed = si * 7 + mode,
        id3v2PayloadLen = id3v2, id3v1 = id3v1, paddingEvery = 4, xing = vbr)
      val info = M.parse(bytes)
        .getOrElse(fail(s"rejected si=$si mode=$mode vbr=$vbr"))
      assert(info.nFrames == nf)
      assert(info.sampleRate == M.SampleRatesV1(si))
      assert(info.mode == mode)
      assert(info.vbr == vbr)
      assert(info.xingFrames == (if (vbr) Some(nf) else None))
      assert(info.id3v2Bytes == (if (id3v2 > 0) 10 + id3v2 else 0))
      assert(info.id3v1 == id3v1)
      // byte accounting closes exactly: tags + sum of frame sizes
      val expected = info.id3v2Bytes + info.frames.map(_.sizeBytes).sum +
        (if (id3v1) 128 else 0)
      assert(bytes.length == expected, "frame walk must tile the stream")
    }
  }

  test("padding bit adds exactly one byte to the §2.4.3.1 frame size") {
    val b = M.build(Seq.fill(6)(5), 1, 3, seed = 2, paddingEvery = 2)
    val info = M.parse(b).get
    val base = 144000 * 64 / 48000
    assert(info.frames.map(_.sizeBytes) ==
      Seq(base + 1, base, base + 1, base, base + 1, base))
  }

  test("rejections: every header violation and mid-stream inconsistency") {
    val good = M.build(Seq.fill(4)(9), 0, 3, seed = 1)
    assert(M.parse(good).isDefined)
    def mut(i: Int, v: Int): Array[Byte] = {
      val c = good.clone(); c(i) = v.toByte; c
    }
    assert(M.parse(mut(0, 0xFE)).isEmpty, "broken sync")
    // since the round-10 widening these two flips parse as VALID MPEG-2 /
    // Layer II first frames — the stream is now rejected one step later,
    // by the re-sized walk landing mid-payload (same None, new reason)
    assert(M.parse(mut(1, 0xF3)).isEmpty, "version change = walk de-sync")
    assert(M.parse(mut(1, 0xFD)).isEmpty, "layer change = walk de-sync")
    assert(M.parse(mut(1, 0xF9)).isEmpty, "reserved layer code 00")
    assert(M.parse(mut(2, 0x00)).isEmpty, "free-format bitrate")
    assert(M.parse(mut(2, 0xF0)).isEmpty, "forbidden bitrate index")
    assert(M.parse(mut(2, 0x9C)).isEmpty, "reserved sampling rate")
    // mid-stream rate change: patch the SECOND frame's rate bits
    val f2 = M.parse(good).get.frames(1).offset
    assert(M.parse(mut(f2 + 2, 0x94)).isEmpty, "rate change mid-stream")
    assert(M.parse(mut(f2 + 3, 0x00)).isEmpty, "mode change mid-stream")
    // truncation anywhere must reject, never throw
    for (len <- 0 until good.length by 7)
      assert(M.parse(good.take(len)).isEmpty, s"truncation at $len")
    assert(M.parse(Array.emptyByteArray).isEmpty)
    // an ID3v2 tag with nothing after it is not an mp3
    val tagOnly = M.build(Seq(9), 0, 3, 1, id3v2PayloadLen = 20)
      .take(30)
    assert(M.parse(tagOnly).isEmpty)
  }

  test("totality: random garbage and bit flips never throw") {
    val rnd = new scala.util.Random(0x3B3)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte)
      M.parse(junk) // must not throw
    }
    val good = M.build((0 until 9).map(f => 1 + f % 14), 2, 0, seed = 4,
      xing = true)
    for (_ <- 0 until 300) {
      val c = good.clone()
      for (_ <- 0 to rnd.nextInt(3)) c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      M.parse(c) // strictness may reject; it must never throw
    }
  }

  test("version/layer matrix: round-trip with independently computed frame sizes") {
    // every (version, layer, rate-index) cell of the §2.4.1.3 matrix,
    // with the frame arithmetic recomputed HERE from the spec text
    // (slot-based Layer I, 144/72-multiplier Layers II/III), sharing no
    // code with the codec's frameSize
    val rates = Map(3 -> Seq(44100, 48000, 32000), 2 -> Seq(22050, 24000, 16000),
      0 -> Seq(11025, 12000, 8000))
    val tables = Map(
      (3, 3) -> Seq(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      (3, 2) -> Seq(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      (3, 1) -> Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
      (2, 3) -> Seq(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      (2, 2) -> Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
    for {
      ver <- Seq(3, 2, 0)
      layer <- Seq(3, 2, 1) // raw codes: I, II, III
      si <- 0 to 2
      bi <- Seq(1, 7, 14)
    } {
      val bytes = M.build(Seq.fill(5)(bi), si, mode = 3, seed = ver * 9 + layer,
        verRaw = ver, layerRaw = layer)
      val info = M.parse(bytes)
        .getOrElse(fail(s"rejected ver=$ver layer=$layer si=$si bi=$bi"))
      val rate = rates(ver)(si)
      val kbps = tables(if (ver == 3) (3, layer) else (2, math.max(layer, 2)))(bi)
      val size =
        if (layer == 3) (12000 * kbps / rate) * 4
        else if (layer == 2 || ver == 3) 144000 * kbps / rate
        else 72000 * kbps / rate
      assert(info.frames.head.sizeBytes == size, s"ver=$ver layer=$layer si=$si bi=$bi")
      assert(info.sampleRate == rate && info.frames.head.bitrateKbps == kbps)
      assert(bytes.length == 5 * size, "walk must tile the stream")
      // catalog derivations: versionX10, logical layer, samples/frame
      assert(info.versionX10 == (if (ver == 3) 10 else if (ver == 2) 20 else 25))
      assert(info.layer == 4 - layer)
      val spf = if (layer == 3) 384 else if (layer == 2) 1152
                else if (ver == 3) 1152 else 576
      assert(info.durationMs == 5L * spf * 1000 / rate)
    }
  }

  test("MPEG-2.5 Layer III Xing sits after the 9/17-byte side info") {
    val mono = M.build((0 until 7).map(f => 1 + f % 14), 1, 3, seed = 11,
      xing = true, verRaw = 0, layerRaw = 1)
    assert(M.parse(mono).get.xingFrames.contains(7))
    val stereo = M.build((0 until 7).map(f => 1 + f % 14), 1, 0, seed = 12,
      xing = true, verRaw = 0, layerRaw = 1)
    assert(M.parse(stereo).get.xingFrames.contains(7))
  }

  test("ID3v1 sniff false positive: payload 'TAG' at end-128 must not reject") {
    // untagged stream whose last frame's PAYLOAD coincidentally spells
    // 'TAG' exactly 128 bytes from the end — the trimmed walk fails to
    // tile, and the ADVICE-r9 retry must accept the stream untrimmed
    val good = M.build(Seq.fill(9)(9), 0, 3, seed = 6)
    assert(good.length > 600, "need a payload byte at end-128")
    val lastOff = M.parse(good).get.frames.last.offset
    assert(good.length - 128 > lastOff + 4, "'TAG' must land inside payload")
    val c = good.clone()
    c(c.length - 128) = 'T'; c(c.length - 127) = 'A'; c(c.length - 126) = 'G'
    val info = M.parse(c).getOrElse(fail("false-positive trim rejected stream"))
    assert(!info.id3v1, "coincidental payload 'TAG' reported as a trailer tag")
    assert(info.nFrames == 9)
    // and a REAL trailer is still detected (walk tiles after the trim)
    val tagged = M.build(Seq.fill(9)(9), 0, 3, seed = 6, id3v1 = true)
    assert(M.parse(tagged).get.id3v1)
  }

  test("Xing offset honors CRC and channel-mode side-info widths") {
    // stereo (side info 32) + Xing: tag must be found at 4 + 32
    val st = M.build((0 until 8).map(f => 1 + f % 14), 0, 0, seed = 5, xing = true)
    assert(M.parse(st).get.xingFrames.contains(8))
    // hand-set the CRC bit on the first frame: the walker must now look
    // 2 bytes later — our builder never writes CRC streams, so parse
    // sees no tag there (None), but must still walk the frames (the two
    // CRC bytes come out of the payload area, sizes unchanged)
    val c = st.clone(); c(1) = 0xFA.toByte
    val info = M.parse(c).getOrElse(fail("CRC frame rejected"))
    assert(info.xingFrames.isEmpty)
    assert(info.nFrames == 8)
  }
}
