package graft.multimodal

/** Pure-JVM ISO-BMFF (MP4) demux + a deterministic muxer, implemented
  * from the PUBLIC specifications — ISO/IEC 14496-12 (box structure,
  * sample tables) and the Xiph "Encapsulation of FLAC in ISO BMFF"
  * mapping (`fLaC` sample entry whose `dfLa` box carries the stream's
  * complete FLAC metadata blocks; each MP4 sample is one FLAC frame).
  * No external library, no code taken from any demuxer.
  *
  * This closes the "non-AVI video/audio container" half of the
  * compressed-media seam for real payloads this JVM can decode:
  *  - audio: a `fLaC` track rebuilds a native FLAC stream (magic +
  *    `dfLa` metadata + concatenated samples) and decodes through
  *    [[FlacCodec]] — lossless, so `q_mp4_scan` puts the whole chain
  *    (box walk → sample table → frame split → FLAC decode) under the
  *    closed-form hash oracle;
  *  - video: a `jpeg` (MJPEG) track's samples are plain JPEGs that
  *    ImageIO reads, the MP4 twin of the MJPEG-AVI path.
  * Codecs that genuinely need native libraries (H.264, AAC, mp3) stay
  * behind the documented fake+strict seam even when carried in MP4.
  *
  * Demux coverage: 32- and 64-bit box sizes, multi-chunk sample layouts
  * (`stsc` runs × `stco`/`co64` chunk offsets), uniform and per-sample
  * `stsz`, any number of tracks (each classified by its `hdlr` type).
  * Everything is bounds-checked against the actual buffer — the demuxer
  * is TOTAL on arbitrary bytes, the same contract as [[AviCodec]] /
  * [[FlacCodec]] / [[ZmbvCodec]].
  *
  * Muxer subset (fixture/production-write tier): one track, samples in
  * one chunk, `ftyp` + `mdat` + `moov` in that fixed order — every byte
  * a pure function of the input, so fixture trees are pinnable by
  * `read_blob` byte identity like the PNG/FLAC/ZMBV trees.
  */
object Mp4Codec {

  /** One demuxed track: `kind` is the `hdlr` handler type ("soun" /
    * "vide"), `fourcc` the sample-entry format; `codecConfig` is the
    * format-specific setup payload (for `fLaC`: the `dfLa` box body
    * after its FullBox header, i.e. the raw FLAC metadata blocks).
    */
  final case class Track(kind: String, fourcc: String,
      width: Int, height: Int, channels: Int, sampleRate: Int,
      codecConfig: Array[Byte], samples: Seq[Array[Byte]])

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def be64(b: Array[Byte], o: Int): Long =
    ((be32(b, o) & 0xFFFFFFFFL) << 32) | (be32(b, o + 4) & 0xFFFFFFFFL)
  private def fourccAt(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Iterate the boxes in [from, until): (type, payloadStart, payloadEnd). */
  private def boxes(b: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var pos = from
    while (pos + 8 <= until) {
      val size32 = be32(b, pos)
      val typ = fourccAt(b, pos + 4)
      var payload = pos + 8
      val size: Long =
        if (size32 == 0) until.toLong - pos // box extends to end
        else if (size32 == 1) {
          if (pos + 16 > until) fail()
          payload = pos + 16
          be64(b, pos + 8)
        } else size32.toLong
      if (size < payload - pos || pos + size > until) fail()
      out += ((typ, payload, (pos + size).toInt))
      pos = (pos + size).toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], from: Int, until: Int, typ: String): Option[(Int, Int)] =
    boxes(b, from, until).collectFirst { case (`typ`, s, e) => (s, e) }

  /** Total demuxer: every track with a complete sample table, or None if
    * the bytes are not a conforming ISO-BMFF file.
    */
  def demux(bytes: Array[Byte]): Option[Seq[Track]] =
    try Some(demuxOrThrow(bytes))
    catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException | _: java.io.UnsupportedEncodingException => None
    }

  private def demuxOrThrow(bytes: Array[Byte]): Seq[Track] = {
    val top = boxes(bytes, 0, bytes.length)
    if (!top.exists(_._1 == "ftyp")) fail()
    val (_, moovS, moovE) = top.find(_._1 == "moov").getOrElse(fail())
    boxes(bytes, moovS, moovE).collect { case ("trak", ts, te) =>
      val (mdS, mdE) = child(bytes, ts, te, "mdia").getOrElse(fail())
      val (hdS, _) = child(bytes, mdS, mdE, "hdlr").getOrElse(fail())
      val kind = fourccAt(bytes, hdS + 8) // FullBox(4) + pre_defined(4)
      val (mnS, mnE) = child(bytes, mdS, mdE, "minf").getOrElse(fail())
      val (sbS, sbE) = child(bytes, mnS, mnE, "stbl").getOrElse(fail())

      // ---- stsd: first sample entry
      val (sdS, sdE) = child(bytes, sbS, sbE, "stsd").getOrElse(fail())
      if (be32(bytes, sdS + 4) < 1) fail() // entry_count
      val entries = boxes(bytes, sdS + 8, sdE)
      val (fcc, enS, enE) = entries.headOption.getOrElse(fail())
      // sample entry: 6 reserved + 2 data_reference_index, then per-kind
      var width = 0; var height = 0; var channels = 0; var sampleRate = 0
      var cfg: Array[Byte] = Array.emptyByteArray
      var childOff = enS + 8
      if (kind == "soun") {
        // AudioSampleEntry: 8 reserved, 2 ch, 2 samplesize, 4 pre/res, 4 rate<<16
        channels = be16(bytes, enS + 16)
        sampleRate = be32(bytes, enS + 24) >>> 16
        childOff = enS + 28
      } else if (kind == "vide") {
        // VisualSampleEntry: 16 pre/reserved, 2 w, 2 h, 8 res, 4 res,
        // 2 frame_count, 32 compressorname, 2 depth, 2 pre_defined
        width = be16(bytes, enS + 24)
        height = be16(bytes, enS + 26)
        childOff = enS + 78
      }
      if (childOff <= enE) {
        boxes(bytes, childOff, enE).foreach {
          case ("dfLa", s, e) => cfg = java.util.Arrays.copyOfRange(bytes, s + 4, e)
          case _ => ()
        }
      }

      // ---- sample sizes
      val (szS, _) = child(bytes, sbS, sbE, "stsz").getOrElse(fail())
      val uniform = be32(bytes, szS + 4)
      val nSamples = be32(bytes, szS + 8)
      if (nSamples < 0 || nSamples > (1 << 22)) fail()
      val sizes = Array.tabulate(nSamples)(i =>
        if (uniform != 0) uniform else be32(bytes, szS + 12 + 4 * i))
      if (sizes.exists(s => s < 0 || s > bytes.length)) fail()

      // ---- chunk offsets (stco 32-bit or co64 64-bit)
      val chunkOffsets: Array[Long] =
        child(bytes, sbS, sbE, "stco") match {
          case Some((cS, _)) =>
            Array.tabulate(be32(bytes, cS + 4))(i => be32(bytes, cS + 8 + 4 * i) & 0xFFFFFFFFL)
          case None =>
            val (cS, _) = child(bytes, sbS, sbE, "co64").getOrElse(fail())
            Array.tabulate(be32(bytes, cS + 4))(i => be64(bytes, cS + 8 + 8 * i))
        }

      // ---- sample→chunk runs
      val (scS, _) = child(bytes, sbS, sbE, "stsc").getOrElse(fail())
      val nRuns = be32(bytes, scS + 4)
      val runs = Array.tabulate(nRuns)(i =>
        (be32(bytes, scS + 8 + 12 * i),      // first_chunk (1-based)
          be32(bytes, scS + 8 + 12 * i + 4))) // samples_per_chunk
      if (runs.isEmpty && nSamples > 0) fail()

      // walk chunks, slicing consecutive samples out of each
      val samples = Seq.newBuilder[Array[Byte]]
      var si = 0
      var run = 0
      var chunk = 1
      while (si < nSamples && chunk <= chunkOffsets.length) {
        while (run + 1 < nRuns && runs(run + 1)._1 <= chunk) run += 1
        val perChunk = runs(run)._2
        var off = chunkOffsets(chunk - 1)
        var k = 0
        while (k < perChunk && si < nSamples) {
          val sz = sizes(si)
          if (off < 0 || off + sz > bytes.length) fail()
          samples += java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + sz)
          off += sz
          si += 1; k += 1
        }
        chunk += 1
      }
      if (si != nSamples) fail()
      Track(kind, fcc, width, height, channels, sampleRate, cfg, samples.result())
    }
  }

  /** Rebuild a native FLAC stream from a `fLaC` track (Xiph mapping:
    * `dfLa` carries the complete metadata blocks verbatim; samples are
    * the audio frames in order) — ready for [[FlacCodec.decode]].
    */
  def flacStream(t: Track): Option[Array[Byte]] =
    if (t.fourcc != "fLaC" || t.codecConfig.isEmpty) None
    else {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("fLaC".getBytes("US-ASCII"))
      bos.write(t.codecConfig)
      t.samples.foreach(bos.write)
      Some(bos.toByteArray)
    }

  // --------------------------------------------------------------- mux

  private final class BoxWriter {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF) }
    def w32(v: Int): Unit = { w16(v >>> 16); w16(v & 0xFFFF) }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def raw(b: Array[Byte]): Unit = bos.write(b)
    def box(typ: String)(body: => Unit): Unit = {
      val mark = bos.size()
      w32(0); cc(typ)
      body
      val out = bos.toByteArray
      val size = out.length - mark
      out(mark) = ((size >> 24) & 0xFF).toByte
      out(mark + 1) = ((size >> 16) & 0xFF).toByte
      out(mark + 2) = ((size >> 8) & 0xFF).toByte
      out(mark + 3) = (size & 0xFF).toByte
      bos.reset(); bos.write(out, 0, out.length)
    }
  }

  /** Wrap a native FLAC stream (from [[FlacCodec.encode]]) into an MP4
    * per the Xiph mapping: `ftyp isom` + `mdat` (the frames verbatim,
    * one chunk) + `moov` with a single `soun` track whose `fLaC` entry
    * carries the stream's STREAMINFO in `dfLa`, real per-sample sizes in
    * `stsz`, and real per-sample durations (block sizes) in `stts`.
    * Deterministic: output bytes are a pure function of the input.
    */
  def muxFlac(flac: Array[Byte]): Option[Array[Byte]] =
    FlacCodec.streamLayout(flac).map { case (streamInfo, frames) =>
      val sampleRate = ((streamInfo(10) & 0xFF) << 12) | ((streamInfo(11) & 0xFF) << 4) |
        ((streamInfo(12) & 0xFF) >> 4)
      val channels = ((streamInfo(12) >> 1) & 0x07) + 1
      val totalSamples = frames.map(_._3.toLong).sum
      val frameBytes = frames.map { case (s, e, _) =>
        java.util.Arrays.copyOfRange(flac, s, e)
      }
      // stts runs over consecutive equal block sizes
      val sttsRuns = frames.foldLeft(List.empty[(Int, Int)]) {
        case ((n, d) :: tail, (_, _, bs)) if d == bs => (n + 1, d) :: tail
        case (acc, (_, _, bs)) => (1, bs) :: acc
      }.reverse

      val w = new BoxWriter
      w.box("ftyp") { w.cc("isom"); w.w32(0x200); w.cc("isom"); w.cc("iso2") }
      val mdatPayloadOff = w.bos.size() + 8
      w.box("mdat") { frameBytes.foreach(w.raw) }
      w.box("moov") {
        w.box("mvhd") {
          w.w32(0) // version/flags
          w.w32(0); w.w32(0) // times
          w.w32(sampleRate)
          w.w32(totalSamples.toInt)
          w.w32(0x00010000); w.w16(0x0100); w.w16(0) // rate, volume, reserved
          w.w32(0); w.w32(0)
          Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(w.w32)
          (0 until 6).foreach(_ => w.w32(0)) // pre_defined
          w.w32(2) // next track id
        }
        w.box("trak") {
          w.box("tkhd") {
            w.w32(7) // version 0, flags: enabled+in-movie+in-preview
            w.w32(0); w.w32(0)
            w.w32(1) // track id
            w.w32(0)
            w.w32(totalSamples.toInt)
            w.w32(0); w.w32(0)
            w.w16(0); w.w16(0); w.w16(0x0100); w.w16(0) // layer, group, volume
            Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(w.w32)
            w.w32(0); w.w32(0) // width, height (audio: 0)
          }
          w.box("mdia") {
            w.box("mdhd") {
              w.w32(0); w.w32(0); w.w32(0)
              w.w32(sampleRate)
              w.w32(totalSamples.toInt)
              w.w16(0x55C4); w.w16(0) // language 'und', pre_defined
            }
            w.box("hdlr") {
              w.w32(0); w.w32(0); w.cc("soun")
              w.w32(0); w.w32(0); w.w32(0)
              w.raw(Array[Byte](0)) // empty name, NUL-terminated
            }
            w.box("minf") {
              w.box("smhd") { w.w32(0); w.w32(0) }
              w.box("dinf") {
                w.box("dref") {
                  w.w32(0); w.w32(1)
                  w.box("url ") { w.w32(1) } // self-contained
                }
              }
              w.box("stbl") {
                w.box("stsd") {
                  w.w32(0); w.w32(1)
                  w.box("fLaC") {
                    (0 until 6).foreach(_ => w.bos.write(0))
                    w.w16(1) // data_reference_index
                    w.w32(0); w.w32(0) // reserved
                    w.w16(channels); w.w16(16)
                    w.w16(0); w.w16(0)
                    w.w32(sampleRate << 16)
                    w.box("dfLa") {
                      w.w32(0) // FullBox version/flags
                      // complete metadata: STREAMINFO with last-block flag
                      w.raw(Array[Byte](0x80.toByte, 0, 0, 34))
                      w.raw(streamInfo)
                    }
                  }
                }
                w.box("stts") {
                  w.w32(0); w.w32(sttsRuns.length)
                  sttsRuns.foreach { case (n, d) => w.w32(n); w.w32(d) }
                }
                w.box("stsc") {
                  w.w32(0); w.w32(1)
                  w.w32(1); w.w32(frames.length); w.w32(1)
                }
                w.box("stsz") {
                  w.w32(0); w.w32(0); w.w32(frames.length)
                  frameBytes.foreach(f => w.w32(f.length))
                }
                w.box("stco") { w.w32(0); w.w32(1); w.w32(mdatPayloadOff) }
              }
            }
          }
        }
      }
      w.bos.toByteArray
    }

  /** Wrap pre-encoded JPEG frames into an MP4 with a single MJPEG video
    * track (QuickTime `jpeg` sample entry) — the MP4 twin of
    * [[AviCodec.synthesize]] for MJPEG. 25 fps timescale, one chunk.
    */
  def muxMjpeg(width: Int, height: Int, jpegs: Seq[Array[Byte]]): Array[Byte] = {
    val w = new BoxWriter
    w.box("ftyp") { w.cc("isom"); w.w32(0x200); w.cc("isom"); w.cc("iso2") }
    val mdatPayloadOff = w.bos.size() + 8
    w.box("mdat") { jpegs.foreach(w.raw) }
    w.box("moov") {
      w.box("mvhd") {
        w.w32(0); w.w32(0); w.w32(0)
        w.w32(25); w.w32(jpegs.length)
        w.w32(0x00010000); w.w16(0x0100); w.w16(0)
        w.w32(0); w.w32(0)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(w.w32)
        (0 until 6).foreach(_ => w.w32(0))
        w.w32(2)
      }
      w.box("trak") {
        w.box("tkhd") {
          w.w32(7); w.w32(0); w.w32(0); w.w32(1); w.w32(0)
          w.w32(jpegs.length)
          w.w32(0); w.w32(0)
          w.w16(0); w.w16(0); w.w16(0); w.w16(0)
          Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(w.w32)
          w.w32(width << 16); w.w32(height << 16)
        }
        w.box("mdia") {
          w.box("mdhd") {
            w.w32(0); w.w32(0); w.w32(0)
            w.w32(25); w.w32(jpegs.length)
            w.w16(0x55C4); w.w16(0)
          }
          w.box("hdlr") {
            w.w32(0); w.w32(0); w.cc("vide")
            w.w32(0); w.w32(0); w.w32(0)
            w.raw(Array[Byte](0))
          }
          w.box("minf") {
            w.box("vmhd") { w.w32(1); w.w16(0); w.w16(0); w.w16(0); w.w16(0) }
            w.box("dinf") {
              w.box("dref") {
                w.w32(0); w.w32(1)
                w.box("url ") { w.w32(1) }
              }
            }
            w.box("stbl") {
              w.box("stsd") {
                w.w32(0); w.w32(1)
                w.box("jpeg") {
                  (0 until 6).foreach(_ => w.bos.write(0))
                  w.w16(1)
                  w.w16(0); w.w16(0)
                  w.w32(0); w.w32(0); w.w32(0)
                  w.w16(width); w.w16(height)
                  w.w32(0x00480000); w.w32(0x00480000) // 72 dpi
                  w.w32(0)
                  w.w16(1) // frame_count
                  w.raw(new Array[Byte](32)) // compressorname
                  w.w16(24); w.w16(0xFFFF) // depth, pre_defined
                }
              }
              w.box("stts") { w.w32(0); w.w32(1); w.w32(jpegs.length); w.w32(1) }
              w.box("stsc") { w.w32(0); w.w32(1); w.w32(1); w.w32(jpegs.length); w.w32(1) }
              w.box("stsz") {
                w.w32(0); w.w32(0); w.w32(jpegs.length)
                jpegs.foreach(f => w.w32(f.length))
              }
              w.box("stco") { w.w32(0); w.w32(1); w.w32(mdatPayloadOff) }
            }
          }
        }
      }
    }
    w.bos.toByteArray
  }
}
