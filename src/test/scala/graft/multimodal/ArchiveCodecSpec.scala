package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Archive-tier contract: TAR/ZIP/GZIP/WARC walkers must round-trip
  * their builders, interoperate with the INDEPENDENT `java.util.zip`
  * implementations where the JVM ships one (gzip both directions, zip
  * both directions — including the data-descriptor shape
  * ZipOutputStream emits for DEFLATED entries), reject corruption at
  * every structural field, and stay total on garbage. TAR and WARC have
  * no JVM twin, so their layouts are asserted byte-by-byte against the
  * public field tables here, independently of the builders.
  */
class ArchiveCodecSpec extends AnyFunSuite {

  private def lcg(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((seed * 13 + k * 7) % 128).toByte)

  // ------------------------------------------------------------- tar

  test("tar: build/entries round-trip and hand-checked header layout") {
    val files = Seq(("a.txt", lcg(1, 700)), ("dir/b.bin", lcg(2, 512)),
      ("c", Array.emptyByteArray))
    val tar = TarCodec.build(files, mtime = 1234567L)
    // layout independent of the parser: size field is octal at 124,
    // magic "ustar\0" at 257, data starts at 512 and is block-padded
    assert(new String(tar, 257, 5, "ISO-8859-1") == "ustar")
    assert(java.lang.Long.parseLong(
      new String(tar, 124, 11, "ISO-8859-1"), 8) == 700)
    assert(tar.length == 512 + 1024 /*700 padded*/ + 512 + 512 + 512 + 1024)
    val es = TarCodec.entries(tar).getOrElse(fail("rejected own build"))
    assert(es.map(_.name) == Seq("a.txt", "dir/b.bin", "c"))
    assert(es.map(_.size) == Seq(700, 512, 0))
    assert(es.forall(_.mtime == 1234567L))
    files.zip(es).foreach { case ((_, data), e) =>
      assert(TarCodec.payload(tar, e).sameElements(data))
    }
  }

  test("tar: corruption and truncation reject, garbage never throws") {
    val tar = TarCodec.build(Seq(("x", lcg(3, 100))))
    def mut(i: Int, v: Int) = { val c = tar.clone(); c(i) = v.toByte; c }
    assert(TarCodec.entries(mut(0, 'y')).isEmpty, "checksum must break")
    assert(TarCodec.entries(mut(124, '9')).isEmpty, "non-octal size digit")
    assert(TarCodec.entries(mut(258, 'x')).isEmpty, "magic")
    assert(TarCodec.entries(tar.dropRight(512)).isEmpty, "missing terminator")
    assert(TarCodec.entries(tar ++ Array[Byte](1)).isEmpty, "trailing garbage")
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200)
      TarCodec.entries(Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte))
  }

  // ------------------------------------------------------------ gzip

  test("gzip: members round-trips and java.util.zip reads our bytes") {
    val p1 = lcg(4, 900); val p2 = lcg(5, 33)
    val gz = GzipCodec.buildMember(p1, Some("one.dat"), mtime = 99L) ++
      GzipCodec.buildMember(p2)
    val ms = GzipCodec.members(gz, 1 << 20).getOrElse(fail("rejected own"))
    assert(ms.length == 2)
    assert(ms(0).name.contains("one.dat") && ms(0).mtime == 99L)
    assert(ms(0).payload.sameElements(p1) && ms(1).payload.sameElements(p2))
    assert(ms(0).offset == 0 && ms(1).offset == ms(0).compressedBytes)
    // independent decoder: GZIPInputStream concatenates members
    val jin = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val all = jin.readAllBytes()
    assert(all.sameElements(p1 ++ p2), "java.util.zip disagrees on payload")
  }

  test("gzip: our walker reads java.util.zip output") {
    val p = lcg(6, 1234)
    val bos = new java.io.ByteArrayOutputStream()
    val gout = new java.util.zip.GZIPOutputStream(bos)
    gout.write(p); gout.close()
    val ms = GzipCodec.members(bos.toByteArray, 1 << 20)
      .getOrElse(fail("rejected GZIPOutputStream bytes"))
    assert(ms.length == 1 && ms.head.payload.sameElements(p))
  }

  test("gzip: trailer/flag corruption rejects, garbage never throws") {
    val gz = GzipCodec.buildMember(lcg(7, 300))
    def mut(i: Int, v: Int) = { val c = gz.clone(); c(i) = v.toByte; c }
    assert(GzipCodec.members(mut(0, 0x1E), 1 << 20).isEmpty, "magic")
    assert(GzipCodec.members(mut(3, 0x20), 1 << 20).isEmpty, "reserved flag")
    assert(GzipCodec.members(mut(gz.length - 1, gz(gz.length - 1) ^ 1), 1 << 20)
      .isEmpty, "ISIZE")
    assert(GzipCodec.members(mut(gz.length - 8, gz(gz.length - 8) ^ 1), 1 << 20)
      .isEmpty, "CRC32")
    assert(GzipCodec.members(gz.dropRight(3), 1 << 20).isEmpty, "truncated")
    assert(GzipCodec.members(gz, 100).isEmpty, "bomb guard: maxOut undershoot")
    val rnd = new scala.util.Random(8)
    for (_ <- 0 until 200)
      GzipCodec.members(Array.fill(rnd.nextInt(1000))(rnd.nextInt(256).toByte),
        1 << 16)
  }

  // ------------------------------------------------------------- zip

  test("zip: build/entries round-trip and java.util.zip reads our bytes") {
    val files = Seq(("s.txt", lcg(9, 400), false), ("d.bin", lcg(10, 800), true),
      ("empty", Array.emptyByteArray, false))
    val zip = ZipCodec.build(files)
    val es = ZipCodec.entries(zip).getOrElse(fail("rejected own build"))
    assert(es.map(_.name) == files.map(_._1))
    assert(es.map(_.method) == Seq(0, 8, 0))
    files.zip(es).foreach { case ((_, data, _), e) =>
      assert(e.payload.sameElements(data))
      assert(e.uncompressedSize == data.length)
    }
    // independent decoder
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zip))
    files.foreach { case (name, data, _) =>
      val ze = zin.getNextEntry
      assert(ze.getName == name)
      assert(zin.readAllBytes().sameElements(data), s"payload of $name")
    }
    assert(zin.getNextEntry == null)
  }

  test("zip: our walker reads ZipOutputStream output (data-descriptor shape)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    val a = lcg(11, 600); val b = lcg(12, 77)
    zout.putNextEntry(new java.util.zip.ZipEntry("a.dat")) // DEFLATED + descriptor
    zout.write(a); zout.closeEntry()
    val st = new java.util.zip.ZipEntry("b.dat") // STORED: preset sizes
    st.setMethod(java.util.zip.ZipEntry.STORED)
    st.setSize(b.length); st.setCompressedSize(b.length)
    val crc = new java.util.zip.CRC32(); crc.update(b); st.setCrc(crc.getValue)
    zout.putNextEntry(st); zout.write(b); zout.closeEntry()
    zout.close()
    val es = ZipCodec.entries(bos.toByteArray)
      .getOrElse(fail("rejected ZipOutputStream bytes"))
    assert(es.map(_.name) == Seq("a.dat", "b.dat"))
    assert(es(0).method == 8 && es(1).method == 0)
    assert(es(0).payload.sameElements(a) && es(1).payload.sameElements(b))
  }

  test("zip: corruption rejects, garbage never throws") {
    val zip = ZipCodec.build(Seq(("x", lcg(13, 256), true)))
    def mut(i: Int, v: Int) = { val c = zip.clone(); c(i) = v.toByte; c }
    assert(ZipCodec.entries(mut(0, 0)).isEmpty, "local sig")
    assert(ZipCodec.entries(mut(14, zip(14) ^ 1)).isEmpty, "local CRC field")
    assert(ZipCodec.entries(zip.dropRight(1)).isEmpty, "truncated EOCD")
    assert(ZipCodec.entries(zip ++ Array[Byte](0)).isEmpty,
      "EOCD no longer ends the file")
    val rnd = new scala.util.Random(14)
    for (_ <- 0 until 200)
      ZipCodec.entries(Array.fill(rnd.nextInt(1500))(rnd.nextInt(256).toByte))
  }

  // ------------------------------------------------------------ warc

  test("warc: build/records round-trip, multi-record and warc.gz composition") {
    val r1 = WarcCodec.buildRecord("warcinfo", "<urn:uuid:0>",
      "2026-01-01T00:00:00Z", None, lcg(15, 40))
    val r2 = WarcCodec.buildRecord("response", "<urn:uuid:1>",
      "2026-01-01T00:00:01Z", Some("http://example.com/a"), lcg(16, 321))
    val rs = WarcCodec.records(r1 ++ r2).getOrElse(fail("rejected own build"))
    assert(rs.map(_.warcType) == Seq("warcinfo", "response"))
    assert(rs(1).targetUri.contains("http://example.com/a"))
    assert(rs(1).contentLength == 321 && rs(1).payload.sameElements(lcg(16, 321)))
    assert(rs(1).offset == r1.length)
    // the Common Crawl carriage: one gzip member per record
    val wgz = GzipCodec.buildMember(r1) ++ GzipCodec.buildMember(r2)
    val ms = GzipCodec.members(wgz, 1 << 20).get
    assert(ms.length == 2)
    ms.zip(Seq(r1, r2)).foreach { case (m, r) =>
      val rec = WarcCodec.records(m.payload).get
      assert(rec.length == 1 && (m.payload.sameElements(r)))
    }
  }

  test("warc: structural violations reject, garbage never throws") {
    val ok = WarcCodec.buildRecord("response", "<urn:uuid:2>",
      "2026-01-01T00:00:02Z", None, lcg(17, 64))
    def mut(i: Int, v: Int) = { val c = ok.clone(); c(i) = v.toByte; c }
    assert(WarcCodec.records(mut(5, '2')).isEmpty, "version line")
    assert(WarcCodec.records(ok.dropRight(1)).isEmpty, "separator")
    assert(WarcCodec.records(ok.dropRight(5)).isEmpty, "short body")
    // strip the Content-Length header entirely: mandatory field missing
    val text = new String(ok, "ISO-8859-1")
    val noLen = text.replaceFirst("Content-Length: \\d+\r\n", "")
    assert(WarcCodec.records(noLen.getBytes("ISO-8859-1")).isEmpty)
    val rnd = new scala.util.Random(18)
    for (_ <- 0 until 200)
      WarcCodec.records(Array.fill(rnd.nextInt(800))(rnd.nextInt(256).toByte))
  }
}
