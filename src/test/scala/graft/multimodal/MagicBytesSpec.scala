package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** MagicBytes contract: the WHATWG-core signature table, the HTML
  * prescan, and the §7.1 binary-data-byte fallback boundary.
  */
class MagicBytesSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("image/audio/archive signatures") {
    assert(MagicBytes.sniffMime(
      b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 1)) == "image/png")
    assert(MagicBytes.sniffMime(b(0xFF, 0xD8, 0xFF, 0xE0)) == "image/jpeg")
    assert(MagicBytes.sniffMime("GIF89a....".getBytes("ISO-8859-1")) ==
      "image/gif")
    assert(MagicBytes.sniffMime("GIF87a".getBytes("ISO-8859-1")) ==
      "image/gif")
    assert(MagicBytes.sniffMime("BM8888".getBytes("ISO-8859-1")) ==
      "image/bmp")
    assert(MagicBytes.sniffMime("%PDF-1.7\n".getBytes("ISO-8859-1")) ==
      "application/pdf")
    assert(MagicBytes.sniffMime(b('P', 'K', 3, 4, 0)) == "application/zip")
    assert(MagicBytes.sniffMime(b(0x1F, 0x8B, 8)) == "application/gzip")
    assert(MagicBytes.sniffMime("fLaC0000".getBytes("ISO-8859-1")) ==
      "audio/flac")
    assert(MagicBytes.sniffMime("OggS....".getBytes("ISO-8859-1")) ==
      "application/ogg")
    assert(MagicBytes.sniffMime("RIFFxxxxWEBP".getBytes("ISO-8859-1")) ==
      "image/webp")
    assert(MagicBytes.sniffMime("RIFFxxxxWAVE".getBytes("ISO-8859-1")) ==
      "audio/wav")
    assert(MagicBytes.sniffMime("RIFFxxxxAVI ".getBytes("ISO-8859-1")) ==
      "video/x-msvideo")
    // a truncated RIFF (no kind) falls through to the text branch
    assert(MagicBytes.sniffMime("RIFFxxx".getBytes("ISO-8859-1")) ==
      "text/plain")
  }

  test("HTML prescan: whitespace skip, doctype, tags, comments, xml") {
    assert(MagicBytes.sniffMime(
      "  \r\n<!DOCTYPE HTML><html>".getBytes("ISO-8859-1")) == "text/html")
    assert(MagicBytes.sniffMime("<HTML>".getBytes("ISO-8859-1")) ==
      "text/html")
    assert(MagicBytes.sniffMime("<body><p>x".getBytes("ISO-8859-1")) ==
      "text/html")
    assert(MagicBytes.sniffMime("<!-- c --><p>".getBytes("ISO-8859-1")) ==
      "text/html")
    assert(MagicBytes.sniffMime(
      "<?xml version=\"1.0\"?><u/>".getBytes("ISO-8859-1")) == "text/xml")
    // an unknown tag is NOT html by prescan: plain text
    assert(MagicBytes.sniffMime("<custom>".getBytes("ISO-8859-1")) ==
      "text/plain")
  }

  test("binary-data-byte fallback boundary (WHATWG §7.1)") {
    assert(MagicBytes.sniffMime("plain words".getBytes("ISO-8859-1")) ==
      "text/plain")
    // \t \n \r \f (0x0C) and ESC (0x1B) are NOT binary bytes
    assert(MagicBytes.sniffMime(b('a', 0x09, 0x0A, 0x0D, 0x0C, 0x1B, 'z')) ==
      "text/plain")
    // NUL, 0x0B, 0x0E, 0x1C are
    assert(MagicBytes.sniffMime(b('a', 0x00, 'z')) ==
      "application/octet-stream")
    assert(MagicBytes.sniffMime(b('a', 0x0B)) == "application/octet-stream")
    assert(MagicBytes.sniffMime(b('a', 0x0E)) == "application/octet-stream")
    assert(MagicBytes.sniffMime(b('a', 0x1C)) == "application/octet-stream")
    assert(MagicBytes.sniffMime(Array.emptyByteArray) ==
      "application/octet-stream")
  }

  test("contentType essence extraction (parameters, case, anchoring)") {
    import graft.text.HtmlOps
    assert(HtmlOps.contentType(
      "HTTP/1.1 200 OK\r\nContent-Type: TEXT/HTML; Charset=UTF-8")
      .contains("text/html"))
    assert(HtmlOps.contentType(
      "HTTP/1.1 200 OK\r\ncontent-type:\timage/png").contains("image/png"))
    assert(HtmlOps.contentType(
      "HTTP/1.1 200 OK\r\nX-Content-Type: image/png").isEmpty)
    assert(HtmlOps.contentType("HTTP/1.1 200 OK\r\nContent-Type: ").isEmpty)
    assert(HtmlOps.contentType("HTTP/1.1 200 OK\r\nA: b").isEmpty)
  }
}
