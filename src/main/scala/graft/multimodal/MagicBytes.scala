package graft.multimodal

/** Magic-byte MIME sniffing — the routing step a multimodal corpus
  * pipeline runs on every fetched payload, because declared
  * `Content-Type` headers lie at a steady few-percent rate on the real
  * web (mislabeled images, HTML error pages under image types,
  * binaries under text/plain). Signature table is the byte-pattern
  * core of the WHATWG MIME Sniffing Standard (§6.1 image types, §6.2
  * audio/video, §7.1 binary-data bytes) plus the archive magics the
  * engine's own codecs validate in full; sniffing here is
  * prefix-match only — deep validation belongs to the per-format
  * codec walks.
  *
  * Returned types are normalized lowercase essence strings (no
  * parameters). Unknown content falls to `text/plain` when it contains
  * no WHATWG binary-data byte (0x00–0x08, 0x0B, 0x0E–0x1A, 0x1C–0x1F)
  * and `application/octet-stream` otherwise.
  */
object MagicBytes {

  private def startsWith(b: Array[Byte], sig: Int*): Boolean =
    b.length >= sig.length && sig.indices.forall(i => (b(i) & 0xFF) == sig(i))

  private def asciiPrefix(b: Array[Byte], n: Int): String =
    new String(b, 0, math.min(n, b.length),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** WHATWG §7.1 binary data byte. */
  private def binaryByte(x: Byte): Boolean = {
    val v = x & 0xFF
    v <= 0x08 || v == 0x0B || (v >= 0x0E && v <= 0x1A) ||
      (v >= 0x1C && v <= 0x1F)
  }

  /** Sniff the MIME essence of `b` by signature (see object doc). */
  def sniffMime(b: Array[Byte]): String = {
    if (b.isEmpty) return "application/octet-stream"
    if (startsWith(b, 0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
      return "image/png"
    if (startsWith(b, 0xFF, 0xD8, 0xFF)) return "image/jpeg"
    val a = asciiPrefix(b, 16)
    if (a.startsWith("GIF87a") || a.startsWith("GIF89a")) return "image/gif"
    if (a.startsWith("BM")) return "image/bmp"
    if (a.startsWith("%PDF-")) return "application/pdf"
    if (startsWith(b, 'P', 'K', 0x03, 0x04)) return "application/zip"
    if (startsWith(b, 0x1F, 0x8B)) return "application/gzip"
    if (a.startsWith("fLaC")) return "audio/flac"
    if (a.startsWith("OggS")) return "application/ogg"
    if (a.startsWith("RIFF") && b.length >= 12) {
      val kind = asciiPrefix(b, 12).substring(8)
      if (kind == "WEBP") return "image/webp"
      if (kind == "WAVE") return "audio/wav"
      if (kind == "AVI ") return "video/x-msvideo"
    }
    // HTML prescan: optional whitespace, then a doctype or a known tag
    // opener (the WHATWG §6.3 table's most common rows)
    val t = asciiPrefix(b, 64)
    var i = 0
    while (i < t.length && (t.charAt(i) == ' ' || t.charAt(i) == '\t' ||
      t.charAt(i) == '\r' || t.charAt(i) == '\n')) i += 1
    val low = t.substring(i).toLowerCase(java.util.Locale.ROOT)
    if (low.startsWith("<!doctype html") || low.startsWith("<html") ||
      low.startsWith("<head") || low.startsWith("<body") ||
      low.startsWith("<script") || low.startsWith("<!--"))
      return "text/html"
    if (low.startsWith("<?xml")) return "text/xml"
    // WHATWG sniffing inspects only the resource header (first 1445
    // bytes) — a stray control byte deep inside a large text body must
    // not flip it to octet-stream, and unknown payloads stay O(1)
    if (b.iterator.take(1445).exists(binaryByte)) "application/octet-stream"
    else "text/plain"
  }
}
