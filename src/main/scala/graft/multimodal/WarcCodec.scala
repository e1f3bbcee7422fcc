package graft.multimodal

/** WARC/1.0 (ISO 28500) record walker — the Web ARChive format every
  * large-scale crawl corpus ships in (Common Crawl publishes ~100 TB of
  * it per snapshot). A record is: the version line `WARC/1.0\r\n`,
  * `Name: value\r\n` header lines to an empty `\r\n` line (mandatory
  * here: WARC-Type, WARC-Record-ID, WARC-Date, Content-Length), exactly
  * Content-Length block bytes, and the `\r\n\r\n` record separator.
  * `records` walks one decompressed stream strictly to the end;
  * `buildRecord` emits the deterministic fixtures. The production
  * carriage — one gzip MEMBER per record, `.warc.gz` — composes with
  * [[GzipCodec.members]]; that is exactly Common Crawl's layout (member
  * boundaries are the record index).
  *
  * Strict and total: missing version line, malformed header, missing
  * mandatory field, short body, or a broken separator → None.
  */
object WarcCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  /** `refersTo`/`payloadDigest` carry the ISO 28500 §6.7 revisit
    * linkage (WARC-Refers-To, WARC-Payload-Digest) — how a crawl marks
    * "same payload as an earlier capture" without re-storing the body
    * (Common Crawl's identical-payload-digest convention). Trailing
    * defaults keep the older 6-field construction sites source-stable.
    */
  final case class Record(
      offset: Int,
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      contentLength: Int,
      payload: Array[Byte],
      refersTo: Option[String] = None,
      payloadDigest: Option[String] = None)

  private val Version = "WARC/1.0\r\n".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)

  private def lineEnd(b: Array[Byte], off: Int): Int = {
    var i = off
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    if (i + 1 >= b.length) fail()
    i
  }

  /** Strict whole-stream walk (a decompressed WARC file, or one gzip
    * member's payload = one record in the `.warc.gz` convention).
    */
  def records(bytes: Array[Byte]): Option[Seq[Record]] =
    try {
      val out = Seq.newBuilder[Record]
      var off = 0
      while (off < bytes.length) {
        val start = off
        // version line
        if (off + Version.length > bytes.length) fail()
        var k = 0
        while (k < Version.length) {
          if (bytes(off + k) != Version(k)) fail()
          k += 1
        }
        off += Version.length
        // header block to the empty line
        var warcType: String = null
        var recordId: String = null
        var date: String = null
        var uri: Option[String] = None
        var refersTo: Option[String] = None
        var digest: Option[String] = None
        var len = -1
        var done = false
        while (!done) {
          val e = lineEnd(bytes, off)
          if (e == off) { done = true; off += 2 }
          else {
            val line = new String(bytes, off, e - off,
              java.nio.charset.StandardCharsets.UTF_8)
            val c = line.indexOf(':')
            if (c <= 0) fail()
            val name = line.substring(0, c).trim
            val value = line.substring(c + 1).trim
            name.toLowerCase match {
              case "warc-type" => warcType = value
              case "warc-record-id" => recordId = value
              case "warc-date" => date = value
              case "warc-target-uri" => uri = Some(value)
              case "warc-refers-to" => refersTo = Some(value)
              case "warc-payload-digest" => digest = Some(value)
              case "content-length" =>
                if (!value.forall(_.isDigit) || value.isEmpty ||
                  value.length > 9) fail()
                len = value.toInt
              case _ => () // other headers: tolerated, not interpreted
            }
            off = e + 2
          }
        }
        if (warcType == null || recordId == null || date == null || len < 0)
          fail()
        if (off + len + 4 > bytes.length) fail()
        val payload = java.util.Arrays.copyOfRange(bytes, off, off + len)
        off += len
        // record separator: two CRLF
        if (bytes(off) != '\r' || bytes(off + 1) != '\n' ||
          bytes(off + 2) != '\r' || bytes(off + 3) != '\n') fail()
        off += 4
        out += Record(start, warcType, recordId, uri, len, payload,
          refersTo, digest)
      }
      Some(out.result())
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  /** One deterministic record (header order fixed, ISO-8601 date from
    * the caller so fixtures stay byte-stable).
    */
  def buildRecord(warcType: String, recordId: String, date: String,
      targetUri: Option[String], payload: Array[Byte],
      refersTo: Option[String] = None,
      payloadDigest: Option[String] = None): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    sb.append("WARC-Date: ").append(date).append("\r\n")
    targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append("\r\n"))
    refersTo.foreach(r => sb.append("WARC-Refers-To: ").append(r).append("\r\n"))
    payloadDigest.foreach(d =>
      sb.append("WARC-Payload-Digest: ").append(d).append("\r\n"))
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }
}
