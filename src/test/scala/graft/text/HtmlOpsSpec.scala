package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HtmlOps contract: the column-expression stripper equals an
  * INDEPENDENT driver-side character scanner (hand-rolled state walker
  * — raw/tag/script/style/comment states, entity decode, whitespace
  * collapse — sharing nothing with the regex chain), across hand-picked
  * trap cases and a randomized HTML generator. The round-11 entity
  * decoder (numeric charrefs + the six-name table, one left-to-right
  * pass) is mirrored here by a STRUCTURALLY different implementation —
  * a java.util.regex find/appendReplacement loop vs the expression's
  * char walk — plus charset-sniff and HTTP-split unit contracts.
  */
class HtmlOpsSpec extends SparkSpec {

  /** Independent entity decoder: one regex pass, replacements never
    * re-scanned (Matcher.appendReplacement semantics) — same spec as
    * HtmlEntityExpression, different machinery.
    */
  private def referenceDecode(s: String): String = {
    val m = java.util.regex.Pattern
      .compile("&(#[xX]?[0-9a-fA-F]+|[A-Za-z]{1,5});").matcher(s)
    val sb = new StringBuffer
    while (m.find()) {
      val body = m.group(1)
      val rep: String =
        if (body.startsWith("#")) {
          val hex = body.length > 1 && (body(1) == 'x' || body(1) == 'X')
          val digits = if (hex) body.drop(2) else body.drop(1)
          if (digits.isEmpty || (!hex && !digits.forall(_.isDigit)) ||
            (hex && digits.length > 6) || (!hex && digits.length > 7)) null
          else {
            val cp = java.lang.Long.parseLong(digits, if (hex) 16 else 10)
            if (cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
              new String(Character.toChars(cp.toInt))
            else null
          }
        } else Map("amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
          "apos" -> "'", "nbsp" -> "\u00A0").getOrElse(body, null)
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        if (rep == null) m.group(0) else rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** Independent scanner: single pass, explicit states. */
  private def referenceStrip(html: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = html.length
    def startsAt(s: String, p: Int): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    while (i < n) {
      if (startsAt("<script", i)) {
        val close = html.toLowerCase.indexOf("</script>", i)
        out.append(' ')
        i = if (close < 0) n else close + 9
      } else if (startsAt("<style", i)) {
        val close = html.toLowerCase.indexOf("</style>", i)
        out.append(' ')
        i = if (close < 0) n else close + 8
      } else if (startsAt("<!--", i)) {
        val close = html.indexOf("-->", i)
        out.append(' ')
        i = if (close < 0) n else close + 3
      } else if (html(i) == '<') {
        val close = html.indexOf('>', i)
        out.append(' ')
        i = if (close < 0) n else close + 1
      } else {
        out.append(html(i))
        i += 1
      }
    }
    referenceDecode(out.toString).split("\\s+").filter(_.nonEmpty)
      .mkString(" ")
  }

  private def sparkStrip(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(HtmlOps.stripHtml(col("h"))).collect()(0).getString(0)
  }

  test("hand-picked traps: script-embedded tags, entities, attribute noise") {
    val cases = Seq(
      """<p>plain</p>""",
      """<script>if (1 < 2) { x = "<p>leak</p>"; }</script>after""",
      """<style media="x">p > a { content: "<b>"; }</style>text""",
      """a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;""",
      """&amp;lt; stays entity-of-entity""",
      """<!-- <p>commented</p> -->visible""",
      // documented naive-attr limitation: a quoted '>' ends the tag early
      // in BOTH strippers (regex and scanner agree on the leak, so the
      // differential still binds); real crawl pipelines absorb this in
      // the downstream quality gates
      """<div class="a > b">attr with gt</div>""",
      """<p>multi
        |line   spaces</p>""".stripMargin,
      """no markup at all""",
      """<SCRIPT>UPPER</SCRIPT>case<P>tags</P>""",
      // round-11 charref traps
      """caf&#233; vs caf&#xE9; vs caf&#XE9; are all café""",
      """a&nbsp;b keeps U+00A0; &nbsp bare stays literal""",
      """&#0; &#x110000; &#xD800; &#99999999; invalid charrefs stay""",
      """&apos;quoted&apos; &unknown; &AMP; &amp;#65; never double-decodes""",
      """mixed &#72;&#x65;llo and &lt;&#47;p&gt; assemble as text""")
    cases.foreach { html =>
      assert(sparkStrip(html) == referenceStrip(html), s"mismatch on: $html")
    }
    // absolute anchors (not just implementation agreement)
    assert(sparkStrip("caf&#233;") == "café")
    assert(sparkStrip("a&nbsp;b c") == "a b c")
    assert(sparkStrip("&amp;lt;") == "&lt;")
    assert(sparkStrip("&#x1F600;") == new String(Character.toChars(0x1F600)))
  }

  test("httpParse: strict HTTP message framing, status code extracted") {
    val body = "café".getBytes("UTF-8")
    val msg = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=UTF-8\r\nServer: x\r\n\r\n").getBytes("ISO-8859-1") ++ body
    val m = HtmlOps.httpParse(msg).getOrElse(fail("rejected"))
    assert(m.status == 200)
    assert(m.headers.startsWith("HTTP/1.1 200 OK"))
    assert(m.headers.contains("charset=UTF-8") &&
      !m.headers.contains("Server: x\r\n\r\n"))
    assert(m.body.sameElements(body))
    // non-200 statuses parse (the CONSUMER filters; the parser reports)
    assert(HtmlOps.httpParse(
      "HTTP/1.1 404 Not Found\r\nA: b\r\n\r\nnope".getBytes("UTF-8"))
      .map(_.status).contains(404))
    assert(HtmlOps.httpParse(
      "HTTP/1.0 301 Moved Permanently\r\nLocation: /x\r\n\r\n"
        .getBytes("UTF-8")).map(_.status).contains(301))
    assert(HtmlOps.httpParse("<html>no http</html>".getBytes("UTF-8")).isEmpty)
    assert(HtmlOps.httpParse(
      "HTTP/1.1 200 OK\r\nno separator".getBytes("UTF-8")).isEmpty)
    assert(HtmlOps.httpParse(Array.emptyByteArray).isEmpty)
    // malformed status line (no 3-digit code) is rejected
    assert(HtmlOps.httpParse("HTTP/1.1 OK\r\n\r\nx".getBytes("UTF-8")).isEmpty)
  }

  test("httpParse: chunked transfer framing removed, hand-assembled") {
    def chunked(headers: String, chunks: Seq[Array[Byte]],
        trailer: String = ""): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(headers.getBytes("ISO-8859-1"))
      chunks.foreach { c =>
        out.write(s"${c.length.toHexString}\r\n".getBytes("ISO-8859-1"))
        out.write(c)
        out.write("\r\n".getBytes("ISO-8859-1"))
      }
      out.write(s"0\r\n$trailer\r\n".getBytes("ISO-8859-1"))
      out.toByteArray
    }
    val h = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    val parts = Seq("<html><p>hello ".getBytes("UTF-8"),
      "wörld</p>".getBytes("UTF-8"), "</html>".getBytes("UTF-8"))
    val m = HtmlOps.httpParse(chunked(h, parts)).getOrElse(fail("rejected"))
    assert(m.body.sameElements(parts.reduce(_ ++ _)))
    // uppercase hex sizes and chunk extensions are fine
    val ext = (h + "A;name=v\r\n0123456789\r\n0\r\n\r\n").getBytes("ISO-8859-1")
    assert(HtmlOps.httpParse(ext).get.body.sameElements(
      "0123456789".getBytes("UTF-8")))
    // identity framing untouched: the SAME body bytes without the header
    val ident = ("HTTP/1.1 200 OK\r\nA: b\r\n\r\n5\r\nhello\r\n0\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(new String(HtmlOps.httpParse(ident).get.body, "UTF-8")
      .startsWith("5\r\nhello")) // no TE header -> chunk lines are body
    // malformed framings are rejected, not silently passed through
    assert(HtmlOps.httpParse((h + "zz\r\nx\r\n0\r\n\r\n")
      .getBytes("ISO-8859-1")).isEmpty) // non-hex size
    assert(HtmlOps.httpParse((h + "5\r\nhi\r\n0\r\n\r\n")
      .getBytes("ISO-8859-1")).isEmpty) // truncated chunk
    assert(HtmlOps.httpParse((h + "2\r\nhi??\r\n0\r\n\r\n")
      .getBytes("ISO-8859-1")).isEmpty) // missing CRLF after data
    assert(HtmlOps.httpParse((h + "3\r\nabc\r\n")
      .getBytes("ISO-8859-1")).isEmpty) // no terminating 0-chunk
  }

  test("httpParse: Content-Encoding gzip decoded, chunked+gzip in RFC " +
    "wire order, corrupt gzip rejected") {
    val html = "<html><p>gzip wörld</p></html>".getBytes("UTF-8")
    val gz = graft.multimodal.GzipCodec.buildMember(html)
    val ge = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes("ISO-8859-1") ++ gz
    assert(HtmlOps.httpParse(ge).get.body.sameElements(html))
    // compound: gzip innermost, chunked outermost (RFC 9110/9112)
    val out = new java.io.ByteArrayOutputStream()
    out.write(("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n").getBytes("ISO-8859-1"))
    var off = 0
    while (off < gz.length) {
      val n = math.min(7, gz.length - off)
      out.write(s"${n.toHexString}\r\n".getBytes("ISO-8859-1"))
      out.write(gz, off, n)
      out.write("\r\n".getBytes("ISO-8859-1"))
      off += n
    }
    out.write("0\r\n\r\n".getBytes("ISO-8859-1"))
    assert(HtmlOps.httpParse(out.toByteArray).get.body.sameElements(html))
    // corrupt gzip (flipped byte in the deflate body) → rejected
    val bad = ge.clone()
    bad(bad.length - 12) = (bad(bad.length - 12) ^ 0x5A).toByte
    assert(HtmlOps.httpParse(bad).isEmpty)
    // a gzip HEADER that isn't one → rejected
    assert(HtmlOps.httpParse(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip")
        .getBytes("ISO-8859-1")).isEmpty)
  }

  test("httpParse: leading-zero chunk sizes and BWS before the " +
    "extension are legal framing") {
    val h = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    // zero-padded size past the 8-digit significant cap (RFC 9112
    // places no limit on leading zeros)
    val padded = (h + "000000000A\r\n0123456789\r\n0\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(HtmlOps.httpParse(padded).get.body.sameElements(
      "0123456789".getBytes("UTF-8")))
    // BWS between size and extension, and before the bare CRLF
    val bws = (h + "5 ;x=y\r\nhello\r\n3\t\r\nabc\r\n000 \r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(HtmlOps.httpParse(bws).get.body.sameElements(
      "helloabc".getBytes("UTF-8")))
    // >8 SIGNIFICANT hex digits is still an oversized-size rejection
    assert(HtmlOps.httpParse((h + "123456789A\r\nx\r\n0\r\n\r\n")
      .getBytes("ISO-8859-1")).isEmpty)
  }

  test("httpParse: header-name matching anchors at line start") {
    // a header whose NAME merely ends with the field name must not
    // trigger de-chunking/decoding of an identity body
    val m = HtmlOps.httpParse(
      ("HTTP/1.1 200 OK\r\nX-Orig-Transfer-Encoding: chunked\r\n" +
        "X-Orig-Content-Encoding: gzip\r\n\r\nplain body")
        .getBytes("ISO-8859-1")).getOrElse(fail("rejected"))
    assert(new String(m.body, "UTF-8") == "plain body")
  }

  test("httpParse: deflate content coding decodes (zlib and raw), " +
    "unknown codings reject the record") {
    val html = "<html><p>deflate wörld</p></html>".getBytes("UTF-8")
    def deflated(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(html); d.finish()
      val buf = new Array[Byte](html.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def msg(ce: String, body: Array[Byte]) =
      (s"HTTP/1.1 200 OK\r\nContent-Encoding: $ce\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
    // zlib-wrapped (the RFC 9110 §8.4.1.2 letter)
    assert(HtmlOps.httpParse(msg("deflate", deflated(raw = false)))
      .get.body.sameElements(html))
    // raw DEFLATE (the misconfigured-server reality)
    assert(HtmlOps.httpParse(msg("deflate", deflated(raw = true)))
      .get.body.sameElements(html))
    // zlib with a corrupted Adler trailer falls to the raw attempt,
    // which also fails on the zlib header bytes → rejected
    val corrupt = deflated(raw = false)
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x5A).toByte
    assert(HtmlOps.httpParse(msg("deflate", corrupt)).isEmpty)
    // unknown codings (br, zstd) skip the record — coded bytes must
    // never flow downstream as text
    assert(HtmlOps.httpParse(msg("br", html)).isEmpty)
    assert(HtmlOps.httpParse(msg("zstd", html)).isEmpty)
    // identity is a no-op; coding LISTS undo in reverse order
    assert(HtmlOps.httpParse(msg("identity", html)).get.body
      .sameElements(html))
    val gzThenDeflate = { // applied gzip first, then deflate outermost
      val d = new java.util.zip.Deflater()
      val gz = graft.multimodal.GzipCodec.buildMember(html)
      d.setInput(gz); d.finish()
      val buf = new Array[Byte](gz.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    assert(HtmlOps.httpParse(msg("gzip, deflate", gzThenDeflate))
      .get.body.sameElements(html))
  }

  test("httpParse: multi-member gzip bodies concatenate") {
    val a = "first ".getBytes("UTF-8")
    val b = "second".getBytes("UTF-8")
    val body = graft.multimodal.GzipCodec.buildMember(a) ++
      graft.multimodal.GzipCodec.buildMember(b)
    val m = HtmlOps.httpParse(
      "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        .getBytes("ISO-8859-1") ++ body).getOrElse(fail("rejected"))
    assert(new String(m.body, "UTF-8") == "first second")
  }

  test("location: anchored Location header extraction") {
    assert(HtmlOps.location(
      "HTTP/1.1 301 Moved\r\nLocation: http://a.example/x\r\nA: b")
      .contains("http://a.example/x"))
    assert(HtmlOps.location(
      "HTTP/1.1 301 Moved\r\nlocation:\thttp://a.example/y")
      .contains("http://a.example/y"))
    // a name merely ending in "location" must not match
    assert(HtmlOps.location(
      "HTTP/1.1 200 OK\r\nX-Original-Location: http://a.example/z").isEmpty)
    assert(HtmlOps.location("HTTP/1.1 301 Moved\r\nLocation: ").isEmpty)
    assert(HtmlOps.location("HTTP/1.1 200 OK\r\nA: b").isEmpty)
  }

  test("canonicalLink: rel token-list, attr order, quote styles, " +
    "first-wins, alternate-only ignored") {
    assert(HtmlOps.canonicalLink(
      """<html><head><link rel="canonical" href="/c"></head></html>""")
      .contains("/c"))
    // reversed attribute order + single quotes
    assert(HtmlOps.canonicalLink(
      """<link href='/c2' rel='canonical'>""").contains("/c2"))
    // rel is a space-separated token list
    assert(HtmlOps.canonicalLink(
      """<link rel="alternate canonical" href="/c3">""").contains("/c3"))
    // case-insensitive tag and rel value
    assert(HtmlOps.canonicalLink(
      """<LINK REL="Canonical" HREF="/c4">""").contains("/c4"))
    // first declaring tag wins
    assert(HtmlOps.canonicalLink(
      """<link rel="canonical" href="/first">""" +
        """<link rel="canonical" href="/second">""").contains("/first"))
    // alternate-only, missing href, or empty href: no declaration
    assert(HtmlOps.canonicalLink(
      """<link rel="alternate" href="/alt">""").isEmpty)
    assert(HtmlOps.canonicalLink("""<link rel="canonical">""").isEmpty)
    assert(HtmlOps.canonicalLink(
      """<link rel="canonical" href="">""").isEmpty)
    // "canonical" as a SUBSTRING of another token must not match
    assert(HtmlOps.canonicalLink(
      """<link rel="noncanonical" href="/x">""").isEmpty)
    // HTML5-legal UNQUOTED attribute values
    assert(HtmlOps.canonicalLink(
      """<link rel=canonical href=/u1>""").contains("/u1"))
    assert(HtmlOps.canonicalLink(
      """<link href=/u2 rel=canonical >""").contains("/u2"))
    // a dashed attribute NAME must not satisfy the lookup
    assert(HtmlOps.canonicalLink(
      """<link rel="canonical" data-href="/wrong">""").isEmpty)
  }

  test("hreflangLinks: alternate token list, all pairs in order, " +
    "feed links without hreflang skipped") {
    val html =
      """<html><head>
        |<link rel="alternate" hreflang="en" href="/en/p">
        |<link hreflang='fr' rel='alternate' href='/fr/p'>
        |<link rel="alternate stylesheet" hreflang="de" href="/de/p">
        |<link rel="alternate" type="application/rss+xml" href="/feed">
        |<link rel="canonical" href="/c">
        |<link rel="alternate" hreflang="x-default" href="/p">
        |</head></html>""".stripMargin
    assert(HtmlOps.hreflangLinks(html) == Seq(
      ("en", "/en/p"), ("fr", "/fr/p"), ("de", "/de/p"),
      ("x-default", "/p")))
    assert(HtmlOps.hreflangLinks("<html><body>x</body></html>").isEmpty)
  }

  test("baseHref: first base wins, quote styles, absent") {
    assert(HtmlOps.baseHref(
      """<html><head><base href="/sub/"><base href="/late/"></head>""")
      .contains("/sub/"))
    assert(HtmlOps.baseHref("""<base target=_top href='/b/'>""")
      .contains("/b/"))
    assert(HtmlOps.baseHref("""<base target="_top">""").isEmpty)
    assert(HtmlOps.baseHref("<html><head></head></html>").isEmpty)
  }

  test("linkHeaderCanonical: RFC 8288 link-values, decoys, quoting, " +
    "multiple Link lines, anchored name") {
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nLink: <http://a/c>; rel=\"canonical\"")
      .contains("http://a/c"))
    // unquoted rel + a decoy first link-value
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nLink: </pre>; rel=preload, </c>; rel=canonical")
      .contains("/c"))
    // rel token list inside one quoted value
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nLink: </c>; rel=\"alternate canonical\"")
      .contains("/c"))
    // second Link header line carries the canonical
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nLink: </n>; rel=next\r\nlink: </c>; rel=canonical")
      .contains("/c"))
    // a header name merely ending in "link" must not match
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nX-Link: </c>; rel=canonical").isEmpty)
    // no canonical rel anywhere
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nLink: </n>; rel=next").isEmpty)
    // a non-rel param whose QUOTED VALUE contains "rel=canonical" must
    // not false-positive (params are tokenized, not regex-searched)
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nLink: </x>; title=\"rel=canonical\"").isEmpty)
    // a quoted param value containing a comma must not truncate the
    // link-value before its rel param
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nLink: </c>; title=\"a,b\"; rel=canonical")
      .contains("/c"))
    // RFC 8288 §3.3: only the FIRST rel param of a link-value counts
    assert(HtmlOps.linkHeaderCanonical(
      "HTTP/1.1 200 OK\r\nLink: </c>; rel=next; rel=canonical").isEmpty)
  }

  test("retryAfter/httpDate: delta and HTTP-date forms, junk fails " +
    "open, anchored names") {
    val dated = "HTTP/1.1 503 Service Unavailable\r\n" +
      "Date: Thu, 01 Jan 2026 00:00:00 GMT\r\n" +
      "Retry-After: Thu, 01 Jan 2026 00:02:03 GMT"
    val d = HtmlOps.httpDate(dated)
    val ra = HtmlOps.retryAfter(dated)
    assert(d.isDefined && ra.exists(_.isRight))
    assert(ra.get.toOption.get - d.get == 123L,
      "date-form Retry-After is relative to the response Date")
    assert(HtmlOps.retryAfter(
      "HTTP/1.1 429 Too Many Requests\r\nRetry-After: 120")
      .contains(Left(120L)))
    assert(HtmlOps.retryAfter(
      "HTTP/1.1 429 Too Many Requests\r\nretry-after:\t0")
      .contains(Left(0L)))
    // junk, empty, absent, and non-anchored names all yield None
    assert(HtmlOps.retryAfter(
      "HTTP/1.1 429 x\r\nRetry-After: soon").isEmpty)
    assert(HtmlOps.retryAfter("HTTP/1.1 429 x\r\nRetry-After: ").isEmpty)
    assert(HtmlOps.retryAfter("HTTP/1.1 429 x\r\nA: b").isEmpty)
    assert(HtmlOps.retryAfter(
      "HTTP/1.1 429 x\r\nX-Retry-After: 9").isEmpty)
    assert(HtmlOps.httpDate(
      "HTTP/1.1 200 OK\r\nX-Date: Thu, 01 Jan 2026 00:00:00 GMT").isEmpty)
  }

  test("etag/lastModified: anchored validator extraction, weak forms " +
    "and case-insensitive names included") {
    val h = "HTTP/1.1 200 OK\r\nETag: \"abc\"\r\n" +
      "Last-Modified: Thu, 01 Jan 2026 00:00:00 GMT\r\nA: b"
    assert(HtmlOps.etag(h).contains("\"abc\""))
    assert(HtmlOps.lastModified(h)
      .contains("Thu, 01 Jan 2026 00:00:00 GMT"))
    // weak validators are still validators; field names any case
    assert(HtmlOps.etag("HTTP/1.1 200 OK\r\netag: W/\"x\"")
      .contains("W/\"x\""))
    assert(HtmlOps.lastModified("HTTP/1.1 200 OK\r\nLAST-MODIFIED: t")
      .contains("t"))
    // names merely ending in the field name must not match
    assert(HtmlOps.etag("HTTP/1.1 200 OK\r\nX-Orig-ETag: \"z\"").isEmpty)
    assert(HtmlOps.lastModified(
      "HTTP/1.1 200 OK\r\nX-Last-Modified: t").isEmpty)
    assert(HtmlOps.etag("HTTP/1.1 200 OK\r\nETag: ").isEmpty)
  }

  test("sniffCharset: any JVM-known IANA name is honored; unknown " +
    "falls to UTF-8") {
    def cs(h: String) = HtmlOps.sniffCharset(h, Array.emptyByteArray).name()
    assert(cs("Content-Type: text/html; charset=Shift_JIS") == "Shift_JIS")
    assert(cs("Content-Type: text/html; charset=GBK") == "GBK")
    assert(cs("Content-Type: text/html; charset=EUC-KR") == "EUC-KR")
    assert(cs("Content-Type: text/html; charset=KOI8-R") == "KOI8-R")
    assert(cs("Content-Type: text/html; charset=klingon") == "UTF-8")
    // a Shift_JIS body decodes correctly only under the honored name
    val sj = "こんにちは".getBytes("Shift_JIS")
    assert(new String(sj, HtmlOps.sniffCharset(
      "Content-Type: text/html; charset=Shift_JIS", sj)) == "こんにちは")
  }

  test("sniffCharset: header beats meta beats UTF-8 default") {
    def cs(h: String, body: String) =
      HtmlOps.sniffCharset(h, body.getBytes("ISO-8859-1")).name()
    assert(cs("Content-Type: text/html; charset=ISO-8859-1", "<html>") == "ISO-8859-1")
    assert(cs("Content-Type: text/html; charset=\"utf-8\"", "<html>") == "UTF-8")
    assert(cs("Content-Type: text/html",
      """<html><head><meta charset="iso-8859-1"></head>""") == "ISO-8859-1")
    assert(cs("Content-Type: text/html",
      """<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">""") == "windows-1252")
    // header wins over a conflicting meta
    assert(cs("Content-Type: text/html; charset=utf-8",
      """<meta charset="iso-8859-1">""") == "UTF-8")
    assert(cs("Content-Type: text/html", "<html>plain") == "UTF-8")
    assert(cs("Content-Type: text/html; charset=klingon", "x") == "UTF-8")
    // decode reality check: the same bytes read differently per sniff
    val eacute = Array(0xE9.toByte)
    assert(new String(eacute, HtmlOps.sniffCharset(
      "Content-Type: text/html; charset=ISO-8859-1", eacute)) == "é")
    assert(new String(eacute, HtmlOps.sniffCharset(
      "Content-Type: text/html", eacute)) == "�")
  }

  test("randomized HTML: regex chain equals the independent scanner") {
    val rnd = new scala.util.Random(0x47 + 0x1234)
    val words = Vector("alpha", "beta", "g&amp;mma", "delta", "&lt;eps&gt;",
      "nu&#109;eric", "he&#x78;", "sp&nbsp;an", "bad&#xFFFFFF;ref", "&amp;#38;")
    val tags = Vector("p", "div", "span", "h1", "li")
    for (_ <- 0 until 200) {
      val sb = new StringBuilder("<html><body>")
      for (_ <- 0 until 1 + rnd.nextInt(12)) {
        rnd.nextInt(5) match {
          case 0 =>
            val t = tags(rnd.nextInt(tags.length))
            sb.append(s"<$t class=\"c${rnd.nextInt(9)}\">")
              .append(words(rnd.nextInt(words.length)))
              .append(s"</$t>")
          case 1 => sb.append("<script>var q = \"<i>x</i>\";</script>")
          case 2 => sb.append("<style>a { b: c; }</style>")
          case 3 => sb.append("<!-- ").append(words(rnd.nextInt(words.length)))
            .append(" -->")
          case _ => sb.append(' ').append(words(rnd.nextInt(words.length)))
            .append(' ')
        }
      }
      sb.append("</body></html>")
      val html = sb.toString
      assert(sparkStrip(html) == referenceStrip(html), s"mismatch on: $html")
    }
  }
}
