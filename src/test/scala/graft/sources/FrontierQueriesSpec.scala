package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Frontier-tier branches the DuckDB oracles never reach, driven
  * through the REAL queries on hand-planted trees: the `ensure*`
  * builders skip generation when the tree root already exists, so each
  * test plants its own bytes at the exact workDir a synthetic sfDir
  * string maps to and lets `run()` consume them — no parallel
  * reimplementation of the query logic.
  */
class FrontierQueriesSpec extends SparkSpec {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def member(tpe: String, id: String, uri: Option[String],
      body: Array[Byte], refersTo: Option[String] = None,
      digest: Option[String] = None): Array[Byte] =
    graft.multimodal.GzipCodec.buildMember(
      graft.multimodal.WarcCodec.buildRecord(tpe, s"<urn:uuid:$id>",
        "2026-01-01T00:00:00Z", uri, body, refersTo, digest))

  /** Clear any stale tree a previous run (or an ensure* fallback on a
    * then-empty dir) left at this workDir — the existence guard would
    * silently serve it. Call ONCE per test, before the plant calls.
    */
  private def clearTree(tag: String, sfDir: String): Unit = {
    // a tree's derived checkpoints (the `_resolved` frontier frame)
    // must die with it, or the existence guard serves stale rows
    for (t <- Seq(tag, tag + "_resolved")) {
      val base = Paths.get(SourceQueries.workDir(t, sfDir))
      if (Files.exists(base)) {
        import scala.jdk.CollectionConverters._
        Files.walk(base).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      }
    }
  }

  private def plant(tag: String, sfDir: String, sub: String,
      file: String, members: Seq[Array[Byte]]): Unit = {
    val root = Paths.get(SourceQueries.workDir(tag, sfDir), sub)
    Files.createDirectories(root)
    Files.write(root.resolve(file), members.reduce(_ ++ _))
  }

  test("warc revisit: an orphan digest lands in n_unresolved, not in " +
    "saved_bytes") {
    val sfDir = "/spec/revisit_orphan" // synthetic key, never generated
    val body = "xxxxx"
    clearTree("revisit", sfDir)
    plant("revisit", sfDir, "0", "v000.warc.gz", Seq(
      member("response", "a", Some("http://t0.example/r0"),
        body.getBytes(utf8)),
      member("revisit", "b", Some("http://t0.example/r1"),
        Array.emptyByteArray, Some("<urn:uuid:a>"),
        Some("md5:" + graft.functions.PortableHash.md5Hex(body))),
      member("revisit", "c", Some("http://t0.example/r2"),
        Array.emptyByteArray, Some("<urn:uuid:gone>"),
        Some("md5:" + graft.functions.PortableHash.md5Hex("nope")))))
    val r = FrontierQueries.WarcRevisit.run(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "t0.example")
    assert(row.getLong(1) == 1L && row.getLong(2) == 2L,
      s"response/revisit counts: $row")
    assert(row.getLong(3) == 5L, s"stored: $row")
    assert(row.getLong(4) == 5L,
      s"only the resolved revisit may count as saved: $row")
    assert(row.getLong(5) == 1L, s"orphan digest must be unresolved: $row")
  }

  test("fetch schedule: missing Crawl-delay defaults to 1 s; stale and " +
    "disallowed paths never enter the plan") {
    val sfDir = "/spec/fetch_nodelay"
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>http://t0.example/p1</loc><lastmod>2026-02-01</lastmod>
        |  <priority>0.9</priority></url>
        |<url><loc>http://t0.example/p2</loc><lastmod>2026-03-01</lastmod>
        |  <priority>0.5</priority></url>
        |<url><loc>http://t0.example/p3</loc><lastmod>2026-01-01</lastmod>
        |  <priority>0.7</priority></url>
        |<url><loc>http://t0.example/secret</loc><lastmod>2026-02-01</lastmod>
        |  <priority>0.9</priority></url>
        |</urlset>""".stripMargin
    val robots = "User-agent: graftbot\nDisallow: /secret\n" +
      "Sitemap: http://t0.example/sitemap.xml\n" // NO Crawl-delay line
    clearTree("sitemap5", sfDir)
    plant("sitemap5", sfDir, "0", "s000.warc.gz", Seq(
      member("resource", "rob", Some("http://t0.example/robots.txt"),
        robots.getBytes(utf8)),
      member("resource", "map", Some("http://t0.example/sitemap.xml"),
        urlset.getBytes(utf8))))
    val r = FrontierQueries.FetchSchedule.run(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "t0.example")
    assert(row.getLong(1) == 1L, s"absent Crawl-delay must default to 1: $row")
    // p3 is stale, /secret disallowed → only p1, p2 scheduled
    assert(row.getLong(2) == 2L, s"n_fetches: $row")
    assert(row.getLong(3) == 1L && row.getLong(4) == 1L,
      s"makespan/total wait at delay 1, 2 fetches: $row")
    assert(row.getString(5) == "/p1",
      s"priority 0.9 must be fetched first: $row")
  }

  test("resolved-frontier checkpoint: cold resolution and the served " +
    "parquet frame are row-identical (the ClassifierOps cold ≡ served " +
    "contract)") {
    val root = FrontierQueries.ensureSitemapTree(sf)
    val served = FrontierQueries.servedFrontier(spark, sf)
    val cold = FrontierQueries.coldResolvedFrontier(spark, root)
    assert(served.schema.fieldNames.toSeq ==
      cold.schema.fieldNames.toSeq, "checkpoint must preserve the schema")
    assert(served.count() > 0, "the resolved frame must be non-empty")
    // exact multiset compare: group every column to (row, multiplicity)
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(df.schema.fieldNames.head,
        df.schema.fieldNames.tail: _*).count()
    assert(bag(served).except(bag(cold)).isEmpty &&
      bag(cold).except(bag(served)).isEmpty,
      "served checkpoint must hold exactly the cold-resolved rows")
  }

  test("hreflang groups: a reciprocal chain (a↔b↔c, no a↔c) is ONE " +
    "3-edition group under connected components, not two split halves") {
    val sfDir = "/spec/hreflang_chain"
    def page(id: String, uri: String, links: String) =
      member("response", id, Some(uri),
        (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
          .getBytes("ISO-8859-1") ++
          s"<html><head>$links</head><body>.</body></html>".getBytes(utf8))
    def alt(lang: String, href: String) =
      s"""<link rel="alternate" hreflang="$lang" href="$href">"""
    val h = "http://t0.example"
    clearTree("href2", sfDir)
    plant("href2", sfDir, "0", "h000.warc.gz", Seq(
      page("a", s"$h/a", alt("en", s"$h/b")),
      page("b", s"$h/b", alt("fr", s"$h/a") + alt("de", s"$h/c")),
      page("c", s"$h/c", alt("fr", s"$h/b"))))
    val r = FrontierQueries.HreflangGroups.run(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "t0.example")
    assert(row.getLong(4) == 4L, s"all four edges reciprocal: $row")
    assert(row.getLong(9) == 1L,
      s"the chain is ONE connected component, not two: $row")
    assert(row.getLong(10) == 3L, s"the group spans all 3 editions: $row")
  }

  test("robots frontier: RFC 9309 §2.3.1 availability semantics on " +
    "response-carried robots (404 → unrestricted, 500 → disallow-all, " +
    "chunked 200 → parsed)") {
    val sfDir = "/spec/robots_avail"
    def http(status: String, body: Array[Byte], extra: String = "") =
      (s"HTTP/1.1 $status\r\nContent-Type: text/plain$extra\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
    // one 200 page on host a linking once into hosts b..g
    val page = http("200 OK",
      ("""<html><body><a href="http://b.example/x">.</a>""" +
        """<a href="http://c.example/x">.</a>""" +
        """<a href="http://d.example/x">.</a>""" +
        """<a href="http://e.example/x">.</a>""" +
        """<a href="http://f.example/x">.</a>""" +
        """<a href="http://g.example/x">.</a></body></html>""")
        .getBytes(utf8))
    // b: 500 robots → unreachable, MUST assume complete disallow
    val robotsB = http("500 Internal Server Error", "err".getBytes(utf8))
    // c: 404 robots → unavailable, MAY crawl unrestricted
    val robotsC = http("404 Not Found", "gone".getBytes(utf8))
    // d: 200 robots under chunked framing → rules parse normally
    val dTxt = "User-agent: *\nDisallow: /x\n".getBytes(utf8)
    val chunked = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"${dTxt.length.toHexString}\r\n".getBytes("ISO-8859-1"))
      out.write(dTxt)
      out.write("\r\n0\r\n\r\n".getBytes("ISO-8859-1"))
      out.toByteArray
    }
    val robotsD = http("200 OK", chunked,
      extra = "\r\nTransfer-Encoding: chunked")
    // e: robots 301s cross-host to a captured 200 body → its rules
    // apply to e (§2.3.1.2 followed)
    val robotsE = http("301 Moved Permanently", "moved".getBytes(utf8),
      extra = "\r\nLocation: http://cdn.example/e/robots.txt")
    val robotsETarget = http("200 OK",
      "User-agent: *\nDisallow: /x\n".getBytes(utf8))
    // f: robots 302s to a target that answers 500 → unreachable via
    // the chain, complete disallow
    val robotsF = http("302 Found", "moved".getBytes(utf8),
      extra = "\r\nLocation: /alt/robots.txt")
    val robotsFTarget = http("500 Internal Server Error",
      "err".getBytes(utf8))
    // g: robots 302s to a target that was never captured → dangling
    // chain, unavailable, crawl unrestricted
    val robotsG = http("302 Found", "moved".getBytes(utf8),
      extra = "\r\nLocation: http://nowhere.example/robots.txt")
    clearTree("robots4", sfDir)
    plant("robots4", sfDir, "0", "r000.warc.gz", Seq(
      member("response", "pg", Some("http://a.example/p"), page),
      member("response", "rb", Some("http://b.example/robots.txt"), robotsB),
      member("response", "rc", Some("http://c.example/robots.txt"), robotsC),
      member("response", "rd", Some("http://d.example/robots.txt"), robotsD),
      member("response", "re", Some("http://e.example/robots.txt"), robotsE),
      member("response", "ret", Some("http://cdn.example/e/robots.txt"),
        robotsETarget),
      member("response", "rf", Some("http://f.example/robots.txt"), robotsF),
      member("response", "rft", Some("http://f.example/alt/robots.txt"),
        robotsFTarget),
      member("response", "rg", Some("http://g.example/robots.txt"), robotsG)))
    val rows = ArchiveQueries.RobotsFrontier.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // (n_rules, n_links, n_allowed, n_blocked)
    assert(rows("b.example") == ((1L, 1L, 0L, 1L)),
      s"500 robots must fail CLOSED: ${rows("b.example")}")
    assert(rows("c.example") == ((0L, 1L, 1L, 0L)),
      s"404 robots must allow: ${rows("c.example")}")
    assert(rows("d.example") == ((1L, 1L, 0L, 1L)),
      s"chunked 200 robots must parse: ${rows("d.example")}")
    assert(rows("e.example") == ((1L, 1L, 0L, 1L)),
      s"redirected robots rules must apply to the origin host: " +
        rows("e.example").toString)
    assert(rows("f.example") == ((1L, 1L, 0L, 1L)),
      s"redirect onto a 5xx must fail CLOSED: ${rows("f.example")}")
    assert(rows("g.example") == ((0L, 1L, 1L, 0L)),
      s"dangling redirect chain must allow: ${rows("g.example")}")
  }

  test("redirect map: 303/307 codes count, relative Location resolves " +
    "against the source host, a self-loop caps") {
    val sfDir = "/spec/redirect_hand"
    def resp(id: String, uri: String, status: String, extra: String,
        body: String) =
      member("response", id, Some(uri),
        (s"HTTP/1.1 $status\r\nContent-Type: text/html$extra\r\n\r\n")
          .getBytes("ISO-8859-1") ++ body.getBytes(utf8))
    clearTree("redir3", sfDir)
    plant("redir3", sfDir, "0", "d000.warc.gz", Seq(
      // 303 with an ABSOLUTE-PATH Location onto a real page
      resp("a", "http://t0.example/a", "303 See Other",
        "\r\nLocation: /land", "x"),
      // 307 chain hop onto the same page, absolute spelling
      resp("b", "http://t0.example/b", "307 Temporary Redirect",
        "\r\nLocation: http://t0.example/land", "x"),
      // a SELF-loop: must cap at 5 hops, not spin
      resp("c", "http://t0.example/self", "302 Found",
        "\r\nLocation: http://t0.example/self", "x"),
      // a redirect with NO Location header contributes no edge
      resp("d", "http://t0.example/noloc", "301 Moved Permanently", "", "x"),
      // RELATIVE-PATH reference with a dot segment: resolves against
      // the source uri /dir/e per RFC 3986 §5.2 onto /land
      resp("e", "http://t0.example/dir/e", "301 Moved Permanently",
        "\r\nLocation: ../land", "x"),
      resp("land", "http://t0.example/land", "200 OK", "",
        "<html><body>landed</body></html>")))
    val r = FrontierQueries.RedirectMap.run(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "t0.example")
    assert(row.getLong(1) == 4L, s"4 edges (the no-Location 301 drops): $row")
    assert(row.getLong(2) == 1L && row.getLong(3) == 1L,
      s"the dot-segment 301 and the 302 self-loop: $row")
    assert(row.getLong(4) == 0L, s"no cross-host edges: $row")
    assert(row.getLong(5) == 3L,
      s"303-path, 307-absolute, and 301-dot-segment all land on /land: $row")
    assert(row.getLong(6) == 1L && row.getLong(7) == 1L,
      s"the self-loop is unresolved AND capped: $row")
    assert(row.getLong(8) == 5L, s"cap depth is the max hop count: $row")
  }

  test("revalidate plan: 304s save the OLD body bytes, validator-less " +
    "pages refetch full, unmatched pages drop") {
    val sfDir = "/spec/reval_hand"
    def resp(id: String, uri: String, status: String, extra: String,
        bodyLen: Int) =
      member("response", id, Some(uri),
        (s"HTTP/1.1 $status\r\nContent-Type: text/html$extra\r\n\r\n")
          .getBytes("ISO-8859-1") ++ Array.fill[Byte](bodyLen)('b'))
    clearTree("reval", sfDir)
    plant("reval", sfDir, "old/0", "v000.warc.gz", Seq(
      resp("oa", "http://t0.example/a", "200 OK",
        "\r\nETag: \"ea\"", 30),
      resp("ob", "http://t0.example/b", "200 OK", "", 11),
      resp("oc", "http://t0.example/gone", "200 OK",
        "\r\nETag: \"ec\"", 7))) // no new-side counterpart: dropped
    plant("reval", sfDir, "new/0", "v000.warc.gz", Seq(
      resp("na", "http://t0.example/a", "304 Not Modified",
        "\r\nETag: \"ea\"", 0),
      resp("nb", "http://t0.example/b", "200 OK", "", 42),
      resp("nd", "http://t0.example/fresh", "200 OK", "", 99)))
    val r = FrontierQueries.RevalidatePlan.run(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "t0.example")
    assert(row.getLong(1) == 2L, s"only uri-matched pages count: $row")
    assert(row.getLong(2) == 1L && row.getLong(4) == 1L,
      s"one ETag page = one validator page: $row")
    assert(row.getLong(5) == 1L && row.getLong(6) == 1L,
      s"one 304, one full refetch: $row")
    assert(row.getLong(7) == 30L,
      s"saved bytes are the OLD stored body, not the 304's empty one: $row")
    assert(row.getLong(8) == 42L, s"fetched bytes are the NEW body: $row")
  }

  test("crawl delta: hand-planted add/remove/change/same classification") {
    val sfDir = "/spec/delta_hand"
    def page(snap: String, path: String, body: String) =
      member("response", s"$snap-$path", Some(s"http://t0.example$path"),
        body.getBytes(utf8))
    clearTree("crdelta", sfDir)
    plant("crdelta", sfDir, "old/0", "c000.warc.gz", Seq(
      page("o", "/a", "body-a"),
      page("o", "/b", "body-b-v1"),
      page("o", "/d", "body-d")))
    plant("crdelta", sfDir, "new/0", "c000.warc.gz", Seq(
      page("n", "/b", "body-b-v2"),
      page("n", "/c", "body-c"),
      page("n", "/d", "body-d")))
    val r = FrontierQueries.CrawlDelta.run(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "t0.example")
    val (nOld, nNew, added, removed, changed, same) =
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4),
        row.getLong(5), row.getLong(6))
    assert(nOld == 3 && nNew == 3, s"$row")
    assert(added == 1, s"/c is new: $row")
    assert(removed == 1, s"/a is gone: $row")
    assert(changed == 1, s"/b's digest moved: $row")
    assert(same == 1, s"/d is byte-identical: $row")
  }
}
