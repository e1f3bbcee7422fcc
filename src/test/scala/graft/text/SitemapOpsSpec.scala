package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** SitemapOps contract, pinned against the sitemaps.org protocol-0.9
  * grammar on hand-written documents — independent of the fixture
  * generator and of the Spark plan that consumes the parser: entry
  * extraction with optional fields, loc-less block dropping, index
  * fan-out, the no-rescan entity unescape, and the global `Sitemap:`
  * robots declaration (which must parse OUTSIDE RobotsOps' group
  * selection).
  */
class SitemapOpsSpec extends AnyFunSuite {

  test("urlset: full, partial, and loc-less entries") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>http://a.example/p1</loc>
        |  <lastmod>2026-02-01</lastmod><priority>0.8</priority></url>
        |<url><loc> http://a.example/p2 </loc></url>
        |<url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val es = SitemapOps.urlEntries(xml)
    assert(es === Seq(
      SitemapOps.Entry("http://a.example/p1", Some("2026-02-01"), Some("0.8")),
      SitemapOps.Entry("http://a.example/p2", None, None)))
    assert(SitemapOps.isUrlset(xml) && !SitemapOps.isIndex(xml))
  }

  test("index: children in order, urlset blocks not misread as children") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sitemap><loc>http://a.example/sm1.xml</loc>
        |  <lastmod>2026-01-01</lastmod></sitemap>
        |<sitemap><loc>http://a.example/sm2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(SitemapOps.indexChildren(xml) ===
      Seq("http://a.example/sm1.xml", "http://a.example/sm2.xml"))
    assert(SitemapOps.isIndex(xml) && !SitemapOps.isUrlset(xml))
    assert(SitemapOps.urlEntries(xml).isEmpty)
  }

  test("entity unescape: amp last, decoded output never re-scanned") {
    // a URL with a real query-string ampersand, escaped per the protocol
    val xml = "<urlset><url><loc>http://a.example/p?x=1&amp;y=2</loc>" +
      "</url></urlset>"
    assert(SitemapOps.urlEntries(xml).head.loc ===
      "http://a.example/p?x=1&y=2")
    // double-escape stays single-decoded: &amp;lt; -> literal &lt;
    assert(SitemapOps.unescape("&amp;lt;b&amp;gt;") === "&lt;b&gt;")
    assert(SitemapOps.unescape("&lt;&gt;&quot;&apos;&amp;") === "<>\"'&")
  }

  test("robots Sitemap: global field — any group, any case, comments") {
    val robots =
      """# crawl config
        |User-agent: spiderx
        |Disallow: /
        |SITEMAP: http://a.example/sitemap.xml  # trailing comment
        |
        |User-agent: *
        |Disallow:
        |sitemap: http://a.example/extra.xml
        |Sitemap:
        |""".stripMargin
    assert(SitemapOps.declaredInRobots(robots) ===
      Seq("http://a.example/sitemap.xml", "http://a.example/extra.xml"))
    // and the declaration lines do NOT leak into the rule parse
    assert(RobotsOps.rules(robots, "otherbot").isEmpty)
  }

  test("urlset and index cap at the protocol's 50k entries") {
    val over = SitemapOps.MaxEntries + 2
    val urls = (0 until over)
      .map(k => s"<url><loc>http://a.example/p$k</loc></url>").mkString
    val got = SitemapOps.urlEntries(s"<urlset>$urls</urlset>")
    assert(got.size == SitemapOps.MaxEntries)
    // document order: the cap drops the TAIL, not arbitrary entries
    assert(got.head.loc == "http://a.example/p0")
    assert(got.last.loc == s"http://a.example/p${SitemapOps.MaxEntries - 1}")
    val children = (0 until over)
      .map(k => s"<sitemap><loc>http://a.example/s$k.xml</loc></sitemap>")
      .mkString
    assert(SitemapOps.indexChildren(s"<sitemapindex>$children</sitemapindex>")
      .size == SitemapOps.MaxEntries)
  }
}
