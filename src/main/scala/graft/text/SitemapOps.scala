package graft.text

/** Minimal sitemaps.org protocol-0.9 parser — the OTHER half of the
  * crawl frontier next to robots.txt ([[RobotsOps]]): robots declares
  * where the sitemaps live (the global `Sitemap:` field), a sitemap
  * index fans out to child sitemaps, and each urlset carries the
  * `<loc>/<lastmod>/<priority>` triples a recrawl scheduler consumes.
  * Deliberately grammar-small and total: element scan by regexp (the
  * protocol pins the element names; attributes/namespaces on the root
  * are ignored), XML's five predefined entities unescaped (amp LAST so
  * `&amp;lt;` stays a literal `&lt;` — the same no-rescan rule as
  * [[graft.plans.HtmlEntityExpression]]), missing optional fields →
  * None, malformed `<url>` blocks (no `<loc>`) dropped rather than
  * thrown — a crawl meets broken sitemaps and must keep walking.
  */
object SitemapOps {

  /** One `<url>` entry of a urlset. `lastmod`/`priority` verbatim
    * (W3C datetime / "0.0".."1.0") — interpretation is the caller's.
    */
  final case class Entry(loc: String, lastmod: Option[String],
      priority: Option[String])

  private val UrlRe = "(?s)<url>(.*?)</url>".r
  private val ChildRe = "(?s)<sitemap>(.*?)</sitemap>".r

  private def tag(block: String, t: String): Option[String] =
    s"(?s)<$t>\\s*(.*?)\\s*</$t>".r.findFirstMatchIn(block)
      .map(m => unescape(m.group(1)))

  /** XML predefined-entity unescape; `&amp;` last so decoded output is
    * never re-scanned.
    */
  private[text] def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** sitemaps.org caps a urlset (and an index) at 50,000 entries; a
    * conformant consumer must not let one malformed/hostile file
    * balloon past the protocol bound, so entries beyond the cap are
    * dropped (the protocol says such a file is invalid anyway).
    */
  val MaxEntries = 50000

  /** The urlset's entries, in document order; loc-less blocks dropped;
    * capped at [[MaxEntries]] (lazy iterator — the tail of an
    * over-limit file is never materialized).
    */
  def urlEntries(xml: String): Seq[Entry] =
    UrlRe.findAllMatchIn(xml).flatMap { m =>
      val b = m.group(1)
      tag(b, "loc").map(Entry(_, tag(b, "lastmod"), tag(b, "priority")))
    }.take(MaxEntries).toSeq

  /** Child sitemap locations of a `<sitemapindex>` document; capped at
    * [[MaxEntries]] like urlsets.
    */
  def indexChildren(xml: String): Seq[String] =
    ChildRe.findAllMatchIn(xml).flatMap(m => tag(m.group(1), "loc"))
      .take(MaxEntries).toSeq

  def isIndex(xml: String): Boolean = xml.contains("<sitemapindex")
  def isUrlset(xml: String): Boolean = xml.contains("<urlset")

  /** `Sitemap:` declarations in a robots.txt — the field is global
    * (outside group semantics, sitemaps.org "Sitemap location"), so it
    * parses independently of [[RobotsOps.rules]]'s group selection.
    */
  def declaredInRobots(robotsTxt: String): Seq[String] =
    robotsTxt.split("\r?\n").toSeq.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase("sitemap"))
        Some(line.substring(c + 1).trim).filter(_.nonEmpty)
      else None
    }
}
