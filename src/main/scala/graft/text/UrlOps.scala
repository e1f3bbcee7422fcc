package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization every crawl component must
  * share or the (host, path) key space fragments: `http://h/p`,
  * `http://h/p/`, `http://WWW.h/p?utm=1#frag` are one page to a
  * frontier, a seen-set, and a dedup pass, or none of them agree.
  * One rule set, two implementations that are pinned value-identical
  * in UrlOpsSpec:
  *
  *  - [[canonical]] — the codegen'd column chain (four `regexp_replace`
  *    passes, replayable verbatim in the DuckDB oracle dialect), for
  *    relational pipelines ([[CorpusOps.UrlDedup]], the Bloom seen-set);
  *  - [[canonicalStr]] — the scan-side Scala twin for WARC flatMaps
  *    where the URL is in hand as a String (sitemap `<loc>`s, link
  *    hrefs), so parsing and canonicalization happen where the scan
  *    reads the bytes and only canonical keys ever shuffle.
  *
  * Rules (the C4/CCNet/RefinedWeb URL-dedup normalization): strip the
  * fragment and query (tracking params live there), lowercase, drop a
  * `www.` immediately after the scheme, drop one trailing slash.
  */
object UrlOps {

  /** Column form; regexes restricted to the Java/DuckDB shared subset. */
  def canonical(c: Column): Column =
    regexp_replace(regexp_replace(
      lower(regexp_replace(c, "[#?].*$", "")),
      "^(https?://)www\\.", "$1"), "/$", "")

  /** Scan-side twin of [[canonical]] — same four rules, same order. */
  def canonicalStr(u: String): String = {
    var end = u.length
    var i = 0
    while (i < end) {
      val c = u.charAt(i)
      if (c == '#' || c == '?') { end = i } else i += 1
    }
    var s = u.substring(0, end).toLowerCase
    if (s.startsWith("http://www.")) s = "http://" + s.substring(11)
    else if (s.startsWith("https://www.")) s = "https://" + s.substring(12)
    if (s.endsWith("/")) s = s.substring(0, s.length - 1)
    s
  }
}
