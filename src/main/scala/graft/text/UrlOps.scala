package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization every crawl component must
  * share or the (host, path) key space fragments: `http://h/p`,
  * `http://h/p/`, `http://WWW.h/p?utm_s=1#frag` are one page to a
  * frontier, a seen-set, and a dedup pass, or none of them agree.
  *
  * TWO rule sets, each with a column form and a scan-side Scala twin
  * pinned value-identical in UrlOpsSpec:
  *
  *  - **Corpus rules** ([[canonical]]/[[canonicalStr]] — the
  *    C4/CCNet/RefinedWeb URL-dedup normalization): strip fragment AND
  *    the whole query, lowercase EVERYTHING, drop `www.` after the
  *    scheme, drop one trailing slash. Deliberately aggressive — for
  *    corpus-level URL dedup, over-merging trumps key fragmentation.
  *  - **Frontier rules** ([[frontierCanonical]]/[[frontierCanonicalStr]]
  *    — round 13): the key a recrawl frontier / Bloom seen-set must use.
  *    RFC 3986 §6.2.2.1 case-normalizes scheme and host ONLY (URL paths
  *    are case-sensitive on most origins — `/Page` and `/page` are
  *    distinct documents), and the query string is ROUTING on real
  *    sites (`/article?id=1` vs `?id=2` are distinct pages), so only
  *    fragment, known tracking params (`utm_*`, `gclid`, `fbclid`),
  *    the post-scheme `www.`, and one trailing path slash are dropped;
  *    the remaining query stays in the key, in its original order.
  *
  * The corpus column form is restricted to regexes the Java/DuckDB
  * dialects share so relational oracles can replay it verbatim; the
  * frontier form may use higher-order column functions (its oracles
  * replay fixture arithmetic closed-form instead).
  */
object UrlOps {

  /** Corpus column form; regexes restricted to the Java/DuckDB shared
    * subset.
    */
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
    // Locale.ROOT: a Turkish-locale JVM lowercases 'I' to dotless 'ı',
    // diverging from the column twin's locale-independent lower()
    var s = u.substring(0, end).toLowerCase(java.util.Locale.ROOT)
    if (s.startsWith("http://www.")) s = "http://" + s.substring(11)
    else if (s.startsWith("https://www.")) s = "https://" + s.substring(12)
    if (s.endsWith("/")) s = s.substring(0, s.length - 1)
    s
  }

  private val SchemeHostRe = "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?]*".r

  /** Is query param `p` (a `name[=value]` token) a tracking param the
    * frontier key drops? `utm_*` by prefix; `gclid`/`fbclid` by exact
    * name (a legitimate `gclid_x=1` param survives).
    */
  private def tracking(name: String): Boolean =
    name.startsWith("utm_") || name == "gclid" || name == "fbclid"

  /** Frontier column form of the key rules (see object doc). */
  def frontierCanonical(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val prefix =
      regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*://[^/?]*)", 1)
    val lowered = when(length(prefix) > 0,
      concat(lower(prefix),
        noFrag.substr(length(prefix) + lit(1), length(noFrag))))
      .otherwise(noFrag)
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    val pre = regexp_replace(noWww, "\\?.*$", "")
    val q = regexp_extract(noWww, "\\?(.*)$", 1)
    val kept = filter(split(q, "&"), x =>
      x =!= "" &&
        !substring_index(x, "=", 1).startsWith("utm_") &&
        substring_index(x, "=", 1) =!= "gclid" &&
        substring_index(x, "=", 1) =!= "fbclid")
    val path = regexp_replace(pre, "/$", "")
    when(size(kept) > 0, concat(path, lit("?"), array_join(kept, "&")))
      .otherwise(path)
  }

  /** Scan-side twin of [[frontierCanonical]] — same rules, same order. */
  def frontierCanonicalStr(u: String): String = {
    val hashAt = u.indexOf('#')
    val noFrag = if (hashAt >= 0) u.substring(0, hashAt) else u
    val prefix = SchemeHostRe.findFirstIn(noFrag).getOrElse("")
    var s =
      if (prefix.isEmpty) noFrag
      else prefix.toLowerCase(java.util.Locale.ROOT) +
        noFrag.substring(prefix.length)
    if (s.startsWith("http://www.")) s = "http://" + s.substring(11)
    else if (s.startsWith("https://www.")) s = "https://" + s.substring(12)
    val qAt = s.indexOf('?')
    val (pre, q) =
      if (qAt >= 0) (s.substring(0, qAt), s.substring(qAt + 1)) else (s, "")
    val path =
      if (pre.endsWith("/")) pre.substring(0, pre.length - 1) else pre
    val kept = q.split("&", -1)
      .filter(p => p.nonEmpty && !tracking(p.takeWhile(_ != '=')))
    if (kept.isEmpty) path else path + "?" + kept.mkString("&")
  }
}
