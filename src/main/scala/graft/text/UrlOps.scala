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

  /** Frontier column form of the key rules (see object doc) — one
    * static codegen call into [[frontierCanonicalStr]]
    * ([[graft.plans.UrlCanonicalExpression]]), so plan-side and
    * scan-side frontier keys are one implementation by construction.
    * Measured on `q_bloom_urlseen` (sf0.1, w8, reps 8, min): 1.33 s
    * with the column chain → 0.70 s native.
    */
  def frontierCanonical(c: Column): Column =
    graft.plans.UrlCanonicalExpression.frontierCanonical(c)

  /** The pure-column reference implementation of the frontier rules
    * (regexp extracts + a higher-order param filter). Kept as the
    * INDEPENDENT third implementation UrlOpsSpec's randomized
    * differential checks the native expression and the scan twin
    * against; production paths use [[frontierCanonical]] (one
    * codegen'd static call — the column chain's per-row regex + lambda
    * cost was the named `q_bloom_urlseen` regression of the round-13
    * frontier-key switch).
    */
  def frontierCanonicalColumns(c: Column): Column = {
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

  /** RFC 3986 §5.2.4 `remove_dot_segments` over a path. */
  private[text] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (through but not past the next "/")
        val start = if (in.startsWith("/")) 1 else 0
        val slash = in.indexOf('/', start)
        val end = if (slash < 0) in.length else slash
        out += in.substring(0, end)
        in = in.substring(end)
      }
    }
    out.mkString
  }

  /** Split an absolute URI into (scheme, "//"+authority, path, "?"+query)
    * — each component "" when absent; fragments are the caller's problem.
    */
  private def splitUri(u: String): (String, String, String, String) = {
    var rest = u
    val colon = rest.indexOf(':')
    val scheme =
      if (colon > 0 && rest.charAt(0).isLetter &&
        rest.substring(0, colon).forall(c =>
          c.isLetterOrDigit || c == '+' || c == '.' || c == '-')) {
        val s = rest.substring(0, colon)
        rest = rest.substring(colon + 1)
        s
      } else ""
    val auth =
      if (rest.startsWith("//")) {
        var i = 2
        while (i < rest.length && rest.charAt(i) != '/' &&
          rest.charAt(i) != '?') i += 1
        val a = rest.substring(0, i)
        rest = rest.substring(i)
        a
      } else ""
    val qAt = rest.indexOf('?')
    if (qAt >= 0) (scheme, auth, rest.substring(0, qAt), rest.substring(qAt))
    else (scheme, auth, rest, "")
  }

  /** RFC 3986 §5.2 reference resolution: the target URI of reference
    * `ref` against absolute base `base` — the transformation a crawler
    * MUST apply to a `Location` header (RFC 9110 §10.2.2 allows any
    * URI-reference) or an HTML `href`. Handles all the reference
    * shapes real servers emit: absolute URIs, protocol-relative
    * (`//host/p`), absolute-path (`/p`), relative-path (`p`, `../p` —
    * merged per §5.2.3 with §5.2.4 dot-segment removal), query-only
    * (`?q`), and empty. The ref's fragment is dropped (a fetch target
    * has no fragment; the frontier canonicalizer would strip it
    * anyway). Strict grammar (a scheme-bearing ref replaces the base
    * even with the same scheme, per the spec's strict parser).
    */
  def resolve(base: String, ref: String): String = {
    val hashAt = ref.indexOf('#')
    val r = if (hashAt >= 0) ref.substring(0, hashAt) else ref
    val (bs, ba, bp, bq) = splitUri(base)
    val (rs, ra, rp, rq) = splitUri(r)
    val (ts, ta, tp, tq) =
      if (rs.nonEmpty) (rs, ra, removeDotSegments(rp), rq)
      else if (ra.nonEmpty) (bs, ra, removeDotSegments(rp), rq)
      else if (rp.isEmpty) (bs, ba, bp, if (rq.nonEmpty) rq else bq)
      else if (rp.startsWith("/")) (bs, ba, removeDotSegments(rp), rq)
      else {
        // §5.2.3 merge: base-with-authority-and-empty-path → "/" + ref;
        // else ref replaces everything after the base path's last "/"
        val merged =
          if (ba.nonEmpty && bp.isEmpty) "/" + rp
          else {
            val cut = bp.lastIndexOf('/')
            (if (cut >= 0) bp.substring(0, cut + 1) else "") + rp
          }
        (bs, ba, removeDotSegments(merged), rq)
      }
    (if (ts.nonEmpty) ts + ":" else "") + ta + tp + tq
  }
}
