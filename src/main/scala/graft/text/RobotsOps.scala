package graft.text

/** robots.txt parsing and rule matching from RFC 9309 (Robots Exclusion
  * Protocol) — the step between link extraction and the crawl frontier:
  * every fetched URL a crawler plans must first pass the target host's
  * robots rules, so at 100 TB this is a per-host-keyed filter on the
  * candidate edge stream (rules per host are tiny; links are the data).
  *
  * Implemented semantics (the RFC's full matching grammar):
  *  - line grammar: `field: value` with `#` comments stripped, field
  *    names case-insensitive (§2.2);
  *  - groups: consecutive `User-agent` lines share the following rules;
  *    a `User-agent` line after ANY group-body line (allow/disallow —
  *    and `crawl-delay`, which real files place inside groups) starts a
  *    new group — blank lines do NOT end a group (§2.2.1);
  *  - group selection: case-insensitive product-token match; all
  *    matching groups MERGE; if none match, the `*` groups apply; if
  *    none, everything is allowed (§2.2.1);
  *  - rule matching: `*` matches any sequence of octets including none,
  *    `$` at the end of a rule anchors the match at the end of the URL
  *    path — both MUST-support special characters (§2.2.3);
  *  - percent-encoding: `%XX` octets that decode to US-ASCII
  *    *unreserved* characters (RFC 3986 §2.3: ALPHA / DIGIT / `-._~`)
  *    are decoded prior to comparison and all other escapes are
  *    hex-uppercased, applied identically to rule paths and URL paths
  *    (§2.2.2) — so `Allow: /%70age` and a fetched `/page` compare
  *    equal, while `%2A` never turns into a live `*` wildcard;
  *  - precedence: the most specific match — most pattern octets —
  *    wins; on a tie, allow wins (§2.2.2); an empty `Disallow:` value
  *    places no restriction.
  */
object RobotsOps {

  final case class Rule(allow: Boolean, path: String)

  /** Is `uri` a fetch of the WELL-KNOWN robots location (RFC 9309 §2.3:
    * path exactly `/robots.txt` at the authority root)? A capture at
    * `http://cdn/x/robots.txt` is a candidate redirect TARGET, never a
    * host's own robots fetch — `endsWith("/robots.txt")` conflates the
    * two.
    */
  def isWellKnownUri(uri: String): Boolean = {
    val at = uri.indexOf("://")
    if (at < 0) uri == "/robots.txt"
    else {
      val slash = uri.indexOf('/', at + 3)
      slash >= 0 && uri.substring(slash) == "/robots.txt"
    }
  }

  /** Is `c` an RFC 3986 §2.3 unreserved character? Only these may be
    * percent-decoded before comparison (§2.2.2) — decoding a reserved
    * octet (`%2F`, `%3F`) or a special one (`%2A` = `*`) would change
    * which URLs a rule matches.
    */
  private def unreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** RFC 9309 §2.2.2 percent-encoding normalization, applied to BOTH
    * rule paths (at parse) and URL paths (at match): decode `%XX`
    * escapes of unreserved US-ASCII characters; uppercase the hex of
    * every other escape so `%2f` and `%2F` compare equal; leave
    * malformed escapes (non-hex, truncated) byte-for-byte literal.
    */
  def normalizePercent(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    out.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n) {
        val h = Character.digit(s.charAt(i + 1), 16)
        val l = Character.digit(s.charAt(i + 2), 16)
        if (h >= 0 && l >= 0) {
          val v = (h * 16 + l).toChar
          if (unreserved(v)) out.append(v)
          else {
            out.append('%')
            out.append(Character.toUpperCase(s.charAt(i + 1)))
            out.append(Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** RFC 9309 §2.2.3 pattern match: does `pattern` (with `*` = any
    * octet sequence, trailing `$` = end anchor) match `path`? Without
    * an anchor the match is against any PREFIX of the path (the RFC's
    * base rule generalized). Greedy leftmost placement of the literal
    * segments between `*`s is complete here: taking each segment at its
    * earliest position only leaves more room for the rest, and the
    * anchored final segment is checked against the path end directly.
    * Both sides are expected pre-normalized ([[normalizePercent]]).
    */
  def pathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = pat.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    var i = 1
    while (i < segs.length) {
      val s = segs(i)
      if (i == segs.length - 1 && anchored)
        return path.length - s.length >= pos && path.endsWith(s)
      val at = path.indexOf(s, pos)
      if (at < 0) return false
      pos = at + s.length
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** RFC 9309 §2.5.1 parse bound: crawlers MUST parse at least
    * 500 KiB and MAY ignore the rest — an unbounded parse would let
    * one hostile multi-GB robots.txt dominate a scan task. Truncation
    * backs up to the last line break inside the bound so a half rule
    * is never parsed as a shorter (likely broader) one.
    */
  private val ParseBound = 512 * 1024

  private def bounded(text: String): String =
    if (text.length <= ParseBound) text
    else {
      val cut = text.lastIndexOf('\n', ParseBound)
      // no newline inside the bound = one giant line: drop it whole —
      // a mid-line cut would parse a truncated Disallow as a shorter,
      // BROADER rule
      text.substring(0, math.max(cut, 0))
    }

  /** Rules applying to `agent` per the RFC 9309 group-selection and
    * merge semantics. Rule paths come out percent-normalized
    * (§2.2.2); `*`/`$` stay verbatim for [[pathMatches]]. Input is
    * parsed up to the §2.5.1 bound ([[bounded]]).
    */
  def rules(text: String, agent: String): Seq[Rule] = {
    val capped = bounded(text)
    final case class Group(agents: Seq[String], rules: Seq[Rule])
    val groups = Seq.newBuilder[Group]
    var agents = Seq.newBuilder[String]
    var body = Seq.newBuilder[Rule]
    var inBody = false
    var sawAny = false
    def flush(): Unit = {
      val as = agents.result()
      if (as.nonEmpty) groups += Group(as, body.result())
      agents = Seq.newBuilder[String]
      body = Seq.newBuilder[Rule]
      inBody = false
    }
    capped.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (inBody) flush()
            agents += value.toLowerCase
            sawAny = true
          case "allow" | "disallow" if sawAny =>
            inBody = true
            // empty Disallow = no restriction
            if (value.nonEmpty) body += Rule(field == "allow",
              normalizePercent(value))
          case "crawl-delay" if sawAny =>
            // group-body field (same boundary rule as [[crawlDelay]],
            // so both parsers agree on where groups end)
            inBody = true
          case _ => () // sitemap, unknown fields: ignored
        }
      }
    }
    flush()
    val all = groups.result()
    val a = agent.toLowerCase
    val specific = all.filter(_.agents.contains(a))
    val chosen =
      if (specific.nonEmpty) specific else all.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** De-facto `Crawl-delay` extension — NOT part of RFC 9309 (Google
    * ignores it; Bing/Yandex honor it), but ubiquitous in real robots
    * files and the input a politeness scheduler needs. Group-scoped
    * with the same selection semantics as [[rules]]: the specific
    * group's delay beats `*`'s; the FIRST parseable value in the
    * chosen groups wins (merge order = file order); non-numeric or
    * negative values are ignored (fail-open to no delay, the same
    * stance as unparseable rules).
    */
  def crawlDelay(text: String, agent: String): Option[Long] = {
    val capped = bounded(text)
    final case class Group(agents: Seq[String], delays: Seq[Long])
    val groups = Seq.newBuilder[Group]
    var agents = Seq.newBuilder[String]
    var delays = Seq.newBuilder[Long]
    var inBody = false
    var sawAny = false
    def flush(): Unit = {
      val as = agents.result()
      if (as.nonEmpty) groups += Group(as, delays.result())
      agents = Seq.newBuilder[String]
      delays = Seq.newBuilder[Long]
      inBody = false
    }
    capped.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (inBody) flush()
            agents += value.toLowerCase
            sawAny = true
          case "allow" | "disallow" if sawAny => inBody = true
          case "crawl-delay" if sawAny =>
            inBody = true
            try { val d = value.toLong; if (d >= 0) delays += d }
            catch { case _: NumberFormatException => () }
          case _ => ()
        }
      }
    }
    flush()
    val all = groups.result()
    val a = agent.toLowerCase
    val specific = all.filter(_.agents.contains(a))
    val chosen =
      if (specific.nonEmpty) specific else all.filter(_.agents.contains("*"))
    chosen.flatMap(_.delays).headOption
  }

  /** RFC 9309 §2.2.2 precedence over the full §2.2.3 grammar: among
    * rules matching `path`, the one with the most pattern octets wins;
    * ties go to allow; no matching rule (or no rules at all) → allowed.
    */
  def allowed(rs: Seq[Rule], path: String): Boolean = {
    val p = normalizePercent(path)
    var bestLen = -1
    var bestAllow = true
    rs.foreach { r =>
      if (pathMatches(r.path, p)) {
        if (r.path.length > bestLen ||
          (r.path.length == bestLen && r.allow && !bestAllow)) {
          bestLen = r.path.length
          bestAllow = r.allow
        }
      }
    }
    bestLen < 0 || bestAllow
  }
}
