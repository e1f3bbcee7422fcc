package graft.text

/** robots.txt parsing and rule matching from RFC 9309 (Robots Exclusion
  * Protocol) — the step between link extraction and the crawl frontier:
  * every fetched URL a crawler plans must first pass the target host's
  * robots rules, so at 100 TB this is a broadcast-joined filter on the
  * candidate edge stream (rules per host are tiny; links are the data).
  *
  * Implemented subset (the RFC's base semantics):
  *  - line grammar: `field: value` with `#` comments stripped, field
  *    names case-insensitive (§2.2);
  *  - groups: consecutive `User-agent` lines share the following rules;
  *    a `User-agent` line after rules starts a new group — blank lines
  *    do NOT end a group (§2.2.1);
  *  - group selection: case-insensitive product-token match; all
  *    matching groups MERGE; if none match, the `*` groups apply; if
  *    none, everything is allowed (§2.2.1);
  *  - rule matching: longest-path-match wins; on a length tie, allow
  *    wins (§2.2.2); an empty `Disallow:` value places no restriction;
  *  - paths are octet-prefix rules (the RFC's base matching). The `*`
  *    and `$` wildcard extensions are NOT implemented — rules containing
  *    them are dropped (fail-open to allow, the RFC's stance for rules
  *    a crawler cannot parse).
  */
object RobotsOps {

  final case class Rule(allow: Boolean, path: String)

  /** Rules applying to `agent` per the RFC 9309 group-selection and
    * merge semantics.
    */
  def rules(text: String, agent: String): Seq[Rule] = {
    final case class Group(agents: Seq[String], rules: Seq[Rule])
    val groups = Seq.newBuilder[Group]
    var agents = Seq.newBuilder[String]
    var body = Seq.newBuilder[Rule]
    var inRules = false
    var sawAny = false
    def flush(): Unit = {
      val as = agents.result()
      if (as.nonEmpty) groups += Group(as, body.result())
      agents = Seq.newBuilder[String]
      body = Seq.newBuilder[Rule]
      inRules = false
    }
    text.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (inRules) flush()
            agents += value.toLowerCase
            sawAny = true
          case "allow" | "disallow" if sawAny =>
            inRules = true
            // empty Disallow = no restriction; wildcard rules dropped
            if (value.nonEmpty && !value.contains('*') && !value.contains('$'))
              body += Rule(field == "allow", value)
          case _ => () // sitemap, crawl-delay, unknown fields: ignored
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
    text.split("\r?\n").foreach { raw =>
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

  /** RFC 9309 §2.2.2 precedence: among rules whose path is an octet
    * prefix of `path`, the longest wins; ties go to allow; no matching
    * rule (or no rules at all) → allowed.
    */
  def allowed(rs: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rs.foreach { r =>
      if (path.startsWith(r.path)) {
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
