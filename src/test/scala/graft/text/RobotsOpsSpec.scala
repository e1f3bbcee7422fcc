package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** RobotsOps contract, pinned against RFC 9309's own semantics clause
  * by clause (group selection §2.2.1, merge rule, longest-match +
  * allow-tie precedence §2.2.2, empty-Disallow, unparseable-rule
  * fail-open) on hand-written files — independent of the fixture
  * generator and of the Spark plan that consumes the parser.
  */
class RobotsOpsSpec extends AnyFunSuite {

  private def ok(txt: String, agent: String, path: String): Boolean =
    RobotsOps.allowed(RobotsOps.rules(txt, agent), path)

  test("group selection: specific group beats *, decoys ignored") {
    val txt =
      """User-agent: spiderx
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow: /private
        |
        |User-agent: *
        |Disallow: /everything
        |""".stripMargin
    assert(!ok(txt, "graftbot", "/private/x"))
    assert(ok(txt, "graftbot", "/everything")) // * group does NOT apply
    assert(!ok(txt, "otherbot", "/everything")) // falls to *
    assert(ok(txt, "otherbot", "/private/x"))
    assert(!ok(txt, "spiderx", "/anything"))
    // case-insensitive agent and field names
    assert(!ok(txt.replace("User-agent", "USER-AGENT"), "GraftBot", "/private"))
  }

  test("matching groups merge; shared user-agent lines share rules") {
    val txt =
      """User-agent: graftbot
        |Disallow: /a
        |
        |User-agent: graftbot
        |Disallow: /b
        |
        |User-agent: x
        |User-agent: y
        |Disallow: /shared
        |""".stripMargin
    assert(!ok(txt, "graftbot", "/a") && !ok(txt, "graftbot", "/b"))
    assert(!ok(txt, "x", "/shared") && !ok(txt, "y", "/shared"))
  }

  test("precedence: longest match wins, allow wins ties, no match allows") {
    val txt =
      """User-agent: *
        |Disallow: /p
        |Allow: /page
        |""".stripMargin
    assert(!ok(txt, "bot", "/p1"))      // only /p matches
    assert(ok(txt, "bot", "/page/sub")) // /page (longer) re-allows
    assert(ok(txt, "bot", "/other"))    // no match
    // exact-tie: Allow and Disallow with the same path → allow
    val tie = "User-agent: *\nDisallow: /t\nAllow: /t\n"
    assert(ok(tie, "bot", "/t/x"))
  }

  test("empty Disallow restricts nothing") {
    assert(ok("User-agent: *\nDisallow:\n", "bot", "/anything"))
    assert(RobotsOps.rules("User-agent: *\nDisallow:\n", "bot").isEmpty)
  }

  test("§2.2.3 wildcards: * spans octets, $ anchors the end") {
    assert(!ok("User-agent: *\nDisallow: /*.pdf\n", "bot", "/x.pdf"))
    assert(!ok("User-agent: *\nDisallow: /*.pdf\n", "bot", "/a/b/doc.pdfx"))
    assert(ok("User-agent: *\nDisallow: /*.pdf$\n", "bot", "/a/doc.pdfx"))
    assert(!ok("User-agent: *\nDisallow: /*.pdf$\n", "bot", "/a/doc.pdf"))
    assert(!ok("User-agent: *\nDisallow: /private*\n", "bot", "/private-x"))
    assert(!ok("User-agent: *\nDisallow: /*?\n", "bot", "/page?utm=1"))
    assert(ok("User-agent: *\nDisallow: /*?\n", "bot", "/page"))
    // $ anchor without *: exact path only
    assert(!ok("User-agent: *\nDisallow: /a$\n", "bot", "/a"))
    assert(ok("User-agent: *\nDisallow: /a$\n", "bot", "/a/b"))
    // multiple stars, greedy segments
    assert(!ok("User-agent: *\nDisallow: /a*b*c\n", "bot", "/a-x-b-y-c-z"))
    assert(ok("User-agent: *\nDisallow: /a*b*c\n", "bot", "/a-x-c-y-b"))
    // anchored multi-star: last segment must END the path
    assert(!ok("User-agent: *\nDisallow: /a*c$\n", "bot", "/a-b-c"))
    assert(ok("User-agent: *\nDisallow: /a*c$\n", "bot", "/a-c-d"))
  }

  test("§2.2.2/§2.2.3 precedence counts pattern octets, wildcard rules " +
    "included; allow re-opens a wildcard disallow") {
    val txt =
      """User-agent: *
        |Disallow: /p
        |Allow: /p*/x1
        |""".stripMargin
    assert(!ok(txt, "bot", "/p3/x0")) // only /p (len 2) matches
    assert(ok(txt, "bot", "/p3/x1"))  // /p*/x1 (len 6) re-allows
    // $-anchored allow beats the shorter disallow exactly once
    val a = "User-agent: *\nDisallow: /p\nAllow: /p3$\n"
    assert(ok(a, "bot", "/p3"))
    assert(!ok(a, "bot", "/p3/deep"))
  }

  test("§2.2.2 percent-encoding: unreserved escapes decode, others " +
    "hex-uppercase, %2A never becomes a wildcard") {
    assert(RobotsOps.normalizePercent("/%70age") === "/page")
    assert(RobotsOps.normalizePercent("/a%2fb") === "/a%2Fb")
    assert(RobotsOps.normalizePercent("/a%2Fb") === "/a%2Fb")
    assert(RobotsOps.normalizePercent("/a%zz%2") === "/a%zz%2") // malformed
    assert(RobotsOps.normalizePercent("/%2Ax") === "/%2Ax")
    // rule %70 ≡ literal p, both sides normalized
    assert(!ok("User-agent: *\nDisallow: /%70riv\n", "bot", "/priv/x"))
    assert(!ok("User-agent: *\nDisallow: /priv\n", "bot", "/%70riv/x"))
    // an encoded star is NOT a wildcard: matches the literal %2A octets
    assert(ok("User-agent: *\nDisallow: /%2Apdf\n", "bot", "/xpdf"))
    assert(!ok("User-agent: *\nDisallow: /%2Apdf\n", "bot", "/%2apdf"))
  }

  test("rules() and crawlDelay() agree on group boundaries: a " +
    "crawl-delay line is group body in BOTH parsers") {
    val txt = "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /x\n"
    // b's Disallow must NOT leak into a's group
    assert(ok(txt, "a", "/x"))
    assert(!ok(txt, "b", "/x"))
    assert(RobotsOps.crawlDelay(txt, "a") === Some(2L))
    assert(RobotsOps.crawlDelay(txt, "b").isEmpty)
  }

  test("grammar noise: comments, blank lines, rules before any group") {
    val txt =
      """# header comment
        |Disallow: /orphan
        |User-agent: * # trailing comment
        |
        |Disallow: /x # blank line above does not end the group
        |Sitemap: http://s.example/map.xml
        |Crawl-delay: 10
        |""".stripMargin
    assert(ok(txt, "bot", "/orphan"))  // orphan rule outside any group
    assert(!ok(txt, "bot", "/x"))      // group survived the blank line
    assert(ok(txt, "bot", "/y"))
    assert(ok("", "bot", "/anything")) // empty file → allow all
  }

  test("crawl-delay: group-scoped, specific beats *, first wins, " +
    "unparseable ignored, fail-open") {
    val txt =
      """User-agent: spiderx
        |Crawl-delay: 99
        |
        |User-agent: graftbot
        |Disallow: /p
        |CRAWL-DELAY: 3  # case-insensitive field, comment stripped
        |Crawl-delay: 7  # second value in the chosen group loses
        |
        |User-agent: *
        |Crawl-delay: 5
        |""".stripMargin
    assert(RobotsOps.crawlDelay(txt, "graftbot") === Some(3L))
    assert(RobotsOps.crawlDelay(txt, "otherbot") === Some(5L)) // * group
    assert(RobotsOps.crawlDelay(txt, "spiderx") === Some(99L))
    // unparseable / negative values are skipped, not thrown
    val bad = "User-agent: a\nCrawl-delay: soon\nCrawl-delay: -2\n" +
      "Crawl-delay: 4\n"
    assert(RobotsOps.crawlDelay(bad, "a") === Some(4L))
    // no delay anywhere, or no matching group → None (fail-open)
    assert(RobotsOps.crawlDelay("User-agent: a\nDisallow: /\n", "a").isEmpty)
    assert(RobotsOps.crawlDelay("", "a").isEmpty)
    // a delay line also ENDS an agent run: the next User-agent starts a
    // new group (same boundary rule as allow/disallow)
    val two = "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nCrawl-delay: 6\n"
    assert(RobotsOps.crawlDelay(two, "b") === Some(6L))
    assert(RobotsOps.crawlDelay(two, "a") === Some(2L))
  }

  test("§2.5.1 parse bound: rules beyond 500 KiB are ignored, " +
    "truncation never half-parses a rule") {
    // pad INSIDE the group with comment lines so the 512 KiB bound
    // falls between an in-bound allow and an out-of-bound disallow
    val pad = ("# " + "x" * 61 + "\n") * 8300 // ~531 KiB of comments
    val txt = "User-agent: *\nDisallow: /in\n" + pad +
      "Disallow: /late\nCrawl-delay: 9\n"
    assert(txt.length > 512 * 1024)
    val rs = RobotsOps.rules(txt, "anybot")
    assert(rs.map(_.path) == Seq("/in"),
      s"only the in-bound rule may parse: ${rs.map(_.path)}")
    // the out-of-bound Crawl-delay is gone too (fail-open to none)
    assert(RobotsOps.crawlDelay(txt, "anybot").isEmpty)
    // an in-bound delay still parses when the junk tail is out of bound
    val txt2 = "User-agent: *\nCrawl-delay: 3\n" + pad + "Disallow: /x\n"
    assert(RobotsOps.crawlDelay(txt2, "anybot") === Some(3L))
    assert(RobotsOps.rules(txt2, "anybot").isEmpty)
    // one giant line with NO newline inside the bound: drop it whole —
    // a mid-line cut would parse the truncated Disallow as a shorter,
    // BROADER rule
    val giant = "User-agent: *\nDisallow: /very" + "y" * (600 * 1024)
    assert(RobotsOps.rules(giant, "anybot").isEmpty,
      "a rule cut mid-line must not parse as a broader prefix")
  }
}
