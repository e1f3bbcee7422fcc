package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UrlOps contract: the column canonicalizer and its scan-side Scala
  * twin are ONE rule set — every frontier/dedup component keys on
  * their output, so a divergence silently fragments the (host, path)
  * key space. Pinned value-identical over the variant classes the
  * canonicalizer exists to collapse, plus absolute anchors.
  */
class UrlOpsSpec extends SparkSpec {

  private val variants = Seq(
    "http://s3.example/p4",
    "http://s3.example/p4/",
    "http://s3.example/p4?utm=x",
    "http://s3.example/p4#frag",
    "http://s3.example/p4/?utm=1#f",
    "HTTP://WWW.s3.example/p4",
    "https://WWW.Site.Example/A/B/",
    "https://site.example/a?x=1&y=2",
    "http://www.h.example",        // www, no path
    "http://h.example/",           // root slash
    "http://h.example/p//",        // only ONE trailing slash stripped
    "http://h.example/%7Euser",    // percent forms pass through verbatim
    "ftp://www.h.example/x",       // non-http scheme: www NOT stripped
    "relative/path#frag")

  test("canonicalStr: absolute anchors") {
    assert(UrlOps.canonicalStr("http://s3.example/p4/") ==
      "http://s3.example/p4")
    assert(UrlOps.canonicalStr("HTTP://WWW.s3.example/p4#frag") ==
      "http://s3.example/p4")
    assert(UrlOps.canonicalStr("http://s3.example/p4?utm=x") ==
      "http://s3.example/p4")
    assert(UrlOps.canonicalStr("https://www.site.example/a/b") ==
      "https://site.example/a/b")
    // one page, four spellings, one key
    assert(Seq("http://s3.example/p4", "http://s3.example/p4/",
      "http://s3.example/p4?utm=x", "HTTP://WWW.s3.example/p4#frag")
      .map(UrlOps.canonicalStr).distinct.size == 1)
    // www is only stripped directly after an http(s) scheme
    assert(UrlOps.canonicalStr("ftp://www.h.example/x") ==
      "ftp://www.h.example/x")
    assert(UrlOps.canonicalStr("http://h.example/p//") ==
      "http://h.example/p/")
  }

  test("column canonical ≡ canonicalStr on every variant class") {
    import spark.implicits._
    val got = variants.toDF("u")
      .select(col("u"), UrlOps.canonical(col("u")).as("c"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    variants.foreach { v =>
      assert(got(v) == UrlOps.canonicalStr(v), s"divergence on: $v")
    }
  }

  private val frontierVariants = variants ++ Seq(
    // the frontier-key classes (RFC 3986 §6.2.2.1): path case KEPT,
    // routing query KEPT, tracking params dropped
    "http://s3.example/Article?id=1",
    "http://s3.example/Article?id=2",
    "HTTP://WWW.s3.example/Article?id=1#frag",
    "http://s3.example/a?utm_source=x&id=1&utm_campaign=y",
    "http://s3.example/a?id=1&gclid=abc",
    "http://s3.example/a?gclid_x=1",       // NOT tracking: name differs
    "http://s3.example/a?fbclid=z",        // all-tracking query -> dropped
    "http://s3.example/a/?id=1",           // path slash drops, query stays
    "http://s3.example/a?utm_x",           // valueless tracking param
    "http://s3.example/a?&id=1&",          // empty params drop
    "http://s3.example/PaGe/Sub",          // path case preserved
    "http://h.example/p?b=2&a=1")          // param ORDER preserved

  test("frontierCanonicalStr: absolute anchors") {
    import UrlOps.frontierCanonicalStr
    // scheme+host lowercase ONLY; path case survives
    assert(frontierCanonicalStr("HTTP://WWW.S3.Example/PaGe") ==
      "http://s3.example/PaGe")
    // routing query params survive, in order; tracking params drop
    assert(frontierCanonicalStr(
      "http://s3.example/a?utm_source=x&id=1&utm_campaign=y") ==
      "http://s3.example/a?id=1")
    assert(frontierCanonicalStr("http://s3.example/a?b=2&a=1") ==
      "http://s3.example/a?b=2&a=1")
    // /article?id=1 and ?id=2 stay DISTINCT frontier keys
    assert(frontierCanonicalStr("http://s3.example/q?id=1") !=
      frontierCanonicalStr("http://s3.example/q?id=2"))
    // /Page and /page stay DISTINCT (paths are case-sensitive)
    assert(frontierCanonicalStr("http://s3.example/Page") !=
      frontierCanonicalStr("http://s3.example/page"))
    // all-tracking query drops the '?' entirely
    assert(frontierCanonicalStr("http://s3.example/a?fbclid=z&utm_x") ==
      "http://s3.example/a")
    // gclid only matches as the EXACT name
    assert(frontierCanonicalStr("http://s3.example/a?gclid_x=1") ==
      "http://s3.example/a?gclid_x=1")
    assert(frontierCanonicalStr("http://s3.example/a?gclid=1") ==
      "http://s3.example/a")
    // trailing path slash drops with the query kept
    assert(frontierCanonicalStr("http://s3.example/a/?id=1") ==
      "http://s3.example/a?id=1")
    // fragment and www still collapse
    assert(frontierCanonicalStr("HTTP://WWW.s3.example/Article?id=1#f") ==
      "http://s3.example/Article?id=1")
  }

  test("column frontierCanonical ≡ frontierCanonicalStr on every class") {
    import spark.implicits._
    // THREE implementations pinned pairwise: the native codegen
    // expression (production), the pure-column reference chain, and
    // the scan twin — the column chain is the independent
    // implementation that keeps the native-vs-twin check from being
    // vacuous (the expression delegates to the twin)
    val got = frontierVariants.toDF("u")
      .select(col("u"), UrlOps.frontierCanonical(col("u")).as("c"),
        UrlOps.frontierCanonicalColumns(col("u")).as("ref"))
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    frontierVariants.foreach { v =>
      assert(got(v)._1 == UrlOps.frontierCanonicalStr(v),
        s"native divergence on: $v")
      assert(got(v)._2 == UrlOps.frontierCanonicalStr(v),
        s"column-chain divergence on: $v")
    }
  }

  test("resolve: RFC 3986 §5.4 reference-resolution examples") {
    // the spec's own vectors against base "http://a/b/c/d;p?q";
    // resolve drops ref fragments (a fetch target has no fragment), so
    // the #s-bearing vectors pin the spec result minus its fragment
    val base = "http://a/b/c/d;p?q"
    val normal = Seq( // §5.4.1
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q",
      "g#s" -> "http://a/b/c/g",
      "g?y#s" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    val abnormal = Seq( // §5.4.2
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "http:g" -> "http:g") // strict parser: same-scheme ref replaces
    (normal ++ abnormal).foreach { case (ref, want) =>
      assert(UrlOps.resolve(base, ref) == want, s"resolve(base, $ref)")
    }
    // the crawl shapes: protocol-relative and empty-path bases
    assert(UrlOps.resolve("http://h.example/a/b?x=1", "//cdn.example/r") ==
      "http://cdn.example/r")
    assert(UrlOps.resolve("http://h.example", "p/q") ==
      "http://h.example/p/q")
    assert(UrlOps.resolve("https://h.example/a/", "../up?id=2#f") ==
      "https://h.example/up?id=2")
  }

  test("randomized URLs: both twin pairs agree on every generated URL") {
    import spark.implicits._
    // structured random URL generator covering the decision space:
    // scheme case, www, host case, path depth/case, trailing slash,
    // param mix (routing/tracking/empty/valueless/prefix-collision),
    // fragment — a divergence anywhere fragments a frontier key space
    val rnd = new scala.util.Random(0x13)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val urls = (0 until 400).map { _ =>
      val scheme = pick(Seq("http://", "https://", "HTTP://", "HtTpS://"))
      val www = pick(Seq("", "www.", "WWW."))
      val host = pick(Seq("ex.com", "Ex.COM", "s3.example", "A.b.C"))
      val segs = (0 until rnd.nextInt(3)).map(_ =>
        pick(Seq("p1", "Page", "UPPER", "q", "d9"))).mkString("/")
      val slash = pick(Seq("", "/"))
      val params = (0 until rnd.nextInt(4)).map(_ =>
        pick(Seq("id=1", "q=2", "utm_source=x", "utm_x", "gclid=9",
          "gclid_x=1", "fbclid=z", "", "a=b=c", "B=2")))
      val query = if (params.isEmpty) "" else "?" + params.mkString("&")
      val frag = pick(Seq("", "#f", "#frag?x=1"))
      s"$scheme$www$host${if (segs.isEmpty) "" else "/" + segs}$slash$query$frag"
    }.distinct
    val rows = urls.toDF("u")
      .select(col("u"), UrlOps.canonical(col("u")).as("c"),
        UrlOps.frontierCanonical(col("u")).as("f"),
        UrlOps.frontierCanonicalColumns(col("u")).as("fr"))
      .collect()
    rows.foreach { r =>
      val u = r.getString(0)
      assert(r.getString(1) == UrlOps.canonicalStr(u),
        s"corpus twins diverge on: $u")
      assert(r.getString(2) == UrlOps.frontierCanonicalStr(u),
        s"frontier native/twin diverge on: $u")
      assert(r.getString(3) == UrlOps.frontierCanonicalStr(u),
        s"frontier column-chain/twin diverge on: $u")
    }
  }
}
