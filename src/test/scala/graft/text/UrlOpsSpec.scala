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
}
