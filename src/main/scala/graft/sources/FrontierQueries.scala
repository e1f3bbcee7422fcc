package graft.sources

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import SourceQueries.{workDir, mediaScale, scaledTag}

/** Crawl-frontier scheduling tier (round 11): the discovery side of a
  * recrawl — robots.txt declares the sitemaps, sitemap indexes fan out
  * to urlsets, urlsets carry freshness/priority, and RFC 9309 rules
  * gate what may actually be fetched. Same scale stance as the rest of
  * the archive tier: all parsing happens where the scan reads the
  * bytes; only per-(host, path) candidate rows and tiny per-host rule
  * sets move afterwards, and rule/decision joins broadcast — link and
  * URL volume never meets a wide join.
  */
object FrontierQueries {

  /** Create (once per scale factor) the sitemap crawl tree: 24
    * `.warc.gz` files over 8 hosts (3 per host). File i carries a
    * warcinfo, host s(i%8)'s sitemap resources — a plain urlset, or
    * for hosts h%4==3 a `<sitemapindex>` plus its two child urlsets
    * (even/odd entry split, same final URL set) — and, in the first
    * file per host (i < 8), the host's robots.txt with a global
    * `Sitemap:` declaration and its graftbot group (h%3==0 → the
    * empty-Disallow no-op; else `Disallow: /p{(h+1)%9}`). Entry j of
    * file i: path `/p{(i+2j)%9}`, lastmod `2026-0{1+(i+j)%3}-01`,
    * priority `0.{3+(i+j)%7}` — every column of the frontier row is
    * closed-form replayable from (i, j).
    */
  private[sources] def ensureSitemapTree(sfDir: String): String = {
    val root = workDir(scaledTag("sitemap"), sfDir)
    if (!Files.exists(Paths.get(root, "0"))) {
      import graft.multimodal.{GzipCodec, WarcCodec}
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      for (i <- 0 until 24 * mediaScale) {
        val h = i % 8
        val dir = Paths.get(root, s"${i % 2}")
        Files.createDirectories(dir)
        def rec(tpe: String, id: String, uri: String, body: String) =
          GzipCodec.buildMember(WarcCodec.buildRecord(
            tpe, s"<urn:uuid:$id>", "2026-01-01T00:00:00Z", Some(uri),
            body.getBytes(utf8)))
        val info = GzipCodec.buildMember(WarcCodec.buildRecord(
          "warcinfo", s"<urn:uuid:sm$i>", "2026-01-01T00:00:00Z", None,
          s"software: graft $i".getBytes(utf8)))
        val robots =
          if (i < 8) {
            val dis =
              if (h % 3 == 0) "Disallow:\n"
              else s"Disallow: /p${(h + 1) % 9}\n"
            Seq(rec("resource", s"rob$i",
              s"http://s$h.example/robots.txt",
              s"# host s$h\nUser-agent: graftbot\n$dis" +
                s"Sitemap: http://s$h.example/sitemap.xml\n"))
          } else Seq.empty
        val entries = (0 until 3 + i % 4).map { j =>
          val lastmod = f"2026-0${1 + (i + j) % 3}-01"
          val pri = s"0.${3 + (i + j) % 7}"
          (j, s"<url><loc>http://s$h.example/p${(i + 2 * j) % 9}</loc>" +
            s"<lastmod>$lastmod</lastmod><priority>$pri</priority></url>")
        }
        def urlset(es: Seq[String]) =
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
            es.mkString + "</urlset>"
        val maps =
          if (h % 4 == 3) {
            val (even, odd) = entries.partition(_._1 % 2 == 0)
            val idx =
              "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
                "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
                s"<sitemap><loc>http://s$h.example/sm${i}a.xml</loc></sitemap>" +
                s"<sitemap><loc>http://s$h.example/sm${i}b.xml</loc></sitemap>" +
                "</sitemapindex>"
            Seq(rec("resource", s"idx$i", s"http://s$h.example/sitemap.xml", idx),
              rec("resource", s"ch${i}a", s"http://s$h.example/sm${i}a.xml",
                urlset(even.map(_._2))),
              rec("resource", s"ch${i}b", s"http://s$h.example/sm${i}b.xml",
                urlset(odd.map(_._2))))
          } else
            Seq(rec("resource", s"map$i", s"http://s$h.example/sitemap.xml",
              urlset(entries.map(_._2))))
        Files.write(dir.resolve(f"s$i%03d.warc.gz"),
          (Seq(info) ++ robots ++ maps).reduce(_ ++ _))
      }
    }
    root
  }

  /** Sitemap-driven recrawl frontier (sitemaps.org protocol + RFC 9309),
    * composed: robots.txt `Sitemap:` declarations, `<sitemapindex>`
    * fan-out, urlset freshness (a path is fresh iff its NEWEST lastmod
    * across all mentions passes the 2026-01-15 recrawl cutoff),
    * max-priority per path, and the robots allow/deny gate — one
    * frontier summary row per host. Scale shape: urlset parsing is
    * scan-side; candidates reduce to distinct (host, path) before the
    * rule join; rules are per-host tiny and broadcast with the same
    * struct-argmax longest-match decision as
    * [[ArchiveQueries.RobotsFrontier]]. The oracle replays the planted
    * generator AND the gate arithmetic closed-form, so a missed child
    * sitemap, a stale-max freshness bug, or a wrong robots pick shifts
    * a count.
    */
  object SitemapFrontier extends GraftQuery {
    val name = "q_sitemap_frontier"
    private val Agent = "graftbot"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val root = ensureSitemapTree(sfDir)
      // one decoded pass: url-entry rows (kind 0), parsed rule rows
      // (kind 1), urlset-doc markers (kind 2), robots Sitemap:
      // declarations (kind 3); persisted — four consumers below
      val recs = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(col("content"))
        .as[Array[Byte]]
        .flatMap { content =>
          val utf8 = java.nio.charset.StandardCharsets.UTF_8
          val out = Seq.newBuilder[(Int, String, String, Int, Int, Boolean)]
          for {
            ms <- graft.multimodal.GzipCodec.members(content, 1 << 24).toSeq
            mb <- ms
            r <- graft.multimodal.WarcCodec.records(mb.payload).toSeq.flatten
            uri <- r.targetUri.toSeq
            if r.warcType == "resource"
          } {
            val host = uri.stripPrefix("http://").takeWhile(_ != '/')
            val txt = new String(r.payload, utf8)
            if (uri.endsWith("/robots.txt")) {
              graft.text.RobotsOps.rules(txt, Agent).foreach { rule =>
                out += ((1, host, rule.path, 0, 0, rule.allow))
              }
              graft.text.SitemapOps.declaredInRobots(txt).foreach { sm =>
                out += ((3, host, sm, 0, 0, false))
              }
            } else if (uri.endsWith(".xml") &&
              graft.text.SitemapOps.isUrlset(txt)) {
              out += ((2, host, "", 0, 0, false))
              graft.text.SitemapOps.urlEntries(txt).foreach { e =>
                val path = e.loc.stripPrefix(s"http://$host")
                val mo = e.lastmod.map(_.substring(5, 7).toInt).getOrElse(0)
                val pri = e.priority
                  .map(s => math.round(s.toDouble * 10).toInt).getOrElse(5)
                out += ((0, host, path, mo, pri, false))
              }
            }
          }
          out.result()
        }
        .toDF("kind", "host", "path", "mo", "pri", "allow")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val paths = recs.filter(col("kind") === 0)
        .groupBy("host", "path")
        .agg(max(col("mo")).as("mo"), max(col("pri")).as("pri"))
        .withColumn("fresh", col("mo") >= 2)
      val rules = recs.filter(col("kind") === 1)
        .select(col("host"), col("path").as("rpath"), col("allow"))
      // decision per distinct (host, path): RFC 9309 §2.2.2 longest
      // match, allow on ties, no match → allowed
      val decided = paths
        .join(broadcast(rules),
          paths("host") === rules("host") &&
            paths("path").startsWith(col("rpath")), "left")
        .groupBy(paths("host"), paths("path"), col("fresh"), col("pri"))
        .agg(max(struct(length(col("rpath")).as("l"),
          col("allow").cast("int").as("a"))).as("best"))
        .select(paths("host"), col("fresh"), col("pri"),
          coalesce(col("best.a") === 1, lit(true)).as("ok"))
      val declared = recs.filter(col("kind") === 3)
        .groupBy("host").agg(count(lit(1)).as("n_declared"))
      val smDocs = recs.filter(col("kind") === 2)
        .groupBy("host").agg(count(lit(1)).as("n_sitemaps"))
      decided.groupBy("host")
        .agg(count(lit(1)).as("n_urls"),
          sum(when(col("fresh"), 1L).otherwise(0L)).as("n_fresh"),
          sum(when(col("fresh") && col("ok"), 1L).otherwise(0L))
            .as("n_frontier"),
          sum(when(col("fresh") && col("ok"), col("pri").cast("long"))
            .otherwise(0L)).as("pri_sum"))
        .join(broadcast(declared), Seq("host"), "left")
        .join(broadcast(smDocs), Seq("host"), "left")
        .select(col("host"),
          coalesce(col("n_declared"), lit(0L)).as("n_declared"),
          coalesce(col("n_sitemaps"), lit(0L)).as("n_sitemaps"),
          col("n_urls"), col("n_fresh"), col("n_frontier"), col("pri_sum"))
        .orderBy("host")
    }
    val oracle = Some(
      """WITH specs AS (
        |  SELECT i.i AS i, i.i % 8 AS h, 3 + i.i % 4 AS ne
        |  FROM unnest(range(0, 24)) i(i)),
        |entries AS (
        |  SELECT h, (i + 2 * j.j) % 9 AS p, 1 + (i + j.j) % 3 AS mo,
        |         3 + (i + j.j) % 7 AS pri
        |  FROM specs, LATERAL unnest(range(0, ne)) j(j)),
        |paths AS (
        |  SELECT h, p, max(mo) >= 2 AS fresh, max(pri) AS pri,
        |         CASE WHEN h % 3 = 0 THEN TRUE
        |              ELSE p <> (h + 1) % 9 END AS ok
        |  FROM entries GROUP BY h, p),
        |sm AS (
        |  SELECT h, sum(CASE WHEN h % 4 = 3 THEN 2 ELSE 1 END) AS n_sitemaps
        |  FROM specs GROUP BY h)
        |SELECT 's' || paths.h || '.example' AS host,
        |       CAST(1 AS BIGINT) AS n_declared,
        |       CAST(sm.n_sitemaps AS BIGINT) AS n_sitemaps,
        |       CAST(count(*) AS BIGINT) AS n_urls,
        |       CAST(sum(CASE WHEN fresh THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_fresh,
        |       CAST(sum(CASE WHEN fresh AND ok THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_frontier,
        |       CAST(sum(CASE WHEN fresh AND ok THEN pri ELSE 0 END)
        |         AS BIGINT) AS pri_sum
        |FROM paths JOIN sm ON sm.h = paths.h
        |GROUP BY paths.h, sm.n_sitemaps
        |ORDER BY host""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(SitemapFrontier)
}
