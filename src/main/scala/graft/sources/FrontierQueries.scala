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
    // tag bumped sitemap -> sitemap2 when Crawl-delay lines were added
    // to the planted robots (the ensure* existence guard would otherwise
    // keep serving a stale pre-delay tree from a previous round's run)
    val root = workDir(scaledTag("sitemap2"), sfDir)
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
                s"Crawl-delay: ${1 + h % 4}\n" +
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
  private val Agent = "graftbot"

  /** One decoded pass over the sitemap tree, shared by
    * [[SitemapFrontier]] and [[FetchSchedule]]: url-entry rows
    * (kind 0), parsed rule rows (kind 1), urlset-doc markers (kind 2),
    * robots `Sitemap:` declarations (kind 3), and group-scoped
    * `Crawl-delay` values (kind 4, seconds in `mo`). Callers persist.
    */
  private def sitemapRows(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
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
            graft.text.RobotsOps.crawlDelay(txt, Agent).foreach { d =>
              out += ((4, host, "", d.toInt, 0, false))
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
  }

  /** Per distinct (host, path): newest-lastmod freshness, max priority,
    * and the RFC 9309 §2.2.2 decision (longest match, allow on ties,
    * no match → allowed) via the broadcast struct-argmax.
    */
  private def decidePaths(recs: DataFrame): DataFrame = {
    val paths = recs.filter(col("kind") === 0)
      .groupBy("host", "path")
      .agg(max(col("mo")).as("mo"), max(col("pri")).as("pri"))
      .withColumn("fresh", col("mo") >= 2)
    val rules = recs.filter(col("kind") === 1)
      .select(col("host"), col("path").as("rpath"), col("allow"))
    paths
      .join(broadcast(rules),
        paths("host") === rules("host") &&
          paths("path").startsWith(col("rpath")), "left")
      .groupBy(paths("host"), paths("path"), col("fresh"), col("pri"))
      .agg(max(struct(length(col("rpath")).as("l"),
        col("allow").cast("int").as("a"))).as("best"))
      .select(paths("host"), paths("path"), col("fresh"), col("pri"),
        coalesce(col("best.a") === 1, lit(true)).as("ok"))
  }

  object SitemapFrontier extends GraftQuery {
    val name = "q_sitemap_frontier"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val root = ensureSitemapTree(sfDir)
      val recs = sitemapRows(spark, root)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val decided = decidePaths(recs)
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

  /** Create (once per scale factor) the two-snapshot recrawl tree:
    * `old/` and `new/` subtrees of 24 `.warc.gz` files each (host
    * h = i%8). Old file i carries pages j ∈ [0, 4+i%3) at body version
    * v1; new file i carries j ∈ [1, 4+i%3] with even-j bodies bumped
    * to v2 — so per file exactly one page is removed (j=0), one added
    * (j = 4+i%3), even common pages changed, odd common pages
    * unchanged, all closed-form replayable from (i, j).
    */
  private[sources] def ensureDeltaTree(sfDir: String): String = {
    val root = workDir(scaledTag("crdelta"), sfDir)
    if (!Files.exists(Paths.get(root, "old"))) {
      import graft.multimodal.{GzipCodec, WarcCodec}
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      for (snap <- Seq("old", "new"); i <- 0 until 24 * mediaScale) {
        val h = i % 8
        val dir = Paths.get(root, snap, s"${i % 2}")
        Files.createDirectories(dir)
        val np = 4 + i % 3
        val js = if (snap == "old") 0 until np else 1 to np
        val info = GzipCodec.buildMember(WarcCodec.buildRecord(
          "warcinfo", s"<urn:uuid:cd-$snap-$i>", "2026-01-01T00:00:00Z",
          None, s"software: graft $i".getBytes(utf8)))
        val pages = js.map { j =>
          val ver = if (snap == "new" && j % 2 == 0) "v2" else "v1"
          GzipCodec.buildMember(WarcCodec.buildRecord(
            "response", s"<urn:uuid:cd-$snap-$i-$j>",
            "2026-01-01T00:00:00Z", Some(s"http://s$h.example/d$i/$j"),
            s"<html><body>c $i $j $ver</body></html>".getBytes(utf8)))
        }
        Files.write(dir.resolve(f"c$i%03d.warc.gz"),
          (info +: pages).reduce(_ ++ _))
      }
    }
    root
  }

  /** Snapshot-to-snapshot recrawl delta — what changed between two
    * crawls of the same hosts: per host, pages added, removed, changed
    * (content digest differs), and unchanged. This is the incremental-
    * ingest primitive (only `added + changed` flow into downstream
    * curation; `removed` tombstones). Scale shape: page bodies reduce
    * to md5 digests WHERE THE SCAN READS THEM, so the full-outer join
    * that classifies the delta shuffles only (host, uri, digest) rows
    * keyed by uri; at 100 TB both snapshots would be bucketed by uri
    * and the join goes shuffle-free — the plan is the bucketed plan
    * minus the layout. The oracle rebuilds both planted page sets and
    * replays the same outer-join classification closed-form.
    */
  object CrawlDelta extends GraftQuery {
    val name = "q_crawl_delta"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val root = ensureDeltaTree(sfDir)
      def snapshot(snap: String): DataFrame = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .option("recursiveFileLookup", "true")
        .load(s"$root/$snap")
        .select(col("content"))
        .as[Array[Byte]]
        .flatMap { content =>
          val utf8 = java.nio.charset.StandardCharsets.UTF_8
          for {
            ms <- graft.multimodal.GzipCodec.members(content, 1 << 24).toSeq
            mb <- ms
            r <- graft.multimodal.WarcCodec.records(mb.payload).toSeq.flatten
            if r.warcType == "response"
            uri <- r.targetUri.toSeq
          } yield {
            val host = uri.stripPrefix("http://").takeWhile(_ != '/')
            (host, uri,
              graft.functions.PortableHash.md5Hex(new String(r.payload, utf8)))
          }
        }
        .toDF("host", "uri", "digest")
      val o = snapshot("old").withColumnRenamed("digest", "odig")
      val n = snapshot("new").withColumnRenamed("digest", "ndig")
        .withColumnRenamed("host", "nhost").withColumnRenamed("uri", "nuri")
      val both = col("odig").isNotNull && col("ndig").isNotNull
      o.join(n, o("uri") === n("nuri"), "full_outer")
        .select(coalesce(col("host"), col("nhost")).as("host"),
          col("odig"), col("ndig"))
        .groupBy("host")
        .agg(sum(when(col("odig").isNotNull, 1L).otherwise(0L)).as("n_old"),
          sum(when(col("ndig").isNotNull, 1L).otherwise(0L)).as("n_new"),
          sum(when(col("odig").isNull && col("ndig").isNotNull, 1L)
            .otherwise(0L)).as("n_added"),
          sum(when(col("ndig").isNull && col("odig").isNotNull, 1L)
            .otherwise(0L)).as("n_removed"),
          sum(when(both && col("odig") =!= col("ndig"), 1L).otherwise(0L))
            .as("n_changed"),
          sum(when(both && col("odig") === col("ndig"), 1L).otherwise(0L))
            .as("n_same"))
        .orderBy("host")
    }
    val oracle = Some(
      """WITH specs AS (
        |  SELECT i.i AS i, i.i % 8 AS h, 4 + i.i % 3 AS np
        |  FROM unnest(range(0, 24)) i(i)),
        |old_ AS (
        |  SELECT h, i, j.j AS j FROM specs, LATERAL unnest(range(0, np)) j(j)),
        |new_ AS (
        |  SELECT h, i, j.j AS j
        |  FROM specs, LATERAL unnest(range(1, np + 1)) j(j)),
        |d AS (
        |  SELECT coalesce(o.h, n.h) AS h,
        |         o.j IS NOT NULL AS in_old, n.j IS NOT NULL AS in_new,
        |         -- common pages changed iff j even (v1 -> v2 bump)
        |         (o.j IS NOT NULL AND n.j IS NOT NULL AND o.j % 2 = 0)
        |           AS chg
        |  FROM old_ o FULL OUTER JOIN new_ n ON o.i = n.i AND o.j = n.j)
        |SELECT 's' || h || '.example' AS host,
        |       CAST(sum(CASE WHEN in_old THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_old,
        |       CAST(sum(CASE WHEN in_new THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_new,
        |       CAST(sum(CASE WHEN in_new AND NOT in_old THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_added,
        |       CAST(sum(CASE WHEN in_old AND NOT in_new THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_removed,
        |       CAST(sum(CASE WHEN chg THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_changed,
        |       CAST(sum(CASE WHEN in_old AND in_new AND NOT chg
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_same
        |FROM d GROUP BY h ORDER BY host""".stripMargin)
  }

  /** Politeness-scheduled fetch plan — the last step of the frontier
    * pipeline: the robots-gated fresh sitemap paths (the exact
    * `n_frontier` set [[SitemapFrontier]] counts) ordered per host by
    * priority (desc, path asc tiebreak) and laid onto a fetch timeline
    * honoring the host's `Crawl-delay` (de-facto extension, parsed
    * group-scoped by [[graft.text.RobotsOps.crawlDelay]]; absent → 1 s):
    * fetch k of a host starts at (k−1)·delay, so the per-host makespan
    * is (n−1)·delay — the number a crawl planner capacity-checks. Scale
    * shape: everything after the shared decode is per-(host, path)
    * rows; the ranking is one window over host-partitioned frontier
    * rows (no global sort), and delays broadcast. The oracle replays
    * the frontier set, the rank order, and the delay arithmetic
    * closed-form, so a wrong gate, a wrong tiebreak, or a misparsed
    * delay shifts a row.
    */
  object FetchSchedule extends GraftQuery {
    val name = "q_fetch_schedule"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val root = ensureSitemapTree(sfDir)
      val recs = sitemapRows(spark, root)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val frontier = decidePaths(recs)
        .filter(col("fresh") && col("ok"))
        .select(col("host"), col("path"), col("pri"))
      val delays = recs.filter(col("kind") === 4)
        .groupBy("host").agg(max(col("mo")).cast("long").as("delay_s"))
      val w = Window.partitionBy("host")
        .orderBy(col("pri").desc, col("path").asc)
      frontier
        .withColumn("rk", row_number().over(w))
        .join(broadcast(delays), Seq("host"), "left")
        .withColumn("delay_s", coalesce(col("delay_s"), lit(1L)))
        .withColumn("fetch_at", (col("rk") - 1).cast("long") * col("delay_s"))
        .groupBy("host", "delay_s")
        .agg(count(lit(1)).as("n_fetches"),
          max(col("fetch_at")).as("makespan_s"),
          sum(col("fetch_at")).as("total_wait_s"),
          min(when(col("rk") === 1, col("path"))).as("first_path"))
        .select(col("host"), col("delay_s"), col("n_fetches"),
          col("makespan_s"), col("total_wait_s"), col("first_path"))
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
        |fr AS (
        |  SELECT h, p, pri,
        |         row_number() OVER (PARTITION BY h
        |                            ORDER BY pri DESC, p ASC) AS rk
        |  FROM paths WHERE fresh AND ok)
        |SELECT 's' || h || '.example' AS host,
        |       CAST(1 + h % 4 AS BIGINT) AS delay_s,
        |       CAST(count(*) AS BIGINT) AS n_fetches,
        |       CAST((count(*) - 1) * (1 + h % 4) AS BIGINT) AS makespan_s,
        |       CAST((count(*) - 1) * count(*) // 2 * (1 + h % 4) AS BIGINT)
        |         AS total_wait_s,
        |       min(CASE WHEN rk = 1 THEN '/p' || p END) AS first_path
        |FROM fr GROUP BY h ORDER BY host""".stripMargin)
  }

  /** Create (once per scale factor) the revisit tree: 24 `.warc.gz`
    * files (host h = i%8), file i carrying pages j ∈ [0, 3+i%3) of uri
    * `/r{i}/{j}` with body `"x" * (5 + (i+j)%4)` — only FOUR distinct
    * bodies globally, so captures repeat constantly, exactly the shape
    * revisit records exist for. Even j → a full `response`; odd j → a
    * `revisit` record (ISO 28500 §6.7): EMPTY block, `WARC-Refers-To`
    * a synthetic original id, `WARC-Payload-Digest` = md5 of the body
    * it did not re-store.
    */
  private[sources] def ensureRevisitTree(sfDir: String): String = {
    val root = workDir(scaledTag("revisit"), sfDir)
    if (!Files.exists(Paths.get(root, "0"))) {
      import graft.multimodal.{GzipCodec, WarcCodec}
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      for (i <- 0 until 24 * mediaScale) {
        val h = i % 8
        val dir = Paths.get(root, s"${i % 2}")
        Files.createDirectories(dir)
        val info = GzipCodec.buildMember(WarcCodec.buildRecord(
          "warcinfo", s"<urn:uuid:rv$i>", "2026-01-01T00:00:00Z", None,
          s"software: graft $i".getBytes(utf8)))
        val pages = (0 until 3 + i % 3).map { j =>
          val body = "x" * (5 + (i + j) % 4)
          val uri = Some(s"http://s$h.example/r$i/$j")
          val rec =
            if (j % 2 == 0)
              WarcCodec.buildRecord("response", s"<urn:uuid:rv$i-$j>",
                "2026-01-01T00:00:00Z", uri, body.getBytes(utf8))
            else
              WarcCodec.buildRecord("revisit", s"<urn:uuid:rv$i-$j>",
                "2026-01-01T00:00:00Z", uri, Array.emptyByteArray,
                refersTo = Some(s"<urn:uuid:orig-${(i + j) % 4}>"),
                payloadDigest = Some("md5:" +
                  graft.functions.PortableHash.md5Hex(body)))
          GzipCodec.buildMember(rec)
        }
        Files.write(dir.resolve(f"v$i%03d.warc.gz"),
          (info +: pages).reduce(_ ++ _))
      }
    }
    root
  }

  /** Revisit-record dedup accounting (ISO 28500 §6.7 — Common Crawl's
    * identical-payload-digest convention): revisit records store NO
    * body, only the digest of the payload an earlier capture already
    * stored; the accounting join resolves each revisit's digest against
    * the stored-response digest catalog to price what deduplication
    * saved. Scale shape: responses reduce scan-side to
    * (host, digest, len) rows; the digest dimension collapses to ONE
    * row per distinct payload (tiny — that is the premise of payload
    * dedup) and broadcasts onto the revisit rows, so revisit volume
    * never shuffles wide. The oracle replays the planted body-length
    * arithmetic and the even/odd response/revisit split closed-form; a
    * missed digest header, a wrong join, or a revisit counted as
    * stored shifts a byte column.
    */
  object WarcRevisit extends GraftQuery {
    val name = "q_warc_revisit"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val root = ensureRevisitTree(sfDir)
      // kind 0 = stored response (digest computed from the payload),
      // kind 1 = revisit (digest read from WARC-Payload-Digest)
      val recs = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(col("content"))
        .as[Array[Byte]]
        .flatMap { content =>
          val out = Seq.newBuilder[(Int, String, String, Long)]
          for {
            ms <- graft.multimodal.GzipCodec.members(content, 1 << 24).toSeq
            mb <- ms
            r <- graft.multimodal.WarcCodec.records(mb.payload).toSeq.flatten
            uri <- r.targetUri.toSeq
          } {
            val host = uri.stripPrefix("http://").takeWhile(_ != '/')
            if (r.warcType == "response") {
              val d = "md5:" + graft.functions.PortableHash.md5Hex(
                new String(r.payload,
                  java.nio.charset.StandardCharsets.UTF_8))
              out += ((0, host, d, r.contentLength.toLong))
            } else if (r.warcType == "revisit")
              r.payloadDigest.foreach(d => out += ((1, host, d, 0L)))
          }
          out.result()
        }
        .toDF("kind", "host", "digest", "len")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val responses = recs.filter(col("kind") === 0)
      // one row per distinct payload — same digest ⇒ same body ⇒ same len
      val catalog = responses.groupBy("digest")
        .agg(max(col("len")).as("orig_len"))
      val revisits = recs.filter(col("kind") === 1)
        .join(broadcast(catalog), Seq("digest"), "left")
      val stored = responses.groupBy("host")
        .agg(count(lit(1)).as("n_responses"),
          sum(col("len")).as("stored_bytes"))
      val saved = revisits.groupBy("host")
        .agg(count(lit(1)).as("n_revisits"),
          sum(coalesce(col("orig_len"), lit(0L))).as("saved_bytes"),
          sum(when(col("orig_len").isNull, 1L).otherwise(0L))
            .as("n_unresolved"))
      stored.join(saved, Seq("host"), "full_outer")
        .select(col("host"),
          coalesce(col("n_responses"), lit(0L)).as("n_responses"),
          coalesce(col("n_revisits"), lit(0L)).as("n_revisits"),
          coalesce(col("stored_bytes"), lit(0L)).as("stored_bytes"),
          coalesce(col("saved_bytes"), lit(0L)).as("saved_bytes"),
          coalesce(col("n_unresolved"), lit(0L)).as("n_unresolved"))
        .orderBy("host")
    }
    val oracle = Some(
      """WITH specs AS (
        |  SELECT i.i AS i, i.i % 8 AS h, 3 + i.i % 3 AS np
        |  FROM unnest(range(0, 24)) i(i)),
        |pages AS (
        |  SELECT h, j.j AS j, 5 + (i + j.j) % 4 AS len
        |  FROM specs, LATERAL unnest(range(0, np)) j(j))
        |SELECT 's' || h || '.example' AS host,
        |       CAST(sum(CASE WHEN j % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_responses,
        |       CAST(sum(CASE WHEN j % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_revisits,
        |       CAST(sum(CASE WHEN j % 2 = 0 THEN len ELSE 0 END) AS BIGINT)
        |         AS stored_bytes,
        |       CAST(sum(CASE WHEN j % 2 = 1 THEN len ELSE 0 END) AS BIGINT)
        |         AS saved_bytes,
        |       CAST(0 AS BIGINT) AS n_unresolved
        |FROM pages GROUP BY h ORDER BY host""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(SitemapFrontier, CrawlDelta, FetchSchedule, WarcRevisit)
}
