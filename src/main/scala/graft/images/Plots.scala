package graft.images

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Stage-4 plot emission (reference `plots.py:13-60` + `dash.html`): the
  * same `plots/<type>/<name>.html` layout, fed by the SAME read path — the
  * golden `stats/<type>/<class>.csv` files, header-addressed by column NAME
  * exactly as pandas does (a wrong header KeyErrors there and throws here).
  * Rendered as dependency-free static HTML (CSS bars / a shaded table)
  * instead of Plotly: the environment ships no JS/plotting libs, and the
  * north star is the data path; the chart data is byte-identical.
  */
object Plots {

  /** Read one golden CSV (`;`-separated, header row) and project the two
    * named columns — the `pd.read_csv(...)[x],[y]` of `plots.py:21-23`.
    * Missing column → IllegalArgumentException, mirroring pandas' KeyError.
    */
  def readStat(file: Path, x: String, y: String): Seq[(String, Double)] = {
    val lines = Files.readAllLines(file).asScala.toSeq.filter(_.nonEmpty)
    val header = lines.head.split(";", -1)
    def idx(c: String): Int = {
      val i = header.indexOf(c)
      require(i >= 0, s"column '$c' not in ${file.getFileName} header ${header.toSeq}")
      i
    }
    val (xi, yi) = (idx(x), idx(y))
    lines.tail.map { l =>
      val f = l.split(";", -1)
      (f(xi), f(yi).toDouble)
    }
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Shared page chrome: recessive text tokens, a floating tooltip layer,
    * and the hover wiring every chart reuses (elements carrying
    * `data-tip` get a cursor-tracking tooltip — the interactivity the
    * reference got from Plotly, here dependency-free).
    */
  private def page(title: String, body: String): String =
    s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>body{font:13px sans-serif;color:#1f2430;background:#fcfcfb;margin:12px}
       |h3{font-size:14px;font-weight:600}
       |table{border-collapse:collapse}td,th{padding:2px 8px;text-align:left}
       |.grid line{stroke:#e8e8e4}.axis text{fill:#7a7f8a;font-size:11px}
       |[data-tip]{cursor:default}
       |svg .b:hover{filter:brightness(0.82)}
       |td[data-tip]:hover{outline:2px solid #1f2430;outline-offset:-2px}
       |#tip{position:fixed;pointer-events:none;display:none;background:#1f2430;
       |color:#fcfcfb;padding:3px 8px;border-radius:4px;font-size:12px;z-index:9}
       |details{margin-top:10px}summary{color:#7a7f8a;cursor:pointer}
       |</style></head><body><h3>${esc(title)}</h3>$body
       |<div id="tip"></div><script>
       |var tip=document.getElementById('tip');
       |document.addEventListener('mousemove',function(e){
       | var t=e.target.closest('[data-tip]');
       | if(!t){tip.style.display='none';return;}
       | tip.textContent=t.getAttribute('data-tip');tip.style.display='block';
       | tip.style.left=(e.clientX+12)+'px';tip.style.top=(e.clientY+12)+'px';});
       |</script></body></html>
       |""".stripMargin

  private def fmtV(v: Double): String =
    if (v == v.floor && v.abs < 1e15) v.toLong.toString else f"$v%.4g"

  /** Accessibility fallback: the chart's data as a plain table. */
  private def dataTable(rows: Seq[(String, Double)]): String =
    rows.map { case (k, v) => s"<tr><td>${esc(k)}</td><td>${fmtV(v)}</td></tr>" }
      .mkString("<details><summary>data table</summary><table>", "\n", "</table></details>")

  /** One bar chart (`px.bar`, `plots.py:23`) as inline SVG: recessive
    * gridlines, 2px gaps between bars, rounded data-ends anchored to the
    * baseline, and a per-bar hover tooltip. Single series — the title
    * names it, so no legend; a data table rides along for accessibility.
    */
  def barHtml(title: String, rows: Seq[(String, Double)],
      colors: Seq[String] = Nil): String = {
    val W = 640; val H = 300
    val mL = 48; val mR = 8; val mT = 8; val mB = 48
    val pw = W - mL - mR; val ph = H - mT - mB
    val max = math.max(rows.map(_._2).maxOption.getOrElse(0.0), Double.MinPositiveValue)
    val n = math.max(rows.size, 1)
    val band = pw.toDouble / n
    val bw = math.max(band - 2, 1.0) // 2px surface gap between bars
    val ticks = (0 to 4).map(i => max * i / 4)
    val grid = ticks.map { t =>
      val y = mT + ph - t / max * ph
      f"""<line x1="$mL" y1="$y%.1f" x2="${W - mR}" y2="$y%.1f"/>"""
    }.mkString
    val yLabels = ticks.map { t =>
      val y = mT + ph - t / max * ph
      f"""<text x="${mL - 6}" y="${y + 4}%.1f" text-anchor="end">${esc(fmtV(t))}</text>"""
    }.mkString
    val xEvery = math.max(1, n / 16) // thin labels when crowded
    val xLabels = rows.zipWithIndex.collect {
      case ((k, _), i) if i % xEvery == 0 =>
        val x = mL + band * i + band / 2
        f"""<text x="$x%.1f" y="${mT + ph + 16}" text-anchor="middle">${esc(k)}</text>"""
    }.mkString
    val bars = rows.zipWithIndex.map { case ((k, v), i) =>
      val x = mL + band * i + (band - bw) / 2
      val h = math.max(v / max * ph, 1.0)
      val y = mT + ph - h
      val r = math.min(4.0, math.min(bw / 2, h)) // rounded data-end, flat baseline
      val c = if (colors.nonEmpty) colors(i % colors.length) else "#636efa"
      f"""<path class="b" data-tip="${esc(k)}: ${esc(fmtV(v))}" fill="$c" d="M$x%.1f ${mT + ph}
         |V${y + r}%.1f Q$x%.1f $y%.1f ${x + r}%.1f $y%.1f H${x + bw - r}%.1f
         |Q${x + bw}%.1f $y%.1f ${x + bw}%.1f ${y + r}%.1f V${mT + ph} Z"/>""".stripMargin
        .replace("\n", " ")
    }.mkString("\n")
    page(title,
      s"""<svg width="$W" height="$H" role="img" aria-label="${esc(title)}">
         |<g class="grid">$grid</g><g class="axis">$yLabels$xLabels</g>$bars</svg>
         |${dataTable(rows)}""".stripMargin)
  }

  /** The transposed heatmap (`px.imshow` with `text_auto=True`,
    * `plots.py:30-40`): rows = classes, columns = index values. A
    * sequential single-hue ramp (light→dark) carries magnitude, every
    * cell keeps its printed value (ink flips to light past mid-ramp),
    * and hover outlines the cell with a row × column × value tooltip.
    */
  def heatmapHtml(title: String, colNames: Seq[String],
      rows: Seq[(String, Seq[Double])]): String = {
    val all = rows.flatMap(_._2)
    val max = math.max(all.maxOption.getOrElse(0.0), Double.MinPositiveValue)
    val head = (s"<tr><th></th>" +: colNames.map(c => s"<th>${esc(c)}</th>")).mkString + "</tr>"
    val body = rows.map { case (name, vs) =>
      val tds = vs.zip(colNames).map { case (v, cn) =>
        val a = math.min(v / max, 1.0)
        val ink = if (a > 0.55) "#fcfcfb" else "#1f2430"
        f"""<td data-tip="${esc(name)} × ${esc(cn)}: ${esc(fmtV(v))}"
           | style="background:rgba(99,110,250,$a%.3f);color:$ink">${esc(fmtV(v))}</td>"""
          .stripMargin.replace("\n", "")
      }.mkString
      s"<tr><th>${esc(name)}</th>$tds</tr>"
    }.mkString("\n")
    page(title, s"<table>$head$body</table>")
  }

  /** `plots(type, x, y, classes)` (`plots.py:13-24`): one bar chart per
    * class CSV, named by COCO class like the reference.
    */
  def plots(outDir: String, tpe: String, x: String, y: String,
      classes: Seq[Int]): Unit = {
    val dir = Paths.get(outDir, "plots", tpe)
    Files.createDirectories(dir)
    classes.foreach { cls =>
      val rows = readStat(Paths.get(outDir, "stats", tpe, s"$cls.csv"), x, y)
      Files.writeString(dir.resolve(s"${CocoClasses.name(cls)}.html"),
        barHtml(s"$tpe — ${CocoClasses.name(cls)}", rows))
    }
  }

  /** `heatmap(type, index, values, column)` (`plots.py:27-40`): inner-merge
    * the per-class CSVs on the index column, transpose, shade.
    */
  def heatmap(outDir: String, tpe: String, indexColumn: String,
      indexValues: Seq[String], column: String, classes: Seq[Int]): Unit = {
    val perClass = classes.map { cls =>
      val m = readStat(Paths.get(outDir, "stats", tpe, s"$cls.csv"),
        indexColumn, column).toMap
      CocoClasses.name(cls) -> m
    }
    // inner merge: keep index values present in EVERY class file (pd.merge
    // default how='inner', plots.py:35)
    val keep = indexValues.filter(v => perClass.forall(_._2.contains(v)))
    val rows = perClass.map { case (name, m) => name -> keep.map(m) }
    val dir = Paths.get(outDir, "plots", tpe)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("heatmap.html"),
      heatmapHtml(s"$tpe heatmap", keep, rows))
  }

  /** `color_plot()` (`plots.py:43-50`): closest-primary bars in the fixed
    * six plot colors.
    */
  def colorPlot(outDir: String): Unit = {
    val rows = readStat(Paths.get(outDir, "stats", "closest_primary", "results.csv"),
      "primary_color", "count")
    val dir = Paths.get(outDir, "plots", "closest_primary")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("results.html"),
      barHtml("closest primary color", rows,
        Seq("red", "green", "blue", "cyan", "yellow", "magenta")))
  }

  /** The static dashboard (`dash.html`): a flex grid of `<embed>` panels
    * pointing at the same relative `plots/<type>/…` chart files the
    * reference's dashboard embeds (`dash.html:55-78`) — regenerated with
    * our own minimal markup, not copied. Panels whose chart was not
    * emitted (class not in this run's set) are skipped.
    */
  def dashboard(outDir: String): Unit = {
    val panels = Seq(
      "plots/alphabet_count_avg/heatmap.html" ->
        "Heatmap: average detections by landmark first letter × class",
      "plots/alphabet_count_avg/person.html" ->
        "Average people per photo by landmark first letter",
      "plots/closest_primary/results.html" ->
        "Closest primary color to each image's dominant color",
      "plots/dogs_by_name_length/dog.html" ->
        "Average dogs detected by landmark-name length band",
      "plots/people_in_places_with_people/person.html" ->
        "People: all photos vs landmarks named 'people'")
      .filter { case (rel, _) => Files.exists(Paths.get(outDir, rel)) }
    val divs = panels.map { case (rel, caption) =>
      s"""<div class="panel"><embed type="text/html" src="./$rel"><p>${esc(caption)}</p></div>"""
    }.mkString("\n")
    val html =
      s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>graft dashboard</title>
         |<style>body{margin:0;font:12px sans-serif}
         |main{display:flex;flex-wrap:wrap;height:100vh}
         |.panel{flex:1 1 45%;display:flex;flex-direction:column;margin:1em;text-align:center}
         |embed{flex:1;width:100%}</style></head>
         |<body><main>$divs</main></body></html>
         |""".stripMargin
    Files.writeString(Paths.get(outDir, "dash.html"), html)
  }

  /** The reference's full emission list (`plots.py:53-60` + `dash.html`),
    * over the stat tree [[RunPipeline.run]] writes.
    */
  def writeAll(outDir: String, classes: Seq[Int],
      cities: Seq[String] = StatsPipeline.Cities): Unit = {
    colorPlot(outDir)
    plots(outDir, "alphabet_count", "letter", "count", classes)
    plots(outDir, "alphabet_count_avg", "letter", "avg_count", classes)
    plots(outDir, "people_in_places_with_people", "files considered",
      "avg_detections", classes.take(1))
    plots(outDir, "dogs_by_name_length", "length_of_landmark_name",
      "avg_detections", classes)
    heatmap(outDir, "alphabet_count", "letter", ('A' to 'Z').map(_.toString),
      "count", classes)
    heatmap(outDir, "alphabet_count_avg", "letter", ('A' to 'Z').map(_.toString),
      "avg_count", classes)
    heatmap(outDir, "avg_obj_per_city", "city", cities, "avg_detections", classes)
    dashboard(outDir)
  }
}
