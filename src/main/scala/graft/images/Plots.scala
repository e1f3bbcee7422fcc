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

  private def page(title: String, body: String): String =
    s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>body{font:13px sans-serif}table{border-collapse:collapse}
       |td,th{padding:2px 8px;text-align:left}
       |.bar{display:inline-block;height:10px;background:#636efa;vertical-align:middle}
       |</style></head><body><h3>${esc(title)}</h3>$body</body></html>
       |""".stripMargin

  /** One horizontal-bar chart (`px.bar`, `plots.py:23`). */
  def barHtml(title: String, rows: Seq[(String, Double)],
      colors: Seq[String] = Nil): String = {
    val max = math.max(rows.map(_._2).maxOption.getOrElse(0.0), Double.MinPositiveValue)
    val trs = rows.zipWithIndex.map { case ((k, v), i) =>
      val w = math.max((v / max * 300).round, 1L)
      val c = if (colors.nonEmpty) colors(i % colors.length) else "#636efa"
      s"""<tr><td>${esc(k)}</td><td><span class="bar" style="width:${w}px;background:$c"></span> $v</td></tr>"""
    }.mkString("\n")
    page(title, s"<table>$trs</table>")
  }

  /** The transposed heatmap table (`px.imshow` of the merged/transposed
    * frame, `plots.py:30-40`): rows = classes, columns = index values,
    * cells shaded by value.
    */
  def heatmapHtml(title: String, colNames: Seq[String],
      rows: Seq[(String, Seq[Double])]): String = {
    val all = rows.flatMap(_._2)
    val max = math.max(all.maxOption.getOrElse(0.0), Double.MinPositiveValue)
    val head = (s"<tr><th></th>" +: colNames.map(c => s"<th>${esc(c)}</th>")).mkString + "</tr>"
    val body = rows.map { case (name, vs) =>
      val tds = vs.map { v =>
        val a = math.min(v / max, 1.0)
        f"""<td style="background:rgba(99,110,250,$a%.3f)">$v%.4g</td>"""
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
