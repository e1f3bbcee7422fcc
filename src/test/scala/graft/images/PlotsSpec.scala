package graft.images

import org.scalatest.funsuite.AnyFunSuite

/** The chart emitters: structural checks on the dependency-free
  * interactive output (SVG marks, hover layer, data-table fallback).
  */
class PlotsSpec extends AnyFunSuite {

  private val rows = Seq("A" -> 3.0, "B" -> 7.0, "C" -> 1.0)

  private def marks(html: String): Int =
    "class=\"b\"".r.findAllIn(html).size

  test("barHtml: one SVG mark per row, hover tips, table fallback") {
    val html = Plots.barHtml("t", rows)
    assert(marks(html) == rows.size)
    assert(html.contains("data-tip=\"B: 7\""))
    assert(html.contains("<svg") && html.contains("aria-label"))
    assert(html.contains("data table")) // accessibility fallback
    assert(html.contains("id=\"tip\"")) // hover layer present
    // semantic colors (closest-primary) override the default hue in order
    val colored = Plots.barHtml("t", rows, Seq("red", "green", "blue"))
    assert(colored.contains("fill=\"red\"") && colored.contains("fill=\"blue\""))
  }

  test("heatmapHtml: per-cell tooltip and mid-ramp ink flip") {
    val html = Plots.heatmapHtml("h", Seq("A", "B"),
      Seq("person" -> Seq(1.0, 10.0), "dog" -> Seq(0.0, 5.0)))
    assert(html.contains("data-tip=\"person × B: 10\""))
    // max cell is full ramp → light ink; zero cell keeps dark ink
    assert(html.contains("color:#fcfcfb") && html.contains("color:#1f2430"))
    // every value stays printed (text_auto parity with the reference)
    Seq("1", "10", "0", "5").foreach(v => assert(html.contains(s">$v</td>")))
  }

  test("bar geometry: bars stay inside the plot area") {
    val html = Plots.barHtml("t", (1 to 26).map(i => s"L$i" -> i.toDouble))
    // 26 bars, thinned x labels (every 2nd), no negative coordinates
    assert(marks(html) == 26)
    assert(!html.contains("\"-"))
  }
}
