package graft

import graft.render.{Render, Svg}

/** The SVG rendering tier: well-formed XML, byte-determinism, exact
  * geometry, and the end-to-end charts over real query outputs — the
  * reference's matplotlib artifacts re-expressed as spec-checkable
  * text. */
class RenderSpec extends SparkSpec {

  private def parseXml(svg: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
  }

  test("lineChart: well-formed, deterministic, exact point geometry") {
    val series = Seq(("a", Seq((0.0, 0.0), (10.0, 100.0))),
      ("b", Seq((0.0, 100.0), (10.0, 0.0))))
    val svg = Svg.lineChart(series, "t", "x", "y", w = 840, h = 480)
    assert(parseXml(svg).getDocumentElement.getTagName == "svg")
    assert(svg == Svg.lineChart(series, "t", "x", "y", w = 840, h = 480))
    // margins (64, 24, 44, 52): x=0 → px 64; x=10 → px 840-24=816;
    // y=0 → py 480-52=428; y=100 → py 44 — series a runs corner to corner
    assert(svg.contains("""points="64.00,428.00 816.00,44.00""""))
    // both series present with distinct palette colors
    assert(svg.contains("#1f77b4") && svg.contains("#ff7f0e"))
    // NaN points are skipped, not rendered as NaN coordinates
    val withNan = Svg.lineChart(
      Seq(("a", Seq((0.0, Double.NaN), (1.0, 1.0), (2.0, 2.0)))), "t", "x", "y")
    assert(!withNan.contains("NaN"))
  }

  test("heatmap: diverging endpoints exact, annotations formatted, symmetric reads") {
    assert(Svg.divergingColor(1.0) == "#b40426") // coolwarm red end
    assert(Svg.divergingColor(-1.0) == "#3b4cc0") // coolwarm blue end
    assert(Svg.divergingColor(0.0) == "#ffffff") // neutral middle
    val labels = Seq("x", "y")
    val svg = Svg.heatmap(labels,
      (a, b) => if (a == b) 1.0 else -0.5, "corr")
    assert(parseXml(svg).getDocumentElement.getTagName == "svg")
    // annot=True, fmt=".2f": the off-diagonal annotation text
    assert(svg.contains(">-0.50</text>") && svg.contains(">1.00</text>"))
    // saturated diagonal flips annotation to white for contrast
    assert(svg.contains("""fill="#ffffff">1.00</text>"""))
  }

  test("barChart: bars scale to max, labels and values annotated") {
    val svg = Svg.barChart(Seq(("u1", 50.0), ("u2", 100.0)), "t", "v",
      w = 640, h = 400)
    assert(parseXml(svg).getDocumentElement.getTagName == "svg")
    // max bar spans the full plot height (400-44-56 = 300)
    assert(svg.contains("""height="300.00""""))
    // half-value bar is half that
    assert(svg.contains("""height="150.00""""))
    assert(svg.contains(">u1</text>") && svg.contains(">100.00</text>"))
  }

  test("pieChart: exact slice geometry, autopct labels, zero slices dropped") {
    val svg = Svg.pieChart(Seq(("a", 1.0), ("b", 1.0), ("zero", 0.0)),
      "t", size = 420)
    assert(parseXml(svg).getDocumentElement.getTagName == "svg")
    // two equal slices, the zero slice dropped
    assert(svg.split("<path").length - 1 == 2)
    assert(svg.split(">50\\.0%</text>").length - 1 == 2)
    // first slice starts at 12 o'clock: (cx, cy - r) = (210, 224-154=70)
    assert(svg.contains("L 210.00 70.00"))
    // half-circle slice ends at 6 o'clock: (210, 224+154=378)
    assert(svg.contains("378.00"))
    // deterministic
    assert(svg == Svg.pieChart(Seq(("a", 1.0), ("b", 1.0), ("zero", 0.0)),
      "t", size = 420))
  }

  test("end-to-end: the reference's dashboard artifacts render from real query outputs") {
    val dir = "/root/testdata/sf0.001"
    val cum = Render.cumulativeReturns(spark, dir)
    val heat = Render.correlationHeatmap(spark, dir)
    val bars = Render.totalValueBars(spark, dir)
    val pie = Render.sharePie(spark, dir)
    Seq(cum, heat, bars, pie).foreach { svg =>
      assert(parseXml(svg).getDocumentElement.getTagName == "svg")
    }
    // one pie slice per event type, percentages summing to ~100
    assert(pie.split("<path").length - 1 == 5)
    // four user series requested and drawn
    assert(cum.split("<polyline").length - 1 == 4)
    // 5 event types → 25 annotated cells, unit diagonal present
    assert(heat.split("<rect").length - 1 == 25 + 1) // + background rect
    assert(heat.contains(">1.00</text>"))
    // deterministic across invocations (same session, same data)
    assert(heat == Render.correlationHeatmap(spark, dir))
  }
}
