package graft.render

import java.util.Locale

/** Dependency-free deterministic SVG chart emitters — the engine's twin
  * of the reference's matplotlib/seaborn rendering tier
  * (`include/tasks/generate_dashboard.py:38-60` renders
  * cumulative_returns.png and correlation_heatmap.png;
  * `analytics_service/dashboard.py:122-176` the live price line / volume
  * and range bars). The COMPUTATION behind every chart is an
  * oracle-checked registry query; this tier only maps numbers to
  * coordinates.
  *
  * SVG rather than PNG because it is text: byte-deterministic across
  * JVMs (Locale.ROOT formatting, no font metrics, no rasterizer),
  * diffable in review, and spec-checkable — XML well-formedness plus
  * exact geometry assertions — with zero image dependencies. A browser
  * or any SVG rasterizer turns it into the reference's pixels.
  */
object Svg {

  /** matplotlib's default ("tab10") line-color cycle — familiar output
    * for users coming from the reference's charts. */
  private val Palette = Vector(
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728",
    "#9467bd", "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")

  private def f2(x: Double): String =
    String.format(Locale.ROOT, "%.2f", Double.box(x))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def text(x: Double, y: Double, s: String, size: Int = 12,
      anchor: String = "start", fill: String = "#333333",
      extra: String = ""): String =
    s"""<text x="${f2(x)}" y="${f2(y)}" font-size="$size" """ +
      s"""font-family="sans-serif" text-anchor="$anchor" fill="$fill"$extra>""" +
      esc(s) + "</text>"

  /** Nice tick positions: `n` evenly spaced values across [lo, hi]. */
  private def ticks(lo: Double, hi: Double, n: Int): Seq[Double] =
    (0 to n).map(i => lo + (hi - lo) * i / n)

  /** Multi-series line chart (the cumulative-returns / intraday-price
    * shape). Each series is (label, points); points render in the given
    * order. NaN points are skipped. Degenerate extents (all-equal
    * values) pad by ±1 so the geometry never divides by zero. */
  def lineChart(series: Seq[(String, Seq[(Double, Double)])], title: String,
      xLabel: String, yLabel: String, w: Int = 840, h: Int = 480): String = {
    val (ml, mr, mt, mb) = (64.0, 24.0, 44.0, 52.0)
    val pts = series.flatMap(_._2).filterNot(p => p._1.isNaN || p._2.isNaN)
    val (xMin0, xMax0) =
      if (pts.isEmpty) (0.0, 1.0) else (pts.map(_._1).min, pts.map(_._1).max)
    val (yMin0, yMax0) =
      if (pts.isEmpty) (0.0, 1.0) else (pts.map(_._2).min, pts.map(_._2).max)
    val (xMin, xMax) =
      if (xMax0 > xMin0) (xMin0, xMax0) else (xMin0 - 1, xMax0 + 1)
    val (yMin, yMax) =
      if (yMax0 > yMin0) (yMin0, yMax0) else (yMin0 - 1, yMax0 + 1)
    def px(x: Double) = ml + (x - xMin) / (xMax - xMin) * (w - ml - mr)
    def py(y: Double) = h - mb - (y - yMin) / (yMax - yMin) * (h - mt - mb)
    val grid = ticks(yMin, yMax, 5).map { t =>
      s"""<line x1="${f2(ml)}" y1="${f2(py(t))}" x2="${f2(w - mr)}" """ +
        s"""y2="${f2(py(t))}" stroke="#dddddd" stroke-width="1"/>""" +
        text(ml - 8, py(t) + 4, f2(t), 11, "end")
    }.mkString("\n")
    val xTicks = ticks(xMin, xMax, 5).map { t =>
      s"""<line x1="${f2(px(t))}" y1="${f2(h - mb)}" x2="${f2(px(t))}" """ +
        s"""y2="${f2(h - mb + 5)}" stroke="#333333" stroke-width="1"/>""" +
        text(px(t), h - mb + 18, f2(t), 11, "middle")
    }.mkString("\n")
    val lines = series.zipWithIndex.map { case ((label, ps), i) =>
      val clean = ps.filterNot(p => p._1.isNaN || p._2.isNaN)
      val poly = clean.map(p => s"${f2(px(p._1))},${f2(py(p._2))}")
        .mkString(" ")
      s"""<polyline fill="none" stroke="${Palette(i % Palette.size)}" """ +
        s"""stroke-width="2" points="$poly"><title>${esc(label)}</title>""" +
        "</polyline>"
    }.mkString("\n")
    val legend = series.zipWithIndex.map { case ((label, _), i) =>
      val lx = w - mr - 130; val ly = mt + 8 + i * 18
      s"""<rect x="${f2(lx)}" y="${f2(ly - 9)}" width="12" height="12" """ +
        s"""fill="${Palette(i % Palette.size)}"/>""" +
        text(lx + 18, ly + 2, label, 12)
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">
<rect width="$w" height="$h" fill="white"/>
${text(w / 2.0, 24, title, 17, "middle")}
$grid
$xTicks
<line x1="${f2(ml)}" y1="${f2(h - mb)}" x2="${f2(w - mr)}" y2="${f2(h - mb)}" stroke="#333333" stroke-width="1"/>
<line x1="${f2(ml)}" y1="${f2(mt)}" x2="${f2(ml)}" y2="${f2(h - mb)}" stroke="#333333" stroke-width="1"/>
${text(w / 2.0, h - 12, xLabel, 12, "middle")}
${text(16, h / 2.0, yLabel, 12, "middle", "#333333", s""" transform="rotate(-90 16 ${h / 2.0})"""")}
$lines
$legend
</svg>"""
  }

  /** Diverging fill for a correlation value in [-1, 1]: linear blend
    * from blue (−1) through white (0) to red (+1) — the seaborn
    * "coolwarm" endpoints the reference's heatmap uses. Exact integer
    * arithmetic on the rounded blend keeps the string deterministic. */
  def divergingColor(v: Double): String = {
    val t = math.max(-1.0, math.min(1.0, v))
    def lerp(a: Int, b: Int, u: Double): Int = math.round(a + (b - a) * u).toInt
    val (r, g, b) =
      if (t < 0) (lerp(255, 59, -t), lerp(255, 76, -t), lerp(255, 192, -t))
      else (lerp(255, 180, t), lerp(255, 4, t), lerp(255, 38, t))
    f"#$r%02x$g%02x$b%02x"
  }

  /** Annotated square heatmap over a labeled value lookup (the
    * correlation-matrix shape): cell fill from [[divergingColor]], the
    * value annotated "%.2f" like the reference's `annot=True, fmt=".2f"`.
    * Annotation text flips to white on saturated cells for contrast. */
  def heatmap(labels: Seq[String], value: (String, String) => Double,
      title: String, cell: Int = 56): String = {
    val (ml, mt) = (96.0, 72.0)
    val w = (ml + labels.size * cell + 24).toInt
    val h = (mt + labels.size * cell + 24).toInt
    val cells = (for {
      (ra, i) <- labels.zipWithIndex
      (cb, j) <- labels.zipWithIndex
    } yield {
      val v = value(ra, cb)
      val x = ml + j * cell; val y = mt + i * cell
      val tc = if (math.abs(v) > 0.6) "#ffffff" else "#111111"
      s"""<rect x="${f2(x)}" y="${f2(y)}" width="$cell" height="$cell" """ +
        s"""fill="${divergingColor(v)}" stroke="white" stroke-width="1"/>""" +
        text(x + cell / 2.0, y + cell / 2.0 + 4, f2(v), 12, "middle", tc)
    }).mkString("\n")
    val colLabels = labels.zipWithIndex.map { case (l, j) =>
      text(ml + j * cell + cell / 2.0, mt - 10, l, 12, "middle")
    }.mkString("\n")
    val rowLabels = labels.zipWithIndex.map { case (l, i) =>
      text(ml - 10, mt + i * cell + cell / 2.0 + 4, l, 12, "end")
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">
<rect width="$w" height="$h" fill="white"/>
${text(w / 2.0, 28, title, 16, "middle")}
$colLabels
$rowLabels
$cells
</svg>"""
  }

  /** Pie chart with percentage labels (the market-cap-distribution
    * panel, `analytics_service/dashboard.py:149-156` — its `autopct`
    * renders "p.1f%"): slices proceed counterclockwise from 12 o'clock
    * (the reference's `startangle=90`), each an exact arc path from the
    * cumulative fraction, labels at 0.62·r on the slice bisector.
    * Zero/negative values are skipped (matplotlib drops them too). */
  def pieChart(items: Seq[(String, Double)], title: String,
      size: Int = 420): String = {
    val pos = items.filter(_._2 > 0)
    val total = pos.map(_._2).sum
    val (cx, cy, r) = (size / 2.0, size / 2.0 + 14, size / 2.0 - 56)
    def pt(frac: Double): (Double, Double) = {
      val a = math.Pi / 2 + 2 * math.Pi * frac // CCW from 12 o'clock
      (cx + r * math.cos(a), cy - r * math.sin(a))
    }
    var acc = 0.0
    val slices = pos.zipWithIndex.map { case ((label, v), i) =>
      val f0 = acc / total; acc += v; val f1 = acc / total
      val (x0, y0) = pt(f0); val (x1, y1) = pt(f1)
      val large = if (f1 - f0 > 0.5) 1 else 0
      val mid = (f0 + f1) / 2
      val lx = cx + 0.62 * r * math.cos(math.Pi / 2 + 2 * math.Pi * mid)
      val ly = cy - 0.62 * r * math.sin(math.Pi / 2 + 2 * math.Pi * mid)
      val pct = String.format(Locale.ROOT, "%.1f%%",
        Double.box((v / total) * 100))
      // sweep=0: SVG's y axis points down, so decreasing screen angle IS
      // the counterclockwise visual direction
      s"""<path d="M ${f2(cx)} ${f2(cy)} L ${f2(x0)} ${f2(y0)} """ +
        s"""A ${f2(r)} ${f2(r)} 0 $large 0 ${f2(x1)} ${f2(y1)} Z" """ +
        s"""fill="${Palette(i % Palette.size)}" stroke="white" """ +
        s"""stroke-width="1"><title>${esc(label)}</title></path>""" +
        text(lx, ly + 4, pct, 12, "middle", "#111111") +
        text(lx, ly + 18, label, 10, "middle", "#111111")
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$size" height="$size">
<rect width="$size" height="$size" fill="white"/>
${text(size / 2.0, 24, title, 16, "middle")}
$slices
</svg>"""
  }

  /** Labeled vertical bar chart with value annotations (the volume /
    * price-range shape of the live dashboard). Bars are scaled to the
    * max value; values annotate above each bar. */
  def barChart(items: Seq[(String, Double)], title: String,
      yLabel: String, w: Int = 640, h: Int = 400): String = {
    val (ml, mr, mt, mb) = (64.0, 24.0, 44.0, 56.0)
    val vMax = if (items.isEmpty) 1.0 else math.max(items.map(_._2).max, 1e-12)
    val bw = (w - ml - mr) / math.max(1, items.size)
    val bars = items.zipWithIndex.map { case ((label, v), i) =>
      val bh = v / vMax * (h - mt - mb)
      val x = ml + i * bw + bw * 0.15
      val y = h - mb - bh
      s"""<rect x="${f2(x)}" y="${f2(y)}" width="${f2(bw * 0.7)}" """ +
        s"""height="${f2(bh)}" fill="${Palette(i % Palette.size)}"/>""" +
        text(x + bw * 0.35, y - 6, f2(v), 11, "middle") +
        text(x + bw * 0.35, h - mb + 16, label, 11, "middle")
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">
<rect width="$w" height="$h" fill="white"/>
${text(w / 2.0, 24, title, 16, "middle")}
<line x1="${f2(ml)}" y1="${f2(h - mb)}" x2="${f2(w - mr)}" y2="${f2(h - mb)}" stroke="#333333" stroke-width="1"/>
${text(16, h / 2.0, yLabel, 12, "middle", "#333333", s""" transform="rotate(-90 16 ${h / 2.0})"""")}
$bars
</svg>"""
  }
}
