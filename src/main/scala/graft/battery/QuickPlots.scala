package graft.battery

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S8 quick-plot artifacts (/root/reference/pipeline.py:245-257,
  * step11_quick_plots.py:9-19): capacity-vs-cycle and CE-vs-cycle line
  * charts, emitted as PNG raster (matching the reference's matplotlib PNG
  * output) plus a self-contained SVG twin, from the already-collected
  * per-cycle feature rows — a driver-side template like [[Report]], bounded
  * to one point per cycle, never data-sized. No chart library exists in
  * this container, so both renderers are built directly on one shared
  * pixel-space geometry ([[chartGeom]]): the SVG as a template, the PNG via
  * JDK Graphics2D + ImageIO (platform API, zero new deps). Marks follow
  * standard practice for a single-series line: 2px line, 8px circle
  * markers, recessive grid, title names the series (no legend), text in
  * neutral ink rather than the series color.
  */
object QuickPlots {

  private val W = 640; private val H = 420
  private val ML = 64; private val MR = 20; private val MT = 44; private val MB = 48
  private val Surface = "#fcfcfb"; private val Ink = "#0b0b0b"
  private val InkSoft = "#52514e"; private val Grid = "#e6e5e1"
  private val Series = "#2a78d6"

  /** ~`targetN` round-numbered axis ticks covering [lo, hi]. */
  private[battery] def niceTicks(lo: Double, hi: Double,
                                 targetN: Int = 5): Seq[Double] = {
    val span = math.max(hi - lo, 1e-12)
    val raw = span / targetN
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = (raw / mag) match {
      case r if r < 1.5 => mag
      case r if r < 3.5 => 2 * mag
      case r if r < 7.5 => 5 * mag
      case _ => 10 * mag
    }
    val first = math.ceil(lo / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + step * 1e-9).toSeq
  }

  private def fmtTick(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e7) v.toLong.toString
    else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_EVEN)
      .bigDecimal.stripTrailingZeros.toPlainString

  /** Pixel-space chart geometry, shared by the SVG and PNG renderers so the
    * twins can never drift: marker/line coordinates plus tick positions and
    * their formatted labels. */
  private[battery] case class ChartGeom(
      linePts: Seq[(Double, Double)],       // pixel space, sorted by data x
      markerPts: Seq[(Double, Double)],     // pixel space, input order
      xTicks: Seq[(Double, String)],        // (pixel x, label)
      yTicks: Seq[(Double, String)])        // (pixel y, label)

  private[battery] def chartGeom(points: Seq[(Double, Double)]): ChartGeom = {
    val xs = points.map(_._1); val ys = points.map(_._2)
    val (x0, x1) = (xs.min, xs.max)
    // y range padded 5% so extreme markers don't sit on the frame
    val (yLo, yHi) = (ys.min, ys.max)
    val pad = math.max((yHi - yLo) * 0.05, 1e-9)
    val (y0, y1) = (yLo - pad, yHi + pad)
    val pw = W - ML - MR; val ph = H - MT - MB
    def px(x: Double) = ML + (if (x1 == x0) pw / 2.0 else (x - x0) / (x1 - x0) * pw)
    def py(y: Double) = MT + ph - (y - y0) / (y1 - y0) * ph
    ChartGeom(
      points.sortBy(_._1).map { case (x, y) => (px(x), py(y)) },
      points.map { case (x, y) => (px(x), py(y)) },
      niceTicks(x0, x1).map(t => (px(t), fmtTick(t))),
      niceTicks(y0, y1).map(t => (py(t), fmtTick(t))))
  }

  /** A single-series line chart with markers over (x, y) points. */
  def lineChartSvg(points: Seq[(Double, Double)], title: String,
                   xLabel: String, yLabel: String): String = {
    val g = chartGeom(points)
    val pw = W - ML - MR; val ph = H - MT - MB
    def f(d: Double) = BigDecimal(d).setScale(2,
      BigDecimal.RoundingMode.HALF_EVEN).toString

    val grid = g.yTicks.map { case (ty, _) =>
      s"""<line x1="$ML" y1="${f(ty)}" x2="${W - MR}" y2="${f(ty)}" stroke="$Grid" stroke-width="1"/>""" }
    val xAxis = g.xTicks.map { case (tx, lbl) =>
      s"""<text x="${f(tx)}" y="${H - MB + 18}" text-anchor="middle" fill="$InkSoft" font-size="11">$lbl</text>""" }
    val yAxis = g.yTicks.map { case (ty, lbl) =>
      s"""<text x="${ML - 8}" y="${f(ty + 4)}" text-anchor="end" fill="$InkSoft" font-size="11">$lbl</text>""" }
    val line = g.linePts.map { case (x, y) => s"${f(x)},${f(y)}" }.mkString(" ")
    val markers = g.markerPts.map { case (x, y) =>
      s"""<circle cx="${f(x)}" cy="${f(y)}" r="4" fill="$Series"/>"""
    }
    s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 $W $H" font-family="system-ui, sans-serif">
<rect width="$W" height="$H" fill="$Surface"/>
<text x="$ML" y="24" fill="$Ink" font-size="15" font-weight="600">${escape(title)}</text>
${grid.mkString("\n")}
<line x1="$ML" y1="${MT + ph}" x2="${W - MR}" y2="${MT + ph}" stroke="$InkSoft" stroke-width="1"/>
<line x1="$ML" y1="$MT" x2="$ML" y2="${MT + ph}" stroke="$InkSoft" stroke-width="1"/>
${xAxis.mkString("\n")}
${yAxis.mkString("\n")}
<text x="${ML + pw / 2}" y="${H - 10}" text-anchor="middle" fill="$InkSoft" font-size="12">${escape(xLabel)}</text>
<text x="16" y="${MT + ph / 2}" text-anchor="middle" fill="$InkSoft" font-size="12" transform="rotate(-90 16 ${MT + ph / 2})">${escape(yLabel)}</text>
<polyline points="$line" fill="none" stroke="$Series" stroke-width="2"/>
${markers.mkString("\n")}
</svg>
"""
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def awt(hex: String) = java.awt.Color.decode(hex)

  /** The same chart rendered to PNG bytes via Graphics2D + ImageIO —
    * identical geometry to the SVG twin ([[chartGeom]]), matching the
    * reference's matplotlib PNG artifact format. Driver-side, one image per
    * cell — never data-sized. */
  def lineChartPng(points: Seq[(Double, Double)], title: String,
                   xLabel: String, yLabel: String): Array[Byte] = {
    import java.awt.{BasicStroke, Font, RenderingHints}
    val g = chartGeom(points)
    val pw = W - ML - MR; val ph = H - MT - MB
    val img = new java.awt.image.BufferedImage(W, H,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      g2.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g2.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g2.setColor(awt(Surface)); g2.fillRect(0, 0, W, H)

      def drawString(s: String, x: Double, y: Double,
                     anchor: String = "start"): Unit = {
        val fm = g2.getFontMetrics
        val dx = anchor match {
          case "middle" => -fm.stringWidth(s) / 2.0
          case "end" => -fm.stringWidth(s).toDouble
          case _ => 0.0
        }
        g2.drawString(s, (x + dx).toFloat, y.toFloat)
      }

      // recessive horizontal grid
      g2.setColor(awt(Grid)); g2.setStroke(new BasicStroke(1f))
      g.yTicks.foreach { case (ty, _) =>
        g2.draw(new java.awt.geom.Line2D.Double(ML, ty, W - MR, ty)) }
      // axes frame
      g2.setColor(awt(InkSoft))
      g2.draw(new java.awt.geom.Line2D.Double(ML, MT + ph, W - MR, MT + ph))
      g2.draw(new java.awt.geom.Line2D.Double(ML, MT, ML, MT + ph))
      // tick + axis labels in soft ink
      g2.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
      g.xTicks.foreach { case (tx, l) => drawString(l, tx, H - MB + 18, "middle") }
      g.yTicks.foreach { case (ty, l) => drawString(l, ML - 8, ty + 4, "end") }
      g2.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
      drawString(xLabel, ML + pw / 2.0, H - 10, "middle")
      val saved = g2.getTransform
      g2.rotate(-math.Pi / 2, 16, MT + ph / 2.0)
      drawString(yLabel, 16, MT + ph / 2.0, "middle")
      g2.setTransform(saved)
      // title in strong ink
      g2.setColor(awt(Ink))
      g2.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 15))
      drawString(title, ML, 24)
      // series: 2px line then 8px circle markers
      g2.setColor(awt(Series)); g2.setStroke(new BasicStroke(2f,
        BasicStroke.CAP_ROUND, BasicStroke.JOIN_ROUND))
      val path = new java.awt.geom.Path2D.Double()
      g.linePts.zipWithIndex.foreach { case ((x, y), i) =>
        if (i == 0) path.moveTo(x, y) else path.lineTo(x, y) }
      g2.draw(path)
      g.markerPts.foreach { case (x, y) =>
        g2.fill(new java.awt.geom.Ellipse2D.Double(x - 4, y - 4, 8, 8)) }
    } finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Emit `<cell>_capacity.{png,svg}` and `<cell>_ce.{png,svg}` from the
    * per-cycle feature table (collected — one point per cycle, bounded).
    * PNG is the reference-parity artifact; the SVG twin shares its
    * geometry. */
  def write(features: DataFrame, cellId: String, outDir: String): Unit = {
    val rows = features.select(
        col("cycle_index").cast("double"),
        col("Q_dis_Ah").cast("double"),
        col("CE").cast("double"))
      .orderBy("cycle_index")
      .collect()
    def pts(i: Int) = rows.toSeq
      .filter(r => !r.isNullAt(0) && !r.isNullAt(i))
      .map(r => (r.getDouble(0), r.getDouble(i)))
    val specs = Seq(
      (pts(1), "Capacity vs Cycle", "Cycle", "Discharge Capacity (Ah)",
        s"$outDir/${cellId}_capacity"),
      (pts(2), "CE vs Cycle", "Cycle", "Coulombic Efficiency",
        s"$outDir/${cellId}_ce"))
    specs.foreach { case (p, t, xl, yl, base) =>
      if (p.nonEmpty) {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(base + ".svg"), lineChartSvg(p, t, xl, yl))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(base + ".png"), lineChartPng(p, t, xl, yl))
      }
    }
  }
}
