package graft.battery

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S8 quick-plot artifacts (/root/reference/pipeline.py:245-257,
  * step11_quick_plots.py:9-19): capacity-vs-cycle and CE-vs-cycle line
  * charts, emitted as self-contained SVG from the already-collected
  * per-cycle feature rows — a driver-side template like [[Report]], bounded
  * to one point per cycle, never data-sized. No chart library exists in
  * this container, so the SVG is built directly; marks follow standard
  * practice for a single-series line: 2px line, 8px circle markers,
  * recessive grid, title names the series (no legend), text in neutral ink
  * rather than the series color.
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

  /** A single-series line chart with markers over (x, y) points. */
  def lineChartSvg(points: Seq[(Double, Double)], title: String,
                   xLabel: String, yLabel: String): String = {
    val xs = points.map(_._1); val ys = points.map(_._2)
    val (x0, x1) = (xs.min, xs.max)
    // y range padded 5% so extreme markers don't sit on the frame
    val (yLo, yHi) = (ys.min, ys.max)
    val pad = math.max((yHi - yLo) * 0.05, 1e-9)
    val (y0, y1) = (yLo - pad, yHi + pad)
    val pw = W - ML - MR; val ph = H - MT - MB
    def px(x: Double) = ML + (if (x1 == x0) pw / 2.0 else (x - x0) / (x1 - x0) * pw)
    def py(y: Double) = MT + ph - (y - y0) / (y1 - y0) * ph
    def f(d: Double) = BigDecimal(d).setScale(2,
      BigDecimal.RoundingMode.HALF_EVEN).toString

    val xTicks = niceTicks(x0, x1)
    val yTicks = niceTicks(y0, y1)
    val grid = yTicks.map(t =>
      s"""<line x1="$ML" y1="${f(py(t))}" x2="${W - MR}" y2="${f(py(t))}" stroke="$Grid" stroke-width="1"/>""")
    val xAxis = xTicks.map(t =>
      s"""<text x="${f(px(t))}" y="${H - MB + 18}" text-anchor="middle" fill="$InkSoft" font-size="11">${fmtTick(t)}</text>""")
    val yAxis = yTicks.map(t =>
      s"""<text x="${ML - 8}" y="${f(py(t) + 4)}" text-anchor="end" fill="$InkSoft" font-size="11">${fmtTick(t)}</text>""")
    val line = points.sortBy(_._1)
      .map { case (x, y) => s"${f(px(x))},${f(py(y))}" }.mkString(" ")
    val markers = points.map { case (x, y) =>
      s"""<circle cx="${f(px(x))}" cy="${f(py(y))}" r="4" fill="$Series"/>"""
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

  /** Emit `<cell>_capacity.svg` and `<cell>_ce.svg` from the per-cycle
    * feature table (collected — one point per cycle, bounded). */
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
        s"$outDir/${cellId}_capacity.svg"),
      (pts(2), "CE vs Cycle", "Cycle", "Coulombic Efficiency",
        s"$outDir/${cellId}_ce.svg"))
    specs.foreach { case (p, t, xl, yl, path) =>
      if (p.nonEmpty) java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path), lineChartSvg(p, t, xl, yl))
    }
  }
}
