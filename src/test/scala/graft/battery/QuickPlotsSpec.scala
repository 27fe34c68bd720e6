package graft.battery

import org.scalatest.funsuite.AnyFunSuite

/** Geometry/content checks on the S8 SVG quick plots (no renderer in the
  * container, so assert structure: one marker per point, monotone x
  * placement, labels present, finite coordinates). */
class QuickPlotsSpec extends AnyFunSuite {

  private val pts = (1 to 20).map(i => (i.toDouble, 1.5 - 0.01 * i))

  test("line chart carries every point as a marker plus one polyline") {
    val svg = QuickPlots.lineChartSvg(pts, "Capacity vs Cycle", "Cycle",
      "Discharge Capacity (Ah)")
    assert("<circle ".r.findAllIn(svg).size == pts.size)
    assert("<polyline ".r.findAllIn(svg).size == 1)
    assert(svg.contains("Capacity vs Cycle"))
    assert(svg.contains("Discharge Capacity (Ah)"))
    assert(!svg.contains("NaN") && !svg.contains("Infinity"))
  }

  test("degenerate inputs: single point and flat series don't divide by zero") {
    val one = QuickPlots.lineChartSvg(Seq((1.0, 2.0)), "t", "x", "y")
    assert(one.contains("<circle") && !one.contains("NaN"))
    val flat = QuickPlots.lineChartSvg(Seq((1.0, 2.0), (2.0, 2.0)), "t", "x", "y")
    assert(!flat.contains("NaN") && !flat.contains("Infinity"))
  }

  test("nice ticks are round-numbered and cover the range") {
    val t = QuickPlots.niceTicks(0.93, 1.52)
    assert(t.nonEmpty && t.head >= 0.93 - 1e-9 && t.last <= 1.52 + 1e-9)
    // round steps: all ticks are integer multiples of the step
    val step = t.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(step.forall(s => math.abs(s - step.head) < 1e-9))
  }

  test("PNG raster: decodable, right dimensions, marker pixels in series color") {
    val bytes = QuickPlots.lineChartPng(pts, "Capacity vs Cycle", "Cycle",
      "Discharge Capacity (Ah)")
    // PNG magic
    assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 640 && img.getHeight == 420)
    // every marker center must be painted in the series color (same geometry
    // as the SVG twin via chartGeom)
    val series = java.awt.Color.decode("#2a78d6").getRGB
    val g = QuickPlots.chartGeom(pts)
    for ((mx, my) <- g.markerPts)
      assert(img.getRGB(math.round(mx).toInt, math.round(my).toInt) == series,
        s"marker at ($mx,$my) not series-colored")
    // surface fills the top-right corner (outside the plot area)
    assert(img.getRGB(639, 1) == java.awt.Color.decode("#fcfcfb").getRGB)
  }

  test("PNG and SVG twins share identical geometry") {
    val g = QuickPlots.chartGeom(pts)
    val svg = QuickPlots.lineChartSvg(pts, "t", "x", "y")
    // the SVG's circle coordinates are exactly the shared geometry, 2dp
    def f(d: Double) = BigDecimal(d).setScale(2,
      BigDecimal.RoundingMode.HALF_EVEN).toString
    for ((mx, my) <- g.markerPts)
      assert(svg.contains(s"""cx="${f(mx)}" cy="${f(my)}""""))
  }
}
