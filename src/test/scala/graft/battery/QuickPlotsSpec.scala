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
}
