package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level NumPy-parity tests (np.interp / np.gradient / np.arange
  * semantics; hand-computed expectations). */
class GridInterpolateSpec extends AnyFunSuite {
  private val xp = Array(1.0, 2.0, 4.0)
  private val fp = Array(10.0, 20.0, 40.0)

  test("interp clamps outside the support like np.interp") {
    assert(GridInterpolate.interp(0.5, xp, fp) == 10.0)
    assert(GridInterpolate.interp(5.0, xp, fp) == 40.0)
  }

  test("interp is linear inside and exact on knots") {
    assert(GridInterpolate.interp(1.5, xp, fp) == 15.0)
    assert(GridInterpolate.interp(3.0, xp, fp) == 30.0)
    assert(GridInterpolate.interp(2.0, xp, fp) == 20.0)
  }

  test("peak: first-occurrence argmax, one-sided edge gradients") {
    // vgrid = arange(3.0, 4.0, 0.25) = [3.0, 3.25, 3.5, 3.75]
    // qgrid = [0, 0.5, 1.0, 1.1]; grad = [2, 2, 1.2, 0.4] → first max at 3.0
    val v = Array(3.0, 3.5, 4.0)
    val q = Array(0.0, 1.0, 1.2)
    assert(GridInterpolate.peak(0.25, v, q).contains(3.0))
  }

  test("peak guards: <3 points and V-range < dV → None") {
    assert(GridInterpolate.peak(0.05, Array(3.0, 4.0), Array(0.0, 1.0)).isEmpty)
    assert(GridInterpolate.peak(0.5, Array(3.0, 3.1, 3.2), Array(0.0, 1.0, 2.0)).isEmpty)
  }
}
