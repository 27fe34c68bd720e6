package graft.operators

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Grid-resampled derivative peak — the dQ/dV kernel
  * (/root/reference/pipeline.py:206-219, step9_dqdv.py:11-27).
  *
  * Given (V, Q) pairs sorted by V, resamples Q onto the uniform grid
  * `arange(V₀, Vₙ, dV)` by linear interpolation, takes the uniform-spacing
  * central-difference gradient, and returns the grid voltage at the argmax.
  *
  * The three NumPy primitives are replicated exactly (SURVEY.md §7.4 risk 5):
  *  - `np.arange` length = ceil((stop − start)/step) evaluated in double;
  *  - `np.interp`: clamp outside [V₀, Vₙ]; inside, anchor on the *rightmost*
  *    xp ≤ x and interpolate to the next point;
  *  - `np.gradient`: one-sided differences at the edges, central inside;
  *  - `np.argmax`: first occurrence wins; a NaN (possible from duplicate-V
  *    infinite slopes) wins immediately, like NumPy's NaN-propagating max.
  *
  * Per-group input is bounded by cycle length (~10³ rows) and the grid by the
  * voltage range (~tens of points), so per-group arrays are safe at any scale.
  */
object GridInterpolate {

  /** Rightmost index i with xp(i) <= x, or -1 if x < xp(0). */
  private def anchor(x: Double, xp: Array[Double]): Int = {
    var lo = 0
    var hi = xp.length - 1
    if (x < xp(0)) return -1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (xp(mid) <= x) lo = mid else hi = mid - 1
    }
    lo
  }

  def interp(x: Double, xp: Array[Double], fp: Array[Double]): Double = {
    val n = xp.length
    val i = anchor(x, xp)
    if (i < 0) fp(0)
    else if (i >= n - 1) fp(n - 1)
    else {
      val slope = (fp(i + 1) - fp(i)) / (xp(i + 1) - xp(i))
      fp(i) + slope * (x - xp(i))
    }
  }

  /** Peak grid voltage, or None per the reference's guards: <3 points, or
    * V-range < dV, or a degenerate 1-point grid. */
  def peak(dV: Double, vs: Array[Double], qs: Array[Double]): Option[Double] = {
    val n = vs.length
    if (n < 3) return None
    val v0 = vs(0)
    val vLast = vs(n - 1)
    if (vLast - v0 < dV) return None
    val m = math.ceil((vLast - v0) / dV).toInt // np.arange length semantics
    if (m < 2) return None // np.gradient needs >=2 points
    // np.arange fills by accumulation (x[i] = x[i-1] + step), not start+i*step
    // — the drift pattern matters for bit-exact tie-breaking in the argmax
    val vgrid = new Array[Double](m)
    vgrid(0) = v0
    var i = 1
    while (i < m) {
      vgrid(i) = vgrid(i - 1) + dV
      i += 1
    }
    val qgrid = new Array[Double](m)
    i = 0
    while (i < m) {
      qgrid(i) = interp(vgrid(i), vs, qs)
      i += 1
    }
    // np.gradient with uniform spacing dV
    val grad = new Array[Double](m)
    grad(0) = (qgrid(1) - qgrid(0)) / dV
    grad(m - 1) = (qgrid(m - 1) - qgrid(m - 2)) / dV
    i = 1
    while (i < m - 1) {
      grad(i) = (qgrid(i + 1) - qgrid(i - 1)) / (2 * dV)
      i += 1
    }
    // first-occurrence argmax; NaN wins immediately (NumPy NaN propagation)
    var best = 0
    if (grad(0).isNaN) return Some(vgrid(0))
    i = 1
    while (i < m) {
      if (grad(i).isNaN) return Some(vgrid(i))
      if (grad(i) > grad(best)) best = i
      i += 1
    }
    Some(vgrid(best))
  }

  /** Column form: (dV, sorted voltages, shifted capacities) → peak voltage. */
  val peakUdf: UserDefinedFunction =
    udf((dV: Double, vs: Seq[Double], qs: Seq[Double]) =>
      peak(dV, vs.toArray, qs.toArray))
}
