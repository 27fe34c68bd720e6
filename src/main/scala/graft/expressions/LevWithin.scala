package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded edit distance: `levenshtein(a, b)` when it is ≤ `t`, else
  * `-1` — the verify kernel of the blocked near-pair family
  * ([[graft.operators.EditBlock]]). Exact on the ≤ t set (the value it
  * reports IS the Levenshtein distance), so swapping it for
  * `levenshtein(a,b) <= t` changes nothing about the output; the win is
  * the REJECT path, which is where a blocked join on a low-entropy corpus
  * spends its time (scale_sf1: 204M joined rows verify down to 582 pairs —
  * full-matrix levenshtein there is ~70 s of the 76 s query).
  *
  * Ukkonen's banding (public algorithm): cells farther than `t` off the
  * diagonal can never contribute to a distance ≤ t, so each DP row
  * evaluates a (2t+1)-wide band instead of all `m` columns, and the scan
  * stops the moment the band's row minimum exceeds `t` — a random
  * non-match exits after a handful of rows instead of filling n×m cells.
  * Codepoint-indexed like SQL `levenshtein` (UTF8String semantics), so
  * multi-byte text matches the built-in, not UTF-16 code units.
  */
case class LevWithin(left: Expression, right: Expression, t: Int)
    extends BinaryExpression {

  require(t >= 0, s"threshold must be >= 0, got $t")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lev_within expects (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "lev_within"

  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val out = new Array[Int](n)
    var i = 0; var c = 0
    while (c < n) {
      val cp = str.codePointAt(i)
      out(c) = cp
      i += Character.charCount(cp)
      c += 1
    }
    out
  }

  /** The banded kernel, shared by interpreted eval and generated code. */
  def distWithin(ls: UTF8String, rs: UTF8String): Int = {
    val a = codePoints(ls); val b = codePoints(rs)
    // DP over the shorter string's columns keeps the band allocation small
    val (x, y) = if (a.length <= b.length) (b, a) else (a, b)
    val n = x.length; val m = y.length
    if (n - m > t) return -1
    if (m == 0) return if (n <= t) n else -1
    val INF = t + 1
    // rolling rows, band-limited: row i touches columns [i-t, i+t] ∩ [0, m]
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= t) j else INF; j += 1 }
    // positions right of a row's band are READ (as prev) one row before
    // they are first WRITTEN — both arrays must start at INF there, or the
    // del path would see a phantom 0 and underestimate the distance
    java.util.Arrays.fill(cur, INF)
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - t); val hi = math.min(m, i + t)
      // left band edge: while the band touches column 0 (i <= t) the edge
      // cell's TRUE value is i — the next row reads it as a sub/del source,
      // so an INF sentinel there underprunes real ≤ t paths (caught by the
      // randomized spec: dist-4 pair reported -1). Once the band detaches
      // from column 0, lo-1 is genuinely outside any ≤ t path → INF. Right
      // of the previous row's band, prev(j) holds INF from init — bands
      // only grow rightward, so no per-row repair needed.
      cur(lo - 1) = if (lo == 1) math.min(i, INF) else INF
      var rowMin = INF
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > INF) v = INF
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > t) return -1
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) <= t) prev(m) else -1
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    distWithin(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("levw", this, classOf[LevWithin].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.distWithin($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevWithin =
    copy(left = newLeft, right = newRight)
}

object LevWithin {
  def apply(l: Column, r: Column, t: Int): Column =
    Bridge.column(LevWithin(Bridge.expression(l), Bridge.expression(r), t))
}
