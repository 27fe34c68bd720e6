package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Micro-quantized squared L2 distance over two `array<double>` columns —
  * the hot kernel of PQ encode/ADC (e3_pq_adc) as a codegen'd Catalyst
  * expression. Each per-dimension term round((x−y)²·10⁶) is quantized to a
  * long BEFORE the accumulation, so the sum is exact integer math: order-,
  * partitioning-, and engine-independent (the same contract as the HOF
  * spelling `aggregate(zip_with(a,b,(x,y)=>(x−y)*(x−y)), 0L,
  * (acc,t) => acc + round(t*1e6,0).cast("long"))`, which allocates a zipped
  * array per row; this is a fused loop). Rounding is decimal HALF_UP like
  * Spark's `round` — implemented as truncate-then-compare-fraction, which
  * for non-negative v avoids Math.round's float-add-0.5 bug at
  * 0.49999999999999994. NULL if either side is NULL, lengths differ, or any
  * element is NULL.
  */
case class L2Micros(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_l2_micros expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2_micros"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      val v = d * d * 1e6
      // ≥ 2⁶³ (incl. +Inf): (long)v already saturates to Long.MaxValue and
      // the +1 would WRAP — match the HOF's cast saturation instead.
      // NaN: both branches yield 0, as cast(NaN as long) does.
      var r = v.toLong
      if (v < 9.223372036854776e18 && v - r >= 0.5) r += 1
      acc += r
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      val r = ctx.freshName("r")
      s"""
        final int $n = $x.numElements();
        if ($n != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
            final double $d = $x.getDouble($i) - $y.getDouble($i);
            final double $v = $d * $d * 1.0e6;
            long $r = (long) $v;
            if ($v < 9.223372036854776e18 && $v - $r >= 0.5) $r += 1L;
            $acc += $r;
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Micros =
    copy(left = newLeft, right = newRight)
}

object L2Micros {
  /** Column form for the DataFrame API. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(L2Micros(Bridge.expression(a), Bridge.expression(b)))
}
