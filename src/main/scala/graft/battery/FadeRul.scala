package graft.battery

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** A8: capacity-fade line fit + remaining-useful-life estimate
  * (/root/reference/pipeline.py:231-242, step8_fade_rul.py:13-25).
  *
  * `np.polyfit(cycle, q_norm, 1)` is ordinary least squares, which Spark
  * expresses closed-form with `regr_slope`/`regr_intercept` — a single
  * aggregate, no iteration, no driver math. Grouped by cell so the same plan
  * collates any number of cells in one pass.
  */
object FadeRul {

  /** Per-cell summary: Q0 (first-cycle capacity), fade slope (%/cycle), and
    * cycles to the EOL threshold. NULL when <2 points (regr_* yields NULL) or
    * zero slope (/root/reference/pipeline.py:234-238).
    */
  def summary(features: DataFrame, eol: Double = 0.80,
              cellKeys: Seq[String] = Seq.empty): DataFrame = {
    val grouped =
      if (cellKeys.isEmpty) features.groupBy()
      else features.groupBy(cellKeys.map(col): _*)
    val m = regr_slope(col("q_norm"), col("cycle_index").cast(DoubleType))
    val b = regr_intercept(col("q_norm"), col("cycle_index").cast(DoubleType))
    grouped
      .agg(
        min_by(col("Q_dis_Ah"), col("cycle_index")).as("Q0_Ah"),
        m.as("m"),
        b.as("b"),
        count(lit(1)).as("n"))
      .select(
        cellKeys.map(col) ++ Seq(
          col("Q0_Ah"),
          when(col("n") < 2, lit(null).cast(DoubleType))
            .otherwise(col("m") * 100.0).as("fade_slope_pct_per_cycle"),
          when(col("n") < 2 || col("m").isNull || col("m") === 0,
            lit(null).cast(DoubleType))
            .otherwise((lit(eol) - col("b")) / col("m")).as("cycles_to_80pct")): _*)
  }
}
