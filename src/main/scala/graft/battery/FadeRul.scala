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
    * cycles to the EOL threshold. NULL when <2 usable points or zero slope
    * (/root/reference/pipeline.py:234-238). The point guard counts the
    * non-null (cycle, q_norm) pairs the regression actually uses
    * (`regr_count`), and a NULL q_norm anywhere nulls the fit outputs — the
    * reference's `np.polyfit` propagates NaN, while `regr_*` would silently
    * skip those rows and report a confident fit the reference doesn't.
    */
  def summary(features: DataFrame, eol: Double = 0.80,
              cellKeys: Seq[String] = Seq.empty): DataFrame = {
    val grouped =
      if (cellKeys.isEmpty) features.groupBy()
      else features.groupBy(cellKeys.map(col): _*)
    val cyc = col("cycle_index").cast(DoubleType)
    val m = regr_slope(col("q_norm"), cyc)
    val b = regr_intercept(col("q_norm"), cyc)
    grouped
      .agg(
        min_by(col("Q_dis_Ah"), col("cycle_index")).as("Q0_Ah"),
        m.as("m"),
        b.as("b"),
        regr_count(col("q_norm"), cyc).as("n_pairs"),
        count(lit(1)).as("n_rows"))
      .select(
        cellKeys.map(col) ++ {
          // rows with a null in either regression input = total minus the
          // non-null pairs the regression used
          val anyMissing = col("n_rows") - col("n_pairs") > 0
          Seq(
            col("Q0_Ah"),
            when(col("n_pairs") < 2 || anyMissing, lit(null).cast(DoubleType))
              .otherwise(col("m") * 100.0).as("fade_slope_pct_per_cycle"),
            when(col("n_pairs") < 2 || anyMissing ||
              col("m").isNull || col("m") === 0,
              lit(null).cast(DoubleType))
              .otherwise((lit(eol) - col("b")) / col("m")).as("cycles_to_80pct"))
        }: _*)
  }
}
