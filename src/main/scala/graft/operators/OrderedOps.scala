package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Ordered-partition operators — the engine's generic forms of the reference's
  * per-cycle semantics (SURVEY.md §2a.5): every "last/first/neighbor" over an
  * implicitly sorted pandas frame becomes an explicit
  * `Window.partitionBy(keys).orderBy(order)` here. All are single-shuffle on
  * `keys` with bounded per-group state — safe at any table size.
  */
object OrderedOps {

  def ordered(keys: Seq[String], order: Seq[Column]): WindowSpec =
    Window.partitionBy(keys.map(col): _*).orderBy(order: _*)

  def whole(keys: Seq[String], order: Seq[Column]): WindowSpec =
    ordered(keys, order)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** A1 generic: per group, the value of `valueCol` on the last row (in
    * `order`) where it is non-null. Null-valued rows get a null ordering key,
    * which `max_by` skips. */
  def lastNonNull(df: DataFrame, keys: Seq[String], valueCol: String,
                  order: Seq[Column], as: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(max_by(col(valueCol), struct(order: _*)).as(as))

  /** A3 generic: value normalized by the group's first value in `order`
    * (running `first` window — one shuffle, no self-join). */
  def normalizedByFirst(df: DataFrame, keys: Seq[String], valueCol: String,
                        order: Seq[Column], as: String): DataFrame = {
    val w = ordered(keys, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, col(valueCol) / first(col(valueCol)).over(w))
  }

  /** A7 generic: running reference = first non-null value in order; emits the
    * delta from it (the reference's dQ/dV-shift pattern,
    * /root/reference/pipeline.py:221-227). */
  def deltaFromFirstValid(df: DataFrame, keys: Seq[String], valueCol: String,
                          order: Seq[Column], as: String): DataFrame = {
    val w = ordered(keys, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = first(col(valueCol), ignoreNulls = true).over(w)
    df.withColumn(as,
      when(col(valueCol).isNotNull && ref.isNotNull, col(valueCol) - ref))
  }

  /** A4 generic: trapezoidal ∫ value d(time) per group
    * (/root/reference/pipeline.py:169-181). NULL when <2 rows or any null
    * value (NaN poisons np.trapz). `round` quashes summation-order float
    * noise for oracle comparison. */
  def trapezoid(df: DataFrame, keys: Seq[String], valueCol: String,
                timeCol: Column, order: Seq[Column], as: String,
                roundTo: Int = 4): DataFrame = {
    val w = ordered(keys, order)
    val v = col(valueCol)
    val d = df
      .withColumn("__t", timeCol)
      .withColumn("__seg",
        (v + lag(valueCol, 1).over(w)) / 2 * (col("__t") - lag("__t", 1).over(w)))
    d.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(v.isNull || col("__t").isNull, 1).otherwise(0)).as("__bad"),
        sum("__seg").as("__s"))
      .select(keys.map(col) :+
        when(col("__n") < 2 || col("__bad") > 0, lit(null).cast(DoubleType))
          .otherwise(round(abs(col("__s")), roundTo)).as(as): _*)
  }

  /** A5 generic ("nearest-row delta", the IR@C/2 pattern,
    * /root/reference/pipeline.py:184-203): find the row whose value is
    * closest to `target` (first on ties), then compare medians of the rows
    * just before vs from it on (window half-width `w`). */
  def nearestRowDelta(df: DataFrame, keys: Seq[String], valueCol: String,
                      order: Seq[Column], target: Double, w: Int = 1): DataFrame = {
    val rnW = ordered(keys, order)
    val metric = abs(col(valueCol) - target)
    val d = df.withColumn("rn", row_number().over(rnW))
    val tidx = min_by(col("rn"), when(metric.isNotNull, struct(metric, col("rn"))))
      .over(whole(keys, order))
    val pre = col("rn").between(col("tidx") - w, col("tidx") - 1)
    val post = col("rn").between(col("tidx"), col("tidx") + w)
    d.withColumn("tidx", tidx)
      .groupBy(keys.map(col): _*)
      .agg(
        median(when(pre, col(valueCol))).as("pre_med"),
        median(when(post, col(valueCol))).as("post_med"))
      .withColumn("delta", col("post_med") - col("pre_med"))
  }

  /** A8 generic: closed-form OLS fit per group via regr_slope/regr_intercept
    * (/root/reference/pipeline.py:231-242), with a derived x-value where the
    * fitted line crosses `crossAt`. */
  def olsFit(df: DataFrame, keys: Seq[String], yCol: Column, xCol: Column,
             crossAt: Double, roundTo: Int = 4): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(regr_slope(yCol, xCol).as("__m"), regr_intercept(yCol, xCol).as("__b"),
        count(lit(1)).as("__n"))
      .select(keys.map(col) ++ Seq(
        round(col("__m"), roundTo).as("slope"),
        round(col("__b"), roundTo).as("intercept"),
        when(col("__n") < 2 || col("__m").isNull || col("__m") === 0,
          lit(null).cast(DoubleType))
          .otherwise(round((lit(crossAt) - col("__b")) / col("__m"), roundTo))
          .as("cross_x")): _*)

  /** E6: top-k rows per group by `order` (row_number ≤ k). */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   k: Int): DataFrame =
    df.withColumn("rank", row_number().over(ordered(keys, order)))
      .filter(col("rank") <= k)
}
