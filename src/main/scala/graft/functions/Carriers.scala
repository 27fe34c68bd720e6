package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hash-stable output carriers for cross-engine comparison.
  *
  * A raw DECIMAL(38,*) output column reaches the comparator as arbitrary-
  * precision objects from Spark parquet but as float64 from DuckDB, so
  * numerically equal results hash differently. The fix is to keep the exact
  * decimal math internally but emit micro-units as BIGINT: round to 6 dp,
  * shift by 1e6 entirely inside decimal arithmetic (precision 30+7+1 = 38,
  * no precision-loss rescale), then cast the now-integral value to long —
  * exact in both engines, far inside int64 at any realistic SF.
  *
  * Rounding-mode trap (probed empirically): Spark's decimal→decimal cast
  * rounds HALF_UP, but DuckDB's decimal→decimal cast TRUNCATES toward zero —
  * only DuckDB's `round()` is half-away-from-zero like Spark. The oracle
  * twin therefore rounds EXPLICITLY before the scale-reducing cast; without
  * it, any aggregate carrying nonzero digits past 6 dp would silently
  * diverge (the current testdata's products have ≤4 significant decimals,
  * which would mask the bug until the data changed).
  */
object Carriers {

  /** DECIMAL aggregate → micro-units as BIGINT (exact, hash-stable). */
  def micros(c: Column): Column =
    (c.cast("decimal(30,6)") * lit(1000000L).cast("decimal(7,0)")).cast(LongType)

  /** DuckDB twin of [[micros]] — explicit round (see trap above), product
    * width 37 ≤ 38. */
  def microsSql(e: String): String =
    s"CAST(CAST(round($e, 6) AS DECIMAL(30,6)) * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT)"
}
