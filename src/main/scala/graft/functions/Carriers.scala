package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hash-stable output carriers for cross-engine comparison.
  *
  * A raw DECIMAL(38,*) output column reaches the comparator as arbitrary-
  * precision objects from Spark parquet but as float64 from DuckDB, so
  * numerically equal results hash differently. The fix is to keep the exact
  * decimal math internally but emit micro-units as BIGINT: round to 6 dp
  * (Spark HALF_UP ≡ DuckDB half-away-from-zero, identical for all signs),
  * shift by 1e6 entirely inside decimal arithmetic (precision 30+7+1 = 38,
  * no precision-loss rescale), then cast the now-integral value to long —
  * exact in both engines, far inside int64 at any realistic SF.
  */
object Carriers {

  /** DECIMAL aggregate → micro-units as BIGINT (exact, hash-stable). */
  def micros(c: Column): Column =
    (c.cast("decimal(30,6)") * lit(1000000L).cast("decimal(7,0)")).cast(LongType)

  /** DuckDB twin of [[micros]] — keeps the product width at 37 ≤ 38. */
  def microsSql(e: String): String =
    s"CAST(CAST($e AS DECIMAL(30,6)) * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT)"
}
