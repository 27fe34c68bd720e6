package graft

import org.apache.spark.sql.functions._

import graft.functions.Carriers

/** Pins the hash-stable output-carrier semantics (the round-1 driver failure
  * class): exact ×1e6 shift, half-away-from-zero tie rounding for BOTH
  * signs (Spark HALF_UP ≡ DuckDB's rule — the property the oracle side
  * relies on), and NULL propagation.
  */
class CarriersSpec extends SparkSpec {
  import spark.implicits._

  private def micros(raw: java.math.BigDecimal): Option[Long] = {
    val df = Seq(Option(raw)).toDF("d")
      .select(Carriers.micros(col("d").cast("decimal(28,12)")).as("m"))
    val r = df.head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("exact shift, tie rounding away from zero, null propagation") {
    assert(micros(new java.math.BigDecimal("1.25")) == Some(1250000L))
    assert(micros(new java.math.BigDecimal("-1.25")) == Some(-1250000L))
    // tie at the 7th decimal: 0.0000005 → away from zero in both engines
    assert(micros(new java.math.BigDecimal("0.0000005")) == Some(1L))
    assert(micros(new java.math.BigDecimal("-0.0000005")) == Some(-1L))
    // below the tie: truncates to zero
    assert(micros(new java.math.BigDecimal("0.0000004999")) == Some(0L))
    assert(micros(null) == None)
    // magnitude far beyond any sf sum stays exact in the decimal path
    assert(micros(new java.math.BigDecimal("123456789012.654321")) ==
      Some(123456789012654321L))
  }

  test("DuckDB twin rounds explicitly before the scale cut") {
    // DuckDB's decimal→decimal CAST truncates; only round() matches Spark's
    // HALF_UP. The twin must round first or tails past 6 dp diverge.
    val sql = Carriers.microsSql("x")
    assert(sql.contains("round(x, 6)"), sql)
    assert(sql.contains("DECIMAL(30,6)") && sql.contains("1000000") &&
      sql.contains("BIGINT"))
  }
}
