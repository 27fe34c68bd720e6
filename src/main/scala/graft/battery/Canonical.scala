package graft.battery

import org.apache.spark.sql.types._

/** Canonical cycler time-series schema — the engine's one fixed schema.
  *
  * Mirrors the reference's nine canonical columns
  * (/root/reference/pipeline.py:138-139) plus an internal `row_seq` column that
  * makes row order explicit: pandas derives intra-cycle order from the global
  * timestamp sort (/root/reference/pipeline.py:148); Spark must carry the order
  * in every window, with `row_seq` (input-file order) as a deterministic
  * tiebreak under shuffle.
  */
object Canonical {
  val TimestampCol = "timestamp"
  val RowSeq = "row_seq"

  /** The nine user-facing columns, in reference order. */
  val columns: Seq[String] = Seq(
    "timestamp", "cycle_index", "step_index", "step_type",
    "current_a", "voltage_v", "temp_c", "charge_ah", "discharge_ah")

  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("cycle_index", LongType),
    StructField("step_index", LongType),
    StructField("step_type", StringType),
    StructField("current_a", DoubleType),
    StructField("voltage_v", DoubleType),
    StructField("temp_c", DoubleType),
    StructField("charge_ah", DoubleType),
    StructField("discharge_ah", DoubleType)))
}

/** Typed view of a canonical row (all fields nullable like the reference). */
case class CyclerSample(
    timestamp: Option[java.sql.Timestamp],
    cycle_index: Option[Long],
    step_index: Option[Long],
    step_type: Option[String],
    current_a: Option[Double],
    voltage_v: Option[Double],
    temp_c: Option[Double],
    charge_ah: Option[Double],
    discharge_ah: Option[Double])
