package graft.battery

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Data-quality checks over the per-cycle feature table
  * (/root/reference/step12_qc.py:21-73): six aggregate predicates producing
  * warnings and an overall pass/fail. One multi-aggregate job — a single scan
  * regardless of table size; exit-code semantics stay with the caller.
  */
object Qc {

  case class Check(name: String, passed: Boolean, detail: String)

  /** All six checks in one aggregate pass. */
  def run(features: DataFrame): Seq[Check] = {
    val agg = features.agg(
      sum(when(col("cycle_index").isNull, 1).otherwise(0)).as("null_cycle"),
      sum(when(col("Q_dis_Ah").isNull, 1).otherwise(0)).as("null_qdis"),
      min("CE").as("ce_min"), max("CE").as("ce_max"),
      min_by(col("Q_dis_Ah"), col("cycle_index")).as("q_first"),
      max_by(col("Q_dis_Ah"), col("cycle_index")).as("q_last"),
      min("E_dis_Wh").as("e_min"),
      min("IR_C2_ohm").as("ir_min"), median(col("IR_C2_ohm")).as("ir_med"),
      max(abs(col("dQdV_shift_mV"))).as("shift_max"))
    val r: Row = agg.head()
    def d(name: String): Option[Double] =
      if (r.isNullAt(r.fieldIndex(name))) None else Some(r.getDouble(r.fieldIndex(name)))
    def l(name: String): Long = r.getLong(r.fieldIndex(name))

    val nulls = l("null_cycle") + l("null_qdis")
    val ceOk = (d("ce_min"), d("ce_max")) match {
      case (Some(lo), Some(hi)) => lo >= 0.95 && hi <= 1.05
      case _ => true
    }
    // capacity should not *rise* >2% first→last (/root/reference/step12_qc.py:35-37)
    val riseOk = (d("q_first"), d("q_last")) match {
      case (Some(q0), Some(q1)) if q0 != 0 => (q1 - q0) / q0 <= 0.02
      case _ => true
    }
    val energyOk = d("e_min").forall(_ > 0)
    val irOk = d("ir_min").forall(_ > 0) && d("ir_med").forall(_ <= 0.2)
    val shiftOk = d("shift_max").forall(_ <= 200.0)

    Seq(
      Check("null_ids_or_capacity", nulls == 0, s"$nulls null cycle_index/Q_dis_Ah values"),
      Check("ce_range_0.95_1.05", ceOk, s"CE ∈ [${d("ce_min")}, ${d("ce_max")}]"),
      Check("capacity_not_rising_2pct", riseOk, s"first=${d("q_first")} last=${d("q_last")}"),
      Check("energy_positive", energyOk, s"min E = ${d("e_min")}"),
      Check("ir_positive_median_le_0.2", irOk, s"min=${d("ir_min")} median=${d("ir_med")}"),
      Check("dqdv_shift_le_200mV", shiftOk, s"max |shift| = ${d("shift_max")}"))
  }

  def passed(checks: Seq[Check]): Boolean = checks.forall(_.passed)
}
