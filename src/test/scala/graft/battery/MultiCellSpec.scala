package graft.battery

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-cell scale path: the same feature plans keyed by
  * (cell_id, cycle_index) must reproduce the per-cell single runs — this is
  * the partitioning story that scales the engine across a fleet of cells.
  */
class MultiCellSpec extends SparkSpec {

  test("collated features by (cell_id, cycle_index) == per-cell runs") {
    val a = Normalize(spark, resource("arbin_small.csv"))
    val n = Normalize(spark, resource("neware_small.csv"))
    val collated = Collate.unionAll(Seq(
      Collate.withCellId(a, "A"), Collate.withCellId(n, "B")))
    val keys = Seq("cell_id", "cycle_index")
    val multi = Features.all(collated, ratedAh = 3.0, keys = keys)
      .orderBy("cell_id", "cycle_index").collect()

    val singleA = Features.all(a, 3.0).orderBy("cycle_index").collect()
    val singleB = Features.all(n, 3.0).orderBy("cycle_index").collect()
    val multiA = multi.filter(_.getString(0) == "A")
    val multiB = multi.filter(_.getString(0) == "B")
    assert(multiA.length == singleA.length && multiB.length == singleB.length)

    val cols = Seq("Q_dis_Ah", "Q_chg_Ah", "CE", "q_norm", "E_dis_Wh",
      "IR_C2_ohm", "dQdV_peak_V", "dQdV_shift_mV")
    for ((ms, ss) <- Seq((multiA, singleA), (multiB, singleB));
         (m, s) <- ms.zip(ss); c <- cols) {
      val mi = m.fieldIndex(c); val si = s.fieldIndex(c)
      (m.isNullAt(mi), s.isNullAt(si)) match {
        case (true, true) =>
        case (false, false) =>
          assert(math.abs(m.getDouble(mi) - s.getDouble(si)) < 1e-12,
            s"$c cycle=${s.getAs[Long]("cycle_index")}")
        case other => fail(s"$c null mismatch $other")
      }
    }
  }

  test("per-cell summaries from one grouped pass match individual fits") {
    val a = Normalize(spark, resource("arbin_small.csv"))
    val n = Normalize(spark, resource("neware_small.csv"))
    val collated = Collate.unionAll(Seq(
      Collate.withCellId(a, "A"), Collate.withCellId(n, "B")))
    val feats = Features.all(collated, 3.0, keys = Seq("cell_id", "cycle_index"))
    val summaries = FadeRul.summary(feats, cellKeys = Seq("cell_id"))
      .orderBy("cell_id").collect()
    assert(summaries.length == 2)
    val soloA = FadeRul.summary(Features.all(a, 3.0)).head()
    assert(math.abs(summaries(0).getAs[Double]("fade_slope_pct_per_cycle") -
      soloA.getAs[Double]("fade_slope_pct_per_cycle")) < 1e-9)
  }
}
