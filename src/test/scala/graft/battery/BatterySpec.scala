package graft.battery

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden end-to-end tests: each vendor fixture through normalize → features →
  * summary, compared against outputs of the measured reference run
  * (scripts/make_fixtures.py; SURVEY.md §5 test plan item 2).
  */
class BatterySpec extends SparkSpec {

  private val featureCols = Seq("cycle_index", "Q_dis_Ah", "Q_chg_Ah", "CE",
    "q_norm", "E_dis_Wh", "IR_C2_ohm", "dQdV_peak_V", "dQdV_shift_mV")

  private def features(csv: String): DataFrame = {
    val canonical = Normalize(spark, resource(csv))
    Features.all(canonical, ratedAh = 3.0)
  }

  private def checkGolden(csv: String, cell: String): Unit = {
    val got = features(csv).orderBy("cycle_index")
      .select(featureCols.map(col): _*).collect()
    val (header, want) = readGolden(s"golden_${cell}_features.csv")
    assert(header == featureCols, s"golden header mismatch: $header")
    assert(got.length == want.length, s"row count ${got.length} vs ${want.length}")
    for ((g, w) <- got.zip(want); i <- featureCols.indices) {
      val gv = if (g.isNullAt(i)) None else Some(g.get(i) match {
        case l: Long => l.toDouble
        case d: Double => d
      })
      assertClose(gv, w(i), 1e-9, s"$cell row cycle=${g.get(0)} col=${featureCols(i)}")
    }
  }

  test("Arbin fixture matches reference goldens") {
    checkGolden("arbin_small.csv", "ARBIN01")
  }

  test("Neware semicolon/mV/mAh fixture with sign flip matches goldens") {
    checkGolden("neware_small.csv", "NEWARE01")
  }

  test("Test_Time(s)-only fixture with current-sign step inference matches goldens") {
    checkGolden("timeonly_small.csv", "TIMEONLY01")
  }

  test("summary: fade slope and RUL match the reference") {
    val s = FadeRul.summary(features("arbin_small.csv")).head()
    // golden_ARBIN01_summary.csv: Q0=1.45, slope=-1.0 %/cycle, RUL=21.0
    assert(math.abs(s.getAs[Double]("Q0_Ah") - 1.45) < 1e-9)
    assert(math.abs(s.getAs[Double]("fade_slope_pct_per_cycle") - (-1.0)) < 1e-9)
    assert(math.abs(s.getAs[Double]("cycles_to_80pct") - 21.0) < 1e-6)
  }

  test("summary: flat capacity → near-zero slope (reference emits float noise)") {
    val s = FadeRul.summary(features("timeonly_small.csv")).head()
    // the reference's polyfit returns ~4e-14 noise here; either near-zero
    // slope or a NULL RUL is acceptable — assert the slope magnitude only
    assert(math.abs(s.getAs[Double]("fade_slope_pct_per_cycle")) < 1e-9)
  }

  test("normalize: canonical schema, junk numerics coerced to NULL") {
    val c = Normalize(spark, resource("arbin_small.csv"))
    assert(c.columns.toSeq ==
      (Canonical.columns :+ Canonical.RowSeq))
    // the fixture's junk Temperature(C) cell must be NULL, not NaN/string
    val junkRows = c.filter(col("temp_c").isNull).count()
    assert(junkRows == 1)
    assert(c.schema("cycle_index").dataType.typeName == "long")
    assert(c.schema("timestamp").dataType.typeName == "timestamp")
  }

  test("normalize: sign flip applied to Neware discharge-positive export") {
    val c = Normalize(spark, resource("neware_small.csv"))
    val disPos = c.filter(col("step_type").contains("DIS") && col("current_a") > 0).count()
    assert(disPos == 0, "discharge rows must be negative after flip")
  }

  test("normalize: missing timestamp-like column raises") {
    import spark.implicits._
    val raw = Seq(("1", "1.0")).toDF("Cycle_Index", "Voltage(V)")
    val e = intercept[IllegalArgumentException](Normalize.fromRaw(raw))
    assert(e.getMessage.contains("No timestamp-like column"))
  }

  test("qc: clean features pass; violations are flagged") {
    import spark.implicits._
    val clean = Seq(
      (1L, 1.45, 1.5, 0.97, 1.0, 0.056, 0.05, 4.0, 0.0),
      (2L, 1.44, 1.5, 0.96, 0.99, 0.056, 0.05, 4.0, 10.0))
      .toDF("cycle_index", "Q_dis_Ah", "Q_chg_Ah", "CE", "q_norm",
        "E_dis_Wh", "IR_C2_ohm", "dQdV_peak_V", "dQdV_shift_mV")
    assert(Qc.passed(Qc.run(clean)))
    val bad = clean.withColumn("CE", lit(1.5))
      .withColumn("E_dis_Wh", lit(-1.0))
    val checks = Qc.run(bad)
    assert(!Qc.passed(checks))
    assert(checks.count(!_.passed) == 2)
  }

  test("collate: union-by-name fills missing columns with NULL") {
    import spark.implicits._
    val a = Seq((1L, 1.0)).toDF("cycle_index", "Q_dis_Ah")
    val b = Seq((1L, 0.9)).toDF("cycle_index", "CE")
    val u = Collate.unionAll(Seq(
      Collate.withCellId(a, "A"), Collate.withCellId(b, "B")))
    assert(u.count() == 2)
    assert(u.columns.toSet == Set("cycle_index", "Q_dis_Ah", "cell_id", "CE"))
    assert(u.filter(col("cell_id") === "B" && col("Q_dis_Ah").isNull).count() == 1)
  }

  test("report: renders summary and first-cycle table") {
    val f = features("arbin_small.csv")
    val s = FadeRul.summary(f).withColumn("cell_id", lit("ARBIN01"))
    val md = Report.markdown("ARBIN01", s, f)
    assert(md.contains("# Cell report — ARBIN01"))
    assert(md.contains("| Q0 (Ah) | 1.45"))
    assert(md.contains("cycle_index"))
  }
}
