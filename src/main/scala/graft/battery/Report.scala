package graft.battery

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markdown cell report (/root/reference/step14_report.py:24-58): a driver-side
  * template over a collected 1-row summary and the first 10 feature rows —
  * bounded collects, never data-sized.
  */
object Report {

  private def fmt(v: Any, nd: Int): String = v match {
    case null => ""
    case d: java.lang.Double =>
      BigDecimal(d).setScale(nd, BigDecimal.RoundingMode.HALF_EVEN).toString
    case other => other.toString
  }

  def markdown(cellId: String, summary: DataFrame, features: DataFrame): String = {
    val s = summary.head()
    val cols = Seq("cycle_index" -> 0, "Q_dis_Ah" -> 4, "Q_chg_Ah" -> 4,
      "CE" -> 4, "E_dis_Wh" -> 4, "IR_C2_ohm" -> 4, "dQdV_peak_V" -> 3)
    val top = features.orderBy("cycle_index")
      .select(cols.map(c => col(c._1)): _*)
      .limit(10).collect()
    val header = cols.map(_._1).mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    val body = top.map { r =>
      cols.zipWithIndex.map { case ((_, nd), i) => fmt(r.get(i), nd) }
        .mkString("| ", " | ", " |")
    }.mkString("\n")
    def sv(name: String): String =
      if (summary.columns.contains(name)) fmt(s.getAs[Any](name), 4) else ""
    // NOTE: built by concatenation, not stripMargin — interpolated table rows
    // start with "|", which stripMargin would strip as a margin character.
    Seq(
      s"# Cell report — $cellId", "",
      "## Summary", "",
      "| metric | value |",
      "| --- | --- |",
      s"| Q0 (Ah) | ${sv("Q0_Ah")} |",
      s"| fade slope (%/cycle) | ${sv("fade_slope_pct_per_cycle")} |",
      s"| cycles to 80% | ${sv("cycles_to_80pct")} |", "",
      "## First cycles", "",
      header, sep, body, ""
    ).mkString("\n")
  }
}
