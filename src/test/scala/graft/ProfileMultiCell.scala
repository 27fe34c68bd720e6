package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.battery.{Collate, FadeRul, Features}

/** Scratch profiler for the battery layer's multi-cell scale-out claim
  * (not a spec — run with Test/runMain graft.ProfileMultiCell [nCells...]).
  *
  * Synthesizes N cells of the BASELINE.md 500k-row fixture shape (500
  * cycles × 1000 samples, CC charge/discharge voltage ramps, 0.05%/cycle
  * fade) directly as distributed DataFrames (no CSV parse — this measures
  * the FEATURE pipeline, not ingest), then times
  *   (a) the ONE-PASS grouped pipeline over the collated table, keyed by
  *       (cell_id, cycle_index), and
  *   (b) N sequential single-cell runs (the reference's only mode),
  * both ending in the per-cell fade/RUL summary. The one-pass plan is the
  * scale-out story: same feature plans, one extra key column, shuffles
  * partition by (cell, cycle) so a fleet of cells fills the cluster.
  */
object ProfileMultiCell {

  /** One synthetic cell in canonical schema, 500 cycles x 1000 samples. */
  def cell(spark: SparkSession, cellId: Int,
           nCycles: Int = 500, samples: Int = 1000): DataFrame = {
    val n = nCycles.toLong * samples
    spark.range(n).select(
      (col("id") / samples).cast("long").as("cycle_index"),
      (col("id") % samples).as("i"))
      .select(
        // 1 Hz samples, cells offset by a day each
        timestamp_seconds(lit(cellId * 86400L) +
          col("cycle_index") * samples + col("i")).as("timestamp"),
        col("cycle_index"),
        when(col("i") < samples / 2, 1L).otherwise(2L).as("step_index"),
        when(col("i") < samples / 2, "CC Charge").otherwise("CC Discharge")
          .as("step_type"),
        when(col("i") < samples / 2, 1.5).otherwise(-1.5).as("current_a"),
        // charge ramp 3.0 -> 4.2 V, discharge ramp back down
        when(col("i") < samples / 2,
          lit(3.0) + col("i") * (1.2 / (samples / 2)))
          .otherwise(lit(4.2) - (col("i") - samples / 2) * (1.2 / (samples / 2)))
          .as("voltage_v"),
        lit(24.0).as("temp_c"),
        // cumulative Ah within the phase; discharge capacity fades
        // 0.05%/cycle off a 3.0 Ah rating (the BASELINE fixture's slope)
        when(col("i") < samples / 2, col("i") * (3.0 / (samples / 2)))
          .otherwise(lit(3.0)).as("charge_ah"),
        when(col("i") < samples / 2, 0.0)
          .otherwise((col("i") - samples / 2) * (3.0 / (samples / 2)) *
            (lit(1.0) - col("cycle_index") * 0.0005)).as("discharge_ah"),
        (col("cycle_index") * samples + col("i")).as("row_seq"))
  }

  def time[A](label: String)(f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[prof] $label%-38s $dt%8.2f s")
    (dt, r)
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 5, 10)
    val spark = GraftSession.local(32, "profile-multicell")
    spark.sparkContext.setLogLevel("WARN")
    val maxN = counts.max
    // materialize every cell once so neither mode pays generation cost
    val cells = (0 until maxN).map(i =>
      Collate.withCellId(cell(spark, i), s"CELL$i").localCheckpoint())
    val keys = Seq("cell_id", "cycle_index")
    // warm codegen paths once
    noop(Features.all(cells.head.drop("cell_id"), 3.0))

    val rows = counts.map { nc =>
      val collated = Collate.unionAll(cells.take(nc))
      val (onePass, _) = time(s"one-pass  n=$nc") {
        noop(FadeRul.summary(
          Features.all(collated, 3.0, keys = keys), cellKeys = Seq("cell_id")))
      }
      val (seq, _) = time(s"sequential n=$nc") {
        cells.take(nc).foreach(c =>
          noop(FadeRul.summary(Features.all(c.drop("cell_id"), 3.0))))
      }
      (nc, onePass, seq)
    }
    println("| cells | rows | one-pass s | per-cell s | sequential s | speedup |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (nc, one, seq) =>
      println(f"| $nc | ${nc * 500000}%,d | $one%.2f | ${one / nc}%.2f | $seq%.2f | ${seq / one}%.1f× |")
    }
    spark.stop()
  }
}
