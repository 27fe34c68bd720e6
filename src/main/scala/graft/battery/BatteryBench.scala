package graft.battery

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** End-to-end battery-pipeline timing on a vendor CSV, measured INSIDE the
  * session (excludes JVM/session startup, like BASELINE.md excludes the
  * interpreter floor). Prints one JSON line.
  *
  * Usage: runMain graft.battery.BatteryBench <csv> [cores]
  */
object BatteryBench {
  def main(args: Array[String]): Unit = {
    val csv = args.headOption.getOrElse("/tmp/big_cell.csv")
    val cores = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.local(cores, "battery-bench")
    // cold = first run (includes whole-stage-codegen compilation of every
    // operator); warm = steady-state throughput, the honest comparison
    // against the baseline's derived rows/s (which excludes its ~1 s
    // interpreter floor)
    def once(out: String): (Double, Long, Double) = {
      val t0 = System.nanoTime()
      val r = BatteryPipeline.run(spark, csv, "BENCH", ratedAh = 3.0,
        outDir = Some(out))
      val nFeat = r.features.count()
      val slope = r.summary.head().getAs[Double]("fade_slope_pct_per_cycle")
      r.features.unpersist()
      ((System.nanoTime() - t0) / 1e9, nFeat, slope)
    }
    val (cold, nFeat, slope) = once("/tmp/battery_bench_out1")
    val (warm, _, _) = once("/tmp/battery_bench_out2")
    println(s"""{"metric":"battery_e2e","value":$warm,"cold_sec":$cold,"unit":"sec","rows":500000,"feature_rows":$nFeat,"fade_slope_pct":$slope,"cores":$cores}""")
    spark.stop()
  }
}
