package graft.battery

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession

/** Flagship end-to-end battery pipeline (/root/reference/pipeline.py:263-314):
  * vendor CSV → canonical parquet → per-cycle features → per-cell summary →
  * CSV sinks + markdown report.
  *
  * The whole thing is one lazy DAG with a single cache point: the canonical
  * table is persisted before the four-way feature fan-out (the reference holds
  * it in RAM between passes, /root/reference/pipeline.py:280-292 — here the
  * cache spills gracefully and the fan-out shares one shuffle key).
  */
object BatteryPipeline {

  case class Result(canonical: DataFrame, features: DataFrame,
                    summary: DataFrame, report: String)

  def run(spark: SparkSession, csvPath: String, cellId: String = "CELL01",
          ratedAh: Double = 3.0, dV: Double = 0.05,
          outDir: Option[String] = None): Result = {
    // Mirror the reference's normalize → parquet → features structure
    // (/root/reference/pipeline.py:280-292), which is also the fast path
    // here: the CSV is parsed once inside the sorted-parquet write, and the
    // feature pass reads the columnar parquet back instead of re-parsing or
    // caching row data. Without a sink directory the features run straight
    // off the lazy canonical plan.
    val normalized = Normalize(spark, csvPath)
    val canonical = outDir.map { d =>
      val p = s"$d/${cellId}_timeseries.parquet"
      Normalize.writeParquet(normalized.orderBy("timestamp"), p)
      spark.read.parquet(p)
    }.getOrElse(normalized)

    // per-cycle features are tiny (one row per cycle) but feed several sinks
    // (CSV, summary, report) — persist to compute the feature DAG once
    val features = Features.all(canonical, ratedAh, dV)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val summary = FadeRul.summary(features)
      .select(lit(cellId).as("cell_id"), col("Q0_Ah"),
        col("fade_slope_pct_per_cycle"), col("cycles_to_80pct"))

    outDir.foreach { d =>
      features.orderBy("cycle_index").coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$d/${cellId}_features_full.csv")
      summary.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$d/${cellId}_summary.csv")
    }
    val report = Report.markdown(cellId, summary, features)
    outDir.foreach { d =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$d/${cellId}_report.md"), report)
      // S8 quick plots (reference's plot_capacity/plot_ce PNGs, emitted as
      // SVG): driver-side from the already-persisted per-cycle features
      QuickPlots.write(features, cellId, d)
    }
    Result(canonical, features, summary, report)
  }

  /** CLI mirroring `pipeline.py --in --cell --rated_ah`. */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) => k -> v
    }.toMap
    val in = opts.getOrElse("--in", sys.error("--in <csv> required"))
    val cell = opts.getOrElse("--cell", "CELL01")
    val rated = opts.getOrElse("--rated_ah", "3.0").toDouble
    val out = opts.getOrElse("--out", "data/processed")
    val spark = GraftSession.local(app = "battery-pipeline")
    try {
      val r = run(spark, in, cell, rated, outDir = Some(out))
      r.features.orderBy("cycle_index").show(10)
      r.summary.show()
      println(r.report)
    } finally spark.stop()
  }
}
