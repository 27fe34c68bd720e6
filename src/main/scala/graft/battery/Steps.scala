package graft.battery

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Standalone step CLIs mirroring the reference's step scripts
  * (step12_qc.py, step13_collate.py, step14_report.py): same file-based
  * handoff, same exit-code semantics, driven by the shared engine layer.
  */
object Steps {

  /** `runMain graft.battery.Steps qc <features_csv_dir>` → exit 1 on failure
    * (step12_qc.py:67-73).
    * `runMain graft.battery.Steps collate <processed_dir> <out_dir>`
    * (step13_collate.py).
    * `runMain graft.battery.Steps report <features_csv> <summary_csv> <cell>`
    * (step14_report.py). */
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(app = s"battery-step-${args.headOption.getOrElse("?")}")
    try args.toList match {
      case "qc" :: features :: Nil =>
        val feats = spark.read.option("header", "true")
          .option("inferSchema", "true").csv(features)
        val checks = Qc.run(feats)
        checks.foreach(c => println(
          s"${if (c.passed) "ok  " else "WARN"} ${c.name}: ${c.detail}"))
        if (!Qc.passed(checks)) sys.exit(1)
      case "collate" :: dir :: out :: Nil =>
        val all = Collate.featuresFromDir(spark, dir)
        all.orderBy("cell_id", "cycle_index").coalesce(1)
          .write.mode("overwrite").option("header", "true")
          .csv(s"$out/_all_features.csv")
        println(s"→ wrote $out/_all_features.csv (${all.count()} rows)")
      case "report" :: features :: summary :: cell :: Nil =>
        val feats = spark.read.option("header", "true")
          .option("inferSchema", "true").csv(features)
        val summ = spark.read.option("header", "true")
          .option("inferSchema", "true").csv(summary)
        println(Report.markdown(cell, summ, feats))
      case other =>
        System.err.println(s"unknown step args: $other"); sys.exit(2)
    } finally spark.stop()
  }
}
