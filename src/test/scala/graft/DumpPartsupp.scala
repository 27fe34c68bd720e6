package graft

import org.apache.spark.sql.SparkSession

import graft.queries.PartsuppOps

/** Dumps the two partsupp spec-only twins (TPC-H Q2/Q20 full forms) as
  * parquet for the LOCAL DuckDB oracle replay (`scripts/check_partsupp.py`)
  * — round-10 verdict item 6: the scale fixtures carry a partsupp table, so
  * these last spec-only queries can reach the same hash-check evidence
  * standard as every catalog row. Not a spec — run with
  * `Test/runMain graft.DumpPartsupp [outDir]`; fixture from
  * SPARK_GRAFT_SF_DIR (default scale_sf1). */
object DumpPartsupp {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf1")
    val out = args.headOption.getOrElse("/tmp/graft_partsupp_out")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    PartsuppOps.q2MinCostSupplier(spark, dir)
      .write.mode("overwrite").parquet(s"$out/ps1_min_cost_full")
    // non-default params: the scale fixture's partsupp draws ps_suppkey
    // from a 10× wider stream than the supplier dim, so the spec defaults
    // (%bolt%, NATION_3) select an EMPTY excess set — a vacuous check.
    // (%a%, NATION_19) drives every operator in the decorrelated shape
    // with surviving rows; check_partsupp.py carries the same params.
    PartsuppOps.q20ExcessStock(spark, dir,
        nation = "NATION_19", nameLike = "%a%")
      .write.mode("overwrite").parquet(s"$out/ps2_excess_stock_full")
    println(s"[dump-partsupp] wrote $out from $dir")
    spark.stop()
  }
}
