package graft.battery

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `row_seq` must be the file-order row number regardless of how the scan is
  * split (VERDICT round 1, watch item 5): the scan-metadata derivation in
  * [[Normalize.withScanRowSeq]] anchors numbering to (file, block start,
  * row-in-block), so perturbing `spark.sql.files.maxPartitionBytes` — which
  * changes both the split count and the partition-index layout that a bare
  * monotonically_increasing_id() encodes — must not move a single row.
  */
class RowSeqSpec extends SparkSpec {

  private val csv = getClass.getResource("/arbin_small.csv").getPath

  private def seqOf(maxPartitionBytes: String): Seq[(Long, String)] = {
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      Normalize(spark, csv)
        .select(col(Canonical.RowSeq),
          concat_ws("|", col("timestamp"), col("voltage_v"), col("current_a"))
            .as("row"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1)
        .toSeq
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("row_seq is dense file order and survives scan re-splitting") {
    val whole = seqOf("128m") // single split
    val sliced = seqOf("512") // ~6 splits over a ~3 KB file
    assert(whole.map(_._1) == whole.indices.map(_.toLong),
      "row_seq must be dense 0..n-1")
    assert(sliced == whole,
      "re-splitting the scan must not change row_seq assignment")
    val n = spark.read.option("header", "true").csv(csv).count()
    assert(whole.size.toLong == n)
  }

  test("goldens still match under a many-split scan") {
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val feats = Features.all(Normalize(spark, csv), ratedAh = 3.0)
        .orderBy("cycle_index").collect()
      val single = {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        Features.all(Normalize(spark, csv), ratedAh = 3.0)
          .orderBy("cycle_index").collect()
      }
      assert(feats.toSeq == single.toSeq)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }
}
