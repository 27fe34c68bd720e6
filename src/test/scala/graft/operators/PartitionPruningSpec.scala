package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Hive-style partitioned writes + partition pruning — with e8_zorder and
  * BucketingSpec, the third leg of the storage-layout story: a predicate on
  * the partition column must prune DIRECTORIES at planning time
  * (PartitionFilters on the scan, only the matching partition's files read),
  * not filter rows after a full scan.
  */
class PartitionPruningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("scan of a partitioned write prunes non-matching partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val types = new java.io.File(out).list().count(_.startsWith("event_type="))
    assert(types >= 3, s"expected several event_type= partition dirs, got $types")

    val q = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val p = q.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("event_type"),
      s"partition predicate must prune at the scan, not post-filter:\n$p")

    val n = q.count()
    val want = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(n == want && n > 0)
  }
}
