package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pipeline observability surfaces: inline quality metrics via observe()
  * (no second scan) and storage-codec round-trips — the ops hooks a 100 TB
  * job exposes to its monitoring, asserted against known data facts. */
class ObservabilitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("observe() reports row/null/range metrics from the SAME pass") {
    val obs = Observation("events_quality")
    val ev = Tables.events(spark, dir)
    val out = ev.observe(obs,
        count(lit(1)).as("rows"),
        sum(col("value").isNull.cast("long")).as("null_values"),
        min("ts").as("ts_min"), max("ts").as("ts_max"))
      .filter(col("event_type") === "purchase")
    val kept = out.count()
    val m = obs.get
    // the metrics describe the FULL scan (pre-filter), proving they ride
    // the existing pass rather than a second job
    assert(m("rows") == ev.count())
    assert(kept < m("rows").asInstanceOf[Long])
    assert(m("null_values") ==
      ev.filter(col("value").isNull).count())
    assert(m("ts_min").asInstanceOf[Long] <= m("ts_max").asInstanceOf[Long])
  }

  test("zstd parquet round-trips bit-identically (storage codec swap)") {
    val docs = Tables.documents(spark, dir).orderBy("doc_id")
    val out = "/tmp/graft_fmt/docs_zstd"
    docs.write.mode("overwrite")
      .option("compression", "zstd").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    assert(files.nonEmpty && files.forall(_.contains(".zstd.")),
      s"codec not applied: ${files.mkString(",")}")
    val back = spark.read.parquet(out).orderBy("doc_id")
    assert(back.collect().map(_.toSeq).toSeq ==
      docs.collect().map(_.toSeq).toSeq)
  }
}
