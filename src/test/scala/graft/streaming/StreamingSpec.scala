package graft.streaming

import graft.{SparkSpec, Tables}

/** Structured Streaming parity: the streaming pipeline (file source →
  * watermark → tumbling agg → memory sink) must produce exactly the batch
  * transform's result once all input is processed. */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling-hourly equals the batch transform") {
    val q = EventsStreaming.runTumbling(spark, dir, "stream_tumbling_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_tumbling_test")
        .collect().map(_.toSeq).toSet
      val batch = EventsStreaming.tumblingHourly(Tables.events(spark, dir))
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }
}
