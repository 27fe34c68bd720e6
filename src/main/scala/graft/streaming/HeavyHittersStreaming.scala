package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.operators.HeavyHitters

/** Streaming heavy hitters: the batch sketch
  * ([[graft.operators.HeavyHitters]]) composed into a Structured Streaming
  * `foreachBatch` loop — the operational shape of frequency monitoring over
  * a feed (hot URLs in a crawl, hot keys ahead of a partitioner, abusive
  * clients in a request log).
  *
  * Per micro-batch: ONE bounded-memory Misra-Gries pass summarizes the
  * batch, and the ≤ k-counter batch summary MERGES into the ≤ k-counter
  * running summary (sum + (k+1)-th-largest decrement — the mergeable-
  * summaries operation, which preserves the N/(k+1) total-undercount bound
  * across any batch split). The running summary therefore nominates a
  * SUPERSET of the true heavy hitters of everything streamed so far, for
  * k = ⌈2/f⌉, exactly as one batch pass would — a slow-burn key that is
  * cold in every individual batch but hot in aggregate survives the merge,
  * which per-batch re-nomination alone would lose.
  *
  * Candidates are sketch output, never answers: [[confirmed]] runs the
  * exact confirming pass against the landed corpus (micro-batches append to
  * a parquet directory — in deployment the feed lands there anyway), so the
  * final answer is exact and identical to the batch operator on the same
  * rows. StreamingHeavyHittersSpec pins that parity.
  *
  * State is one ≤ k-entry map — driver-sized BY CONSTRUCTION (that is the
  * entire point of the sketch), volatile because foreachBatch runs on the
  * stream execution thread.
  */
object HeavyHittersStreaming {

  final class HhState(val k: Int) {
    @volatile var summary: Map[String, Long] = Map.empty
    @volatile var rowsSeen: Long = 0L
  }

  def emptyState(minFrac: Double): HhState =
    new HhState(HeavyHitters.counters(minFrac))

  /** Start the stream: parquet file source over `inputDir` → per-batch MG
    * summary merged into `state`, raw batch appended to `corpusDir` (the
    * landing store the confirming pass reads). `keyExpr` is a SQL
    * expression producing the monitored key from a feed row. Callers drive
    * with `processAllAvailable()` and confirm via [[confirmed]]. */
  def runHeavyHitterStream(spark: SparkSession, inputDir: String,
      schema: StructType, keyExpr: String, corpusDir: String,
      state: HhState): StreamingQuery = {
    spark.readStream.schema(schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyed = batch.select(expr(keyExpr).cast("string").as("key"))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        try {
          val n = keyed.count()
          if (n > 0) {
            // land the batch first, then fold its summary: a failure
            // between the two leaves extra corpus rows but a behind
            // summary, and re-summarizing on retry only ever ADDS counts —
            // the superset guarantee survives either interleaving (the
            // exact confirm pass reads the corpus, not the sketch)
            batch.write.mode("append").parquet(corpusDir)
            state.summary = HeavyHitters.mergeSummaries(
              state.summary, HeavyHitters.mgSummary(keyed, state.k), state.k)
            state.rowsSeen += n
          }
        } finally keyed.unpersist()
        ()
      }
      .start()
  }

  /** The exact heavy hitters of everything landed so far: the running
    * summary's keys (a superset of the truth) confirmed with exact counts
    * against the corpus. Bit-identical to the batch operator on the same
    * rows. */
  def confirmed(spark: SparkSession, corpusDir: String, keyExpr: String,
      state: HhState, minFrac: Double): DataFrame = {
    val keys = spark.read.parquet(corpusDir)
      .select(expr(keyExpr).cast("string").as("key"))
    HeavyHitters.confirmKeys(keys, state.summary.keys, minFrac)
  }
}
