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
  * At-least-once retries are made IDEMPOTENT, not assumed away (review
  * finding): the corpus lands under `ingest_batch=<id>` directories written with
  * overwrite (a redelivered micro-batch replaces its own landing, never
  * double-appends), and the summary merge is guarded by the last-merged
  * batch id (a redelivered batch skips the merge — double-merging would
  * inflate counters and, through the merge's (k+1)-th-largest decrement,
  * could push an honest key's undercount past the guarantee). Pass a real
  * `checkpointDir` for restart-safe source progress; the batch-id guard
  * additionally protects within-run retries.
  *
  * Candidates are sketch output, never answers: [[confirmed]] runs the
  * exact confirming pass against the landed corpus at the threshold the
  * state was BUILT for (carried in [[HhState]] — a looser ad-hoc threshold
  * would silently miss keys the sketch was never sized to retain), so the
  * final answer is exact and identical to the batch operator on the same
  * rows. StreamingHeavyHittersSpec pins that parity.
  *
  * State is one ≤ k-entry map — driver-sized BY CONSTRUCTION (that is the
  * entire point of the sketch), volatile because foreachBatch runs on the
  * stream execution thread.
  */
object HeavyHittersStreaming {

  final class HhState(val minFrac: Double) {
    val k: Int = HeavyHitters.counters(minFrac)
    @volatile var summary: Map[String, Long] = Map.empty
    @volatile var rowsSeen: Long = 0L
    @volatile var lastBatchId: Long = -1L
  }

  def emptyState(minFrac: Double): HhState = new HhState(minFrac)

  /** Start the stream: parquet file source over `inputDir` → per-batch MG
    * summary merged into `state`, raw batch landed under
    * `corpusDir/ingest_batch=<id>` (the store the confirming pass reads; in
    * deployment the feed usually lands there anyway). `keyExpr` is a SQL
    * expression producing the monitored key from a feed row. Callers drive
    * with `processAllAvailable()` and confirm via [[confirmed]].
    *
    * Restart recovery is ENFORCED, not just documented (review finding): if
    * the corpus already holds batches the given state has not merged
    * (`lastBatchId` behind the landed maximum — the restarted-with-
    * `emptyState` mistake, where a checkpointed source would resume PAST
    * the landed batches while the sketch is empty and [[confirmed]] would
    * silently miss every pre-restart heavy hitter), the state is rebuilt
    * from the corpus via [[stateFromCorpus]] before the stream starts —
    * one bounded-memory MG pass over what already landed, the same cost
    * profile as one confirming pass. */
  def runHeavyHitterStream(spark: SparkSession, inputDir: String,
      schema: StructType, keyExpr: String, corpusDir: String,
      state: HhState, checkpointDir: Option[String] = None): StreamingQuery = {
    if (maxLandedBatch(spark, corpusDir) > state.lastBatchId) {
      val rebuilt = stateFromCorpus(spark, corpusDir, keyExpr, state.minFrac)
      state.summary = rebuilt.summary
      state.rowsSeen = rebuilt.rowsSeen
      state.lastBatchId = rebuilt.lastBatchId
    }
    val w = spark.readStream.schema(schema)
      .parquet(inputDir)
      .writeStream
    checkpointDir.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keyed = HeavyHitters.sentinelKeys(batch, expr(keyExpr))
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        try {
          val n = keyed.count()
          if (n > 0) {
            // idempotent landing: a redelivery of batchId overwrites its
            // own directory instead of double-appending
            // `ingest_batch` is reserved for the landing layout — pick a
            // name feed schemas won't carry (a data column of the same name
            // would collide with the inferred partition column on read)
            batch.write.mode("overwrite")
              .parquet(s"$corpusDir/ingest_batch=$batchId")
            // idempotent merge: fold each batch into the sketch ONCE
            if (batchId > state.lastBatchId) {
              state.summary = HeavyHitters.mergeSummaries(state.summary,
                HeavyHitters.mgSummary(keyed, state.k), state.k)
              state.rowsSeen += n
              state.lastBatchId = batchId
            }
          }
        } finally keyed.unpersist()
        ()
      }
      .start()
  }

  /** Rebuild an [[HhState]] from the landed corpus after a restart (the
    * running summary is session memory — a restarted stream with a
    * checkpoint resumes the SOURCE where it left off, so the sketch must be
    * re-derived): one bounded-memory MG pass over the corpus reproduces a
    * valid ≤ k summary with the same superset guarantee (it IS the batch
    * sketch of everything so far), and `lastBatchId` resumes from the
    * highest landed `ingest_batch` so redelivered batches keep skipping the
    * merge. */
  def stateFromCorpus(spark: SparkSession, corpusDir: String,
      keyExpr: String, minFrac: Double): HhState = {
    val state = new HhState(minFrac)
    val corpus = spark.read.parquet(corpusDir)
    val keys = HeavyHitters.sentinelKeys(corpus, expr(keyExpr))
    state.summary = HeavyHitters.mgSummary(keys, state.k)
    val bounds = corpus.agg(count(lit(1)), max(col("ingest_batch"))).head()
    state.rowsSeen = bounds.getLong(0)
    state.lastBatchId = bounds.get(1) match {
      case null => -1L
      case b: Number => b.longValue()
    }
    state
  }

  /** The exact heavy hitters of everything landed so far: the running
    * summary's keys (a superset of the truth at the state's threshold)
    * confirmed with exact counts against the corpus. Bit-identical to the
    * batch operator at `state.minFrac` on the same rows. */
  def confirmed(spark: SparkSession, corpusDir: String, keyExpr: String,
      state: HhState): DataFrame = {
    val keys = HeavyHitters.sentinelKeys(spark.read.parquet(corpusDir),
      expr(keyExpr))
    HeavyHitters.confirmKeys(keys, state.summary.keys, state.minFrac)
  }

  /** Highest `ingest_batch=` id landed under `corpusDir`, or -1 when the
    * corpus is absent or empty — filesystem metadata only (one directory
    * listing), so the restart check in [[runHeavyHitterStream]] is free on
    * the fresh-start path. */
  private def maxLandedBatch(spark: SparkSession, corpusDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("ingest_batch="))
      .map(_.stripPrefix("ingest_batch=").toLong)
      .foldLeft(-1L)(math.max)
  }
}
