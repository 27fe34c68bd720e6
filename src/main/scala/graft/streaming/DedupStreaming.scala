package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.functions.TextFunctions
import graft.operators.ConnectedComponents

/** Streaming INCREMENTAL near-dedup (round-8 verdict item 2): the batch
  * building blocks — `minhashIncrementalPairsFromSig` (arriving docs
  * band-join the persisted signature store) and
  * `ConnectedComponents.mergeNewPairs` (new pairs absorb into the persisted
  * labeling through cluster roots only) — composed into a Structured
  * Streaming `foreachBatch` loop. This is the realistic 100 TB deployment
  * mode of the dedup family: a crawl feed lands as micro-batches, each
  * micro-batch is signed ONCE (the only O(batch) text pass), pairs form
  * only through band buckets against the store, the labeling merge touches
  * O(new pairs) roots, and the signature store grows by exactly the batch.
  * Nothing historical is ever re-shingled, re-hashed, or re-clustered.
  *
  * State lives in two DataFrame snapshots (signature store + labeling),
  * localCheckpoint'd per batch with the previous snapshot released — the
  * same bounded-lineage pattern as
  * [[EventsStreaming.runForeachBatchUpsert]]; a Delta/Iceberg MERGE slots
  * into the same callback at scale. StreamingDedupSpec pins the parity
  * contract: a stream-fed store and labeling must equal one batch run
  * (`signatureTable` / `minLabel(minhashLshPairs(...))`) over everything
  * processed.
  *
  * Contract inherited from the batch entry points: micro-batches arrive in
  * id order (every id in batch t exceeds every id in batches < t — the
  * arrival-order contract of a crawl feed with monotone ids). Out-of-order
  * ids would mis-direct the `doc_a < doc_b` candidate guard, exactly as
  * documented on [[TextFunctions.minhashIncrementalPairs]].
  */
object DedupStreaming {

  /** Mutable per-stream state: the running signature store and labeling.
    * Exposed so tests (and an operational caller) can read the current
    * snapshots between micro-batches; volatile because foreachBatch runs on
    * the stream execution thread. */
  final class NearDedupState(initSig: DataFrame, initLabels: DataFrame) {
    @volatile var storeSig: DataFrame = initSig
    @volatile var labeling: DataFrame = initLabels
    /** Highest doc_id absorbed so far (MinValue = nothing yet); the
      * arrival-order guard below checks each batch against it. */
    @volatile var maxSeenId: Long = Long.MinValue
    /** Pairs emitted so far (accumulated delta output — what a downstream
      * pair sink would have received). */
    @volatile var pairsSeen: DataFrame = initSig.sparkSession
      .createDataFrame(
        initSig.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_a",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_b",
            org.apache.spark.sql.types.LongType))))
  }

  /** Fresh empty state bound to `spark` (no history: empty store, empty
    * labeling). An operational deployment seeds it from last night's parquet
    * artifacts instead. */
  def emptyState(spark: SparkSession, template: DataFrame,
                 numHashes: Int, shingleLen: Int): NearDedupState = {
    val sig = TextFunctions
      .signatureTable(template.limit(0), numHashes, shingleLen)
      .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    val lab = template.select(col("doc_id").as("id"),
      col("doc_id").as("cluster_id")).limit(0).localCheckpoint(true, graft.operators.Ckpt.SerLevel)
    new NearDedupState(sig, lab)
  }

  /** Start the stream: parquet file source over `inputDir` (one or more
    * document files appearing over time) → per-micro-batch sign + band-join
    * + root-merge. Callers drive with `processAllAvailable()` and read the
    * running state from `state`. */
  def runNearDedupStream(spark: SparkSession, inputDir: String,
      docSchema: StructType, state: NearDedupState,
      numHashes: Int = 64, bands: Int = 8, shingleLen: Int = 5,
      threshold: Double = 0.8): StreamingQuery = {
    spark.readStream.schema(docSchema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ONE signing pass per micro-batch; the table then serves both the
        // pair finding and the store append. Its unpersist rides a finally
        // so a guard throw cannot leak the checkpointed blocks; an empty
        // micro-batch (idle trigger) skips the merge entirely.
        val batchSig = TextFunctions
          .signatureTable(batch, numHashes, shingleLen)
          .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        try {
          // arrival-order contract CHECKED, not assumed: the banding
          // join's doc_a < doc_b guard silently drops a store-vs-batch
          // candidate whose store id exceeds the batch id, so an
          // out-of-order feed would lose pairs without an error anywhere
          // downstream. The same aggregate also catches a doc_id
          // duplicated WITHIN the batch (a double-landed file coalesced
          // into one micro-batch), which would corrupt the store just as
          // silently. One tiny aggregate over the batch-sized signature
          // table per micro-batch.
          val bounds = batchSig.agg(min(col("doc_id")), max(col("doc_id")),
            count(col("doc_id")), countDistinct(col("doc_id"))).head()
          if (!bounds.isNullAt(0)) {
            if (bounds.getLong(0) <= state.maxSeenId)
              throw new IllegalStateException(
                s"out-of-order micro-batch: min doc_id ${bounds.getLong(0)} " +
                  s"<= already-absorbed max ${state.maxSeenId}; the near-dedup " +
                  "stream requires id-ordered arrival (re-key or buffer the feed)")
            if (bounds.getLong(2) != bounds.getLong(3))
              throw new IllegalStateException(
                s"duplicated doc_id within a micro-batch (${bounds.getLong(2)} " +
                  s"rows, ${bounds.getLong(3)} distinct ids); the near-dedup " +
                  "stream requires exactly-once docs (dedupe the landing feed)")
            val newPairs = TextFunctions.minhashIncrementalPairsFromSig(
                state.storeSig, batchSig, numHashes, bands, threshold)
              .select("doc_a", "doc_b")
              .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
            // build EVERY new snapshot (eager checkpoints) before mutating
            // any state: a mid-batch failure then leaves the previous
            // consistent state intact — maxSeenId still points at the last
            // fully-absorbed batch, so a retry of the lost batch passes
            // the arrival guard instead of being rejected as out-of-order
            val newLab = ConnectedComponents
              .mergeNewPairs(state.labeling, newPairs, "doc_a", "doc_b")
              .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
            val newSig = state.storeSig.unionByName(batchSig)
              .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
            val newPairsSeen = state.pairsSeen.unionByName(newPairs)
              .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
            val (prevLab, prevSig, prevPairs) =
              (state.labeling, state.storeSig, state.pairsSeen)
            state.labeling = newLab
            state.storeSig = newSig
            state.pairsSeen = newPairsSeen
            state.maxSeenId = bounds.getLong(1)
            // every superseded or intermediate checkpoint is released once
            // the new snapshots exist — without this each micro-batch pins
            // additional copies in the block store (unbounded growth over
            // a long run): the previous snapshots AND the batch-local
            // newPairs (already folded into labeling + pairsSeen)
            prevLab.unpersist()
            prevSig.unpersist()
            prevPairs.unpersist()
            newPairs.unpersist()
          }
        } finally batchSig.unpersist()
        ()
      }
      .start()
  }
}
