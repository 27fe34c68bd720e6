package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.queries.VectorOps

/** Streaming IVF index maintenance — the ANN twin of [[DedupStreaming]].
  *
  * The deployment posture behind e3_ivf_ann is: train the coarse quantizer
  * ONCE at index-build time (persisted per fixture), then keep the inverted
  * lists current as new vectors land. This module is that second half as a
  * Structured Streaming composition: an embeddings file source feeds
  * micro-batches to a foreachBatch loop where each batch is prepped and
  * assigned map-side against the BROADCAST frozen quantizer
  * ([[VectorOps.nearestCentroid]] — the identical assignment rule the batch
  * build uses), and the resulting postings rows `(vec_id, cluster, v, nrm)`
  * append to the running posting store. Serving reads the store through
  * [[VectorOps.ivfServeTopK]] — the same probe + candidate-join + re-rank
  * plan as the from-scratch batch query, so a stream-maintained index
  * answers queries byte-identically to a batch rebuild
  * (StreamingAnnSpec pins both the postings and the served top-k).
  *
  * Scale shape: per micro-batch cost is O(batch × nlist) map-side scoring
  * plus one O(batch) append — nothing historical is ever re-assigned, and
  * the store only ever grows by the batch. At 100 TB this is the nightly
  * crawl-embedding ingest; the posting store is a partitioned table keyed
  * by `cluster` (the serving-join key), and quantizer RETRAINING stays an
  * offline index-rebuild event, exactly as in IVF practice — a retrain
  * invalidates the store and re-runs the batch build.
  *
  * Arrival order is irrelevant to the index (assignment is per-row
  * independent); the monotone-id guard below only enforces the feed's
  * no-redelivery contract, because a re-delivered vec_id would duplicate
  * its postings row (serving hides it behind candidate dedup, but the
  * store would grow wrong — fail loudly instead).
  */
object AnnStreaming {

  /** Mutable per-stream state: the running posting store
    * `(vec_id, cluster, v, nrm)`. localCheckpoint'd per batch with the
    * superseded snapshot released — the bounded-lineage pattern shared
    * with [[DedupStreaming.NearDedupState]]. */
  final class IvfIndexState(initPostings: DataFrame) {
    @volatile var postings: DataFrame = initPostings
    /** Highest vec_id absorbed so far (the no-redelivery guard). */
    @volatile var maxSeenId: Long = Long.MinValue
  }

  /** Fresh empty index bound to `spark`. An operational deployment seeds it
    * from the batch build's posting table instead. */
  def emptyState(template: DataFrame): IvfIndexState =
    new IvfIndexState(
      VectorOps.prepEmb(template.limit(0))
        .withColumn("cluster", lit(null).cast("long"))
        .localCheckpoint(true, graft.operators.Ckpt.SerLevel))

  /** Start the ingest stream: parquet file source over `inputDir` (new
    * embedding files appearing over time) → per-micro-batch assign + append.
    * `cents` is the FROZEN broadcast quantizer (e.g.
    * [[VectorOps.persistedTrainedCentroids]] — the same artifact the batch
    * query serves from). Callers drive with `processAllAvailable()` and
    * read the running store from `state`. */
  def runIvfIngestStream(spark: SparkSession, inputDir: String,
      embSchema: StructType, state: IvfIndexState,
      cents: DataFrame): StreamingQuery = {
    spark.readStream.schema(embSchema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ONE prep pass per micro-batch; the table serves both the
        // redelivery guard and the assignment scoring. unpersist rides a
        // finally so a guard throw cannot leak the checkpointed blocks;
        // an empty micro-batch (idle trigger) skips the assignment and
        // snapshot work entirely.
        val b = VectorOps.prepEmb(batch).localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        try {
          val bounds = checkBatchContract(b, state.maxSeenId)
          if (!bounds.isNullAt(0)) {
            // posting rows in ONE exchange: the assignment aggregate
            // carries (v, nrm) through its own shuffle instead of
            // re-joining the batch
            val newPostings = VectorOps.assignWithVectors(b, cents)
              .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
            // build the new snapshot (eager checkpoint) BEFORE mutating
            // any state, and advance maxSeenId only after the swap — a
            // mid-batch failure then leaves the previous consistent state
            // intact, so a retry of the lost batch passes the guard
            val next = state.postings.unionByName(newPostings)
              .localCheckpoint(true, graft.operators.Ckpt.SerLevel)
            val prev = state.postings
            state.postings = next
            state.maxSeenId = bounds.getLong(1)
            prev.unpersist()
          }
        } finally b.unpersist()
        ()
      }
      .start()
  }

  /** The micro-batch delivery contract, shared by BOTH ingest modes (heap
    * snapshot and on-disk append) so the two paths cannot drift apart: one
    * tiny aggregate per batch rejects (a) a re-delivered batch — min id at
    * or below the high-water mark — and (b) a vec_id duplicated WITHIN the
    * batch (two landed copies coalesced into one trigger), which the
    * min-vs-max guard alone cannot see. Returns the
    * (min, max, count, distinct) bounds row; all-null row 0 = empty batch. */
  private def checkBatchContract(b: DataFrame,
      maxSeenId: Long): org.apache.spark.sql.Row = {
    val bounds = b.agg(min(col("vec_id")), max(col("vec_id")),
      count(col("vec_id")), countDistinct(col("vec_id"))).head()
    if (!bounds.isNullAt(0)) {
      if (bounds.getLong(0) <= maxSeenId)
        throw new IllegalStateException(
          s"re-delivered micro-batch: min vec_id ${bounds.getLong(0)} " +
            s"<= already-indexed max $maxSeenId; the ANN ingest " +
            "stream requires exactly-once id-ordered arrival (a " +
            "re-delivered id would duplicate its posting row)")
      if (bounds.getLong(2) != bounds.getLong(3))
        throw new IllegalStateException(
          s"duplicated vec_id within a micro-batch (${bounds.getLong(2)} " +
            s"rows, ${bounds.getLong(3)} distinct ids); the ANN ingest " +
            "stream requires exactly-once vectors (dedupe the landing feed)")
    }
    bounds
  }

  /** Mutable state for the ON-DISK append stream: only the no-redelivery
    * high-water mark (the posting rows themselves live in the partitioned
    * parquet store, not on the heap). */
  final class StoreAppendState {
    @volatile var maxSeenId: Long = Long.MinValue
  }

  /** Start the ingest stream APPENDING to the on-disk partitioned posting
    * store ([[VectorOps.postingStorePath]]'s layout): each micro-batch is
    * assigned map-side against the frozen broadcast quantizer, then its
    * posting rows land as NEW parquet files under their `cluster=`
    * directories — existing lists are never rewritten, and serving reads
    * the directory through the same DPP-pruned plan as the batch-built
    * store ([[VectorOps.serveFromStorePath]]; StreamingAnnSpec pins
    * stream-appended == batch-built served results). Delivery contract:
    * the parquet append is at-least-once under a mid-batch crash (a retry
    * re-appends the partial batch's rows — a transactional table format
    * slots in here at scale); serving stays EXACT regardless because the
    * candidate join dedups on (q_id, vec_id), so the guard below only
    * protects the store's row count, not correctness. */
  def runIvfStoreAppendStream(spark: SparkSession, inputDir: String,
      embSchema: StructType, storePath: String, state: StoreAppendState,
      cents: DataFrame): StreamingQuery = {
    spark.readStream.schema(embSchema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = VectorOps.prepEmb(batch).localCheckpoint(true, graft.operators.Ckpt.SerLevel)
        try {
          val bounds = checkBatchContract(b, state.maxSeenId)
          if (!bounds.isNullAt(0)) {
            VectorOps.assignWithVectors(b, cents)
              .select(col("vec_id"), col("v"), col("nrm"), col("cluster"))
              .write.mode("append").partitionBy("cluster").parquet(storePath)
            state.maxSeenId = bounds.getLong(1)
          }
        } finally b.unpersist()
        ()
      }
      .start()
  }

  /** Serve top-k from the stream-maintained index — the identical plan as
    * the batch e3_ivf_ann serving path, reading `(v, nrm, cluster)` from
    * the posting store instead of re-assigning the corpus. */
  def serveTopK(state: IvfIndexState, cents: DataFrame, nQueries: Int,
      k: Int, nprobe: Int = 4): DataFrame =
    VectorOps.ivfServeTopK(
      state.postings.select("vec_id", "v", "nrm"),
      cents,
      state.postings.select("vec_id", "cluster"),
      nQueries, k, nprobe)
}
