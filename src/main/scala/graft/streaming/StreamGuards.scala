package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** What a micro-batch turned out to be, once checked against the stream's
  * delivery contract. */
private[streaming] sealed trait BatchVerdict
/** Idle trigger — nothing to absorb. */
private[streaming] case object EmptyBatch extends BatchVerdict
/** Every id in the batch is already absorbed: a source-level redelivery
  * (the same files landing twice). Absorbing again would duplicate state,
  * so the caller must SKIP — which makes redelivery idempotent instead of
  * fatal. */
private[streaming] case object RedeliveredBatch extends BatchVerdict
/** A genuinely new batch; `maxId` is its high-water mark for the caller to
  * adopt after a successful absorb. */
private[streaming] final case class FreshBatch(maxId: Long)
  extends BatchVerdict

/** The shared micro-batch delivery contract of the stateful foreachBatch
  * loops ([[DedupStreaming]], [[AnnStreaming]]): batches carry monotone
  * ids, each id exactly once. Violations used to all fail loudly; that was
  * the wrong call for the one violation a HEALTHY deployment produces —
  * an at-least-once source redelivering a fully-absorbed batch after a
  * crash — so classification now separates three cases on the cheap path
  * and only pays for a membership probe when the cheap check trips:
  *
  *  1. `min > maxSeen` — the normal case: fresh batch, absorb. One tiny
  *     4-value aggregate over the (batch-sized) id column; no state read.
  *  2. ids at or below the high-water mark, ALL already absorbed — a
  *     redelivery: skip (idempotent). Detected by an id semi-join of the
  *     batch against the absorbed-id set; the absorbed side is passed
  *     lazily and only evaluated on this suspicious path, so the normal
  *     path never scans state. The id join is the same magnitude as the
  *     state joins the absorb itself performs.
  *  3. ids at or below the high-water mark, NOT all absorbed — genuine
  *     disorder (or a corrupted feed): throw. Absorbing would silently
  *     lose pairs/postings through the `a < b` candidate guards, exactly
  *     the failure the original always-throw guard existed for.
  *
  * A duplicated id WITHIN one batch (two landed copies coalesced into one
  * trigger) still throws in every case: the min-vs-max check cannot see
  * it, and neither skip nor absorb is safe.
  */
private[streaming] object StreamGuards {

  /** Classify one micro-batch. `batchIds` / `absorbedIds` are single-column
    * long-id frames (any column name); `absorbedIds` is by-name lazy and
    * only evaluated when the batch overlaps the high-water mark. `idName` /
    * `what` label the error messages ("doc_id" / "near-dedup"). */
  /** The within-batch exactly-once check ALONE — for paths that already
    * know how to place the batch (e.g. a batchId-keyed crash replay, which
    * bypasses the high-water classification) but must still reject a
    * duplicated id inside the batch. Returns the batch's max id, or None
    * for an empty batch. */
  def requireUniqueIds(batchIds: DataFrame, idName: String,
      what: String): Option[Long] = {
    val idc = col(batchIds.columns.head)
    val bounds = batchIds.agg(max(idc), count(idc), countDistinct(idc)).head()
    if (bounds.isNullAt(0)) None
    else {
      val (mx, n, nd) =
        (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
      if (n != nd)
        throw new IllegalStateException(
          s"duplicated $idName within a micro-batch ($n rows, $nd distinct " +
            s"ids); the $what stream requires exactly-once rows within a " +
            "batch (dedupe the landing feed)")
      Some(mx)
    }
  }

  def classify(batchIds: DataFrame, maxSeenId: Long,
      absorbedIds: => DataFrame, idName: String,
      what: String): BatchVerdict = {
    val idc = col(batchIds.columns.head)
    val bounds = batchIds
      .agg(min(idc), max(idc), count(idc), countDistinct(idc)).head()
    if (bounds.isNullAt(0)) EmptyBatch
    else {
      val (mn, mx, n, nd) = (bounds.getLong(0), bounds.getLong(1),
        bounds.getLong(2), bounds.getLong(3))
      if (n != nd)
        throw new IllegalStateException(
          s"duplicated $idName within a micro-batch ($n rows, $nd distinct " +
            s"ids); the $what stream requires exactly-once rows within a " +
            "batch (dedupe the landing feed)")
      if (mn > maxSeenId) FreshBatch(mx)
      else {
        val present = batchIds.select(idc.as("__graft_id")).distinct()
          .join(absorbedIds.select(col(absorbedIds.columns.head)
            .as("__graft_id")).distinct(), "__graft_id")
          .count()
        if (present == nd) RedeliveredBatch
        else throw new IllegalStateException(
          s"out-of-order micro-batch: min $idName $mn <= already-absorbed " +
            s"max $maxSeenId, but only $present of $nd batch ids are in the " +
            s"absorbed set — this is new data arriving below the high-water " +
            s"mark, not a redelivery; the $what stream requires id-ordered " +
            "arrival (re-key or buffer the feed)")
      }
    }
  }
}
