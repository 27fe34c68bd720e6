package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Storage level + block-granularity policy for every `localCheckpoint` in
  * the engine.
  *
  * Spark's default local-checkpoint level is MEMORY_AND_DISK —
  * DESERIALIZED. That level has a scale trap on the read path: a partition
  * that was evicted to disk is re-cached as deserialized Java object values
  * when next read (`BlockManager.maybeCacheDiskValuesInMemory` →
  * `MemoryStore.putIteratorAsValues`), and the unroll of a data-sized
  * partition's object graph is exactly the allocation that blew a
  * 250 MB/task heap share on the 40× fixture (g1_pagerank, task OOM inside
  * `putIteratorAsValues` while re-inflating the checkpointed edge table).
  *
  * MEMORY_AND_DISK_SER keeps checkpoint blocks as serialized bytes in BOTH
  * tiers: UnsafeRow externalization is a flat byte copy (compact, cheap),
  * reads stream-deserialize row-at-a-time instead of unrolling whole
  * partitions into the heap, and the re-cache path stores bytes, not
  * objects. The iterative operators (PageRank, ConnectedComponents), the
  * persisted-state dedup/ANN kernels and the streaming per-batch snapshots
  * all read each checkpoint a handful of times per round, so the per-read
  * deserialization cost is noise next to the bounded-memory guarantee.
  *
  * The serialized level has its OWN granularity trap, found by the 100×
  * probe one fixture size past the 40× fix: when a data-sized checkpoint
  * lands in FEW partitions (g1's edge table: ~4 GB in 32 blocks of
  * ~130 MB), blocks evicted to disk under memory pressure are re-cached on
  * the next read as ONE whole `ByteBuffer.allocate(blockSize)` per task
  * (`BlockManager.maybeCacheDiskBytesInMemory`) — 32 concurrent tasks ×
  * 130 MB transient buffers on top of live execution memory OOMed the
  * 8 GB probe heap. Storage-level tuning can't fix granularity;
  * [[bounded]] does.
  */
object Ckpt {
  val SerLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER

  /** Target serialized block size for [[bounded]] — small enough that a
    * whole-block re-inflation per task is noise against a 250 MB/task heap
    * share, large enough that a 100-GB table stays in the low thousands of
    * blocks. */
  val TargetBlockBytes: Long = 32L << 20

  /** `localCheckpoint(SerLevel)` with MEASURED block granularity: after the
    * eager checkpoint materializes, the actual cached size is read off the
    * block manager (driver-side metadata, no job) and, when average block
    * size exceeds 2× [[TargetBlockBytes]], the checkpoint is re-laid-out by
    * an explicit-count round-robin repartition (exempt from AQE
    * coalescing) and the fat original released. Iteration-invariant tables
    * that are re-read every round (PageRank/CC edge tables) pay the one
    * extra shuffle only when the fixture is big enough for block fatness
    * to matter — at sf0.1 and 10× the measured layout is already under
    * target and this is a no-op.
    *
    * The storage-info diff identifies the new checkpoint by RDD id; under
    * concurrent checkpointing from another thread the match can pick the
    * sibling — harmless for correctness (repartition preserves rows; the
    * worst case is one table keeping its fat layout). Measured, not
    * estimated, because Catalyst's non-CBO size estimate for a join-derived
    * table is a children-size product — off by orders of magnitude in both
    * directions. */
  def bounded(df: DataFrame,
      targetBytes: Long = TargetBlockBytes): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getRDDStorageInfo.map(_.id).toSet
    val ck = df.localCheckpoint(true, SerLevel)
    val created = sc.getRDDStorageInfo
      .filterNot(i => before(i.id)).sortBy(-_.id).headOption
    created match {
      case Some(i) if i.numCachedPartitions > 0 =>
        val total = i.memSize + i.diskSize
        if (total / i.numCachedPartitions > 2 * targetBytes) {
          val n = math.max(i.numCachedPartitions + 1,
            math.min(1 << 14, total / targetBytes).toInt)
          val re = ck.repartition(n).localCheckpoint(true, SerLevel)
          ck.unpersist()
          re
        } else ck
      case _ => ck
    }
  }
}
