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

  /** Conservative serialized-bytes-per-source-byte inflation for
    * [[sourceBytes]]-driven pre-partitioning: parquet is columnar-compressed
    * and UnsafeRow externalization is not — the g1 edge table measured
    * ~2.6× its source parquet bytes. Overshooting only makes blocks
    * smaller. */
  val SerInflation: Long = 3L

  /** Sum of the FILE-SOURCE leaf sizes of `df`'s optimized plan — the one
    * size signal that is real, not estimated (file relations report actual
    * file bytes). Every other leaf is skipped: a checkpointed-RDD leaf
    * COPIES its origin plan's Catalyst estimate, which without CBO is a
    * children-size product for join-derived plans — off by orders of
    * magnitude in both directions (measured: a band-join-derived
    * checkpoint leaf claiming astronomically more than its real size) —
    * and intermediate-plan estimates are untrustworthy for the same
    * reason. Returns 0 when no file leaf is visible: "no trustworthy
    * signal", which [[bounded]] maps to measured-backstop-only.
    * Driver-side plan walk, no job. */
  def sourceBytes(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val s = df.queryExecution.optimizedPlan.collectLeaves().map {
      case r: LogicalRelation => r.stats.sizeInBytes
      case r: DataSourceV2ScanRelation => r.stats.sizeInBytes
      case _ => BigInt(0)
    }.sum
    if (s > BigInt(Long.MaxValue)) Long.MaxValue else s.toLong
  }

  /** Partition count that lays `bytes` of source data out near
    * [[TargetBlockBytes]] after [[SerInflation]]; 0 (= "no signal, leave
    * the layout alone") when `bytes` is 0 or already fits the session's
    * shuffle width. Callers that know their join/agg key should spend this
    * on a KEYED repartition feeding that operation — the wide layout then
    * REPLACES the operation's own shuffle and downstream checkpoints
    * inherit it, instead of bounded's round-robin fallback adding one
    * (measured on g1 at 100×: key-reuse 66 s vs +93 s for the round-robin
    * form, because the per-round join lost its reusable exchange). */
  def partitionsFor(bytes: Long,
      targetBytes: Long = TargetBlockBytes): Int = {
    if (bytes <= 0) return 0
    val want = math.min(1L << 14, bytes * SerInflation / targetBytes).toInt
    val sp = org.apache.spark.sql.SparkSession.active.conf
      .get("spark.sql.shuffle.partitions").toInt
    if (want > sp) want else 0
  }

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
    * The measured re-layout alone is NOT enough for a data-sized table: the
    * measurement pass itself materializes fat blocks, and any of those
    * evicted to disk under the put pressure re-inflates WHOLE when the
    * re-layout shuffle reads it back — the same OOM one step later (the
    * second 100× g1 failure). So callers that know their table is
    * data-sized pass `sizeHintBytes` (typically [[sourceBytes]] of the
    * pre-checkpoint plan — real file bytes, scaled by [[SerInflation]]) and
    * the FIRST materialization is already laid out near target; the
    * measured pass then merely verifies and backstops a hint that was >2×
    * under. A zero/absent hint skips pre-partitioning (right for
    * vertex-sized round tables, where an extra shuffle per round would cost
    * more than it protects).
    *
    * The storage-info diff identifies the new checkpoint by RDD id; under
    * concurrent checkpointing from another thread the match can pick the
    * sibling — harmless for correctness (repartition preserves rows; the
    * worst case is one table keeping its fat layout). Measured, not
    * estimated, because Catalyst's non-CBO size estimate for a join-derived
    * table is a children-size product — off by orders of magnitude in both
    * directions. */
  def bounded(df: DataFrame,
      targetBytes: Long = TargetBlockBytes,
      sizeHintBytes: Long = 0L): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val pre = {
      // round-robin fallback for callers with no reusable key; the width
      // check is against the session shuffle setting, NOT df.rdd (under
      // AQE, materializing the RDD to count partitions can trigger
      // partial execution of the plan being checkpointed)
      val want = partitionsFor(sizeHintBytes, targetBytes)
      if (want > 0) df.repartition(want) else df
    }
    val before = sc.getRDDStorageInfo.map(_.id).toSet
    val ck = pre.localCheckpoint(true, SerLevel)
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
