package graft.operators

import org.apache.spark.storage.StorageLevel

/** Storage level for every `localCheckpoint` in the engine.
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
  */
object Ckpt {
  val SerLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER
}
