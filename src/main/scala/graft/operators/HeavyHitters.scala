package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over a high-cardinality key, found without shuffling
  * the key space: a per-partition Misra-Gries summary nominates candidates,
  * then ONE exact counting pass confirms them.
  *
  * The 100-TB shape argument: the naive `groupBy(key).having(n > f·N)` is a
  * full shuffle of every distinct key — at corpus scale the key space is the
  * data (URLs, user ids, n-grams), so that shuffle is corpus-sized. Here
  *   1. each input partition streams once through a k-counter Misra-Gries
  *      summary (k = ⌈2/f⌉, constant memory) and emits ≤ k candidate keys —
  *      any key with GLOBAL frequency > f·N must be locally frequent
  *      (> n_p/(k+1)) in at least one partition (pigeonhole: were it
  *      ≤ n_p/(k+1) everywhere, its total would be ≤ N/(k+1) < f·N), so the
  *      union of partition candidates is a SUPERSET of the true answer;
  *   2. the tiny candidate set broadcasts back, a semi join keeps only
  *      candidate-key rows, and an exact partial-aggregated count with the
  *      `> f·N` filter removes every false positive.
  * Net: the only exchanges carry O(k · partitions) candidates and the final
  * per-candidate counts — never the key space.
  *
  * Determinism: the candidate SET depends on partition layout (Misra-Gries
  * eviction order is arrival order), but the RESULT does not — phase 2's
  * exact counts admit every true heavy hitter (superset guarantee) and
  * reject every impostor, whatever partitioning nominated them. Pinned by a
  * 3-vs-17-partitions spec.
  *
  * The summaries are MERGEABLE (sum counters, then subtract the (k+1)-th
  * largest and drop non-positives — Agarwal/Cormode et al., "Mergeable
  * Summaries"): merging preserves the N/(k+1) total-undercount bound, which
  * is what lets [[graft.streaming.HeavyHittersStreaming]] fold micro-batch
  * summaries into one running sketch with the same superset guarantee as a
  * single batch pass.
  */
object HeavyHitters {

  /** Stand-in key for NULL, so a frequent null key flows through nomination,
    * counting, AND confirmation like any other value (a bare null would fall
    * out of the Misra-Gries map, the candidate equi-join, and the streaming
    * summary `Map[String, Long]` alike — review finding: it was counted into
    * `n_total` but could never be confirmed, silently diverging from the
    * `groupBy/HAVING` baseline, which treats null as a group). The sentinel
    * embeds NUL bytes, which no text key format produces; a data key equal
    * to it would merge with the null group — documented, not checked,
    * because checking costs a scan. [[confirm]] maps it back to null on
    * output, so results still read as the naive baseline's would. */
  private[graft] val NullKeySentinel = "\u0000graft:null-key\u0000"

  /** `df`'s key column as the operator's canonical `key` string column:
    * cast to string, nulls replaced by [[NullKeySentinel]]. Shared with the
    * streaming twin so batch and stream agree on null handling. */
  private[graft] def sentinelKeys(df: DataFrame, key: Column): DataFrame =
    df.select(coalesce(key.cast("string"), lit(NullKeySentinel)).as("key"))

  /** Keys of `df.select(key)` (as strings) with frequency strictly above
    * `minFrac` of the total row count, with their exact counts:
    * `(key, n_key, n_total)`. A null key is a key like any other (matching
    * the `groupBy(key).having(...)` baseline) and comes back as null.
    *
    * `df` is evaluated TWICE (the nomination pass and the exact confirm
    * pass) and is deliberately NOT materialized in between: at the corpus
    * scales this operator exists for, checkpointing the input would cost
    * more than the second scan. The input must therefore be deterministic
    * across scans — a rescan-stable source (files, a table), not a
    * `rand()`-derived or sampling-derived frame; feed such inputs through
    * `localCheckpoint` first. The RESULT's partition-layout independence
    * (pinned below) is a separate property and still holds.
    */
  def heavyHitters(df: DataFrame, key: Column, minFrac: Double): DataFrame = {
    val k = counters(minFrac)
    val keys = sentinelKeys(df, key)
    // phase 1: per-partition Misra-Gries candidate nomination (bounded
    // memory: at most k live counters per partition, whatever the data)
    val candidates = keys.select("key").as(Encoders.STRING)
      .mapPartitions(it => mgPartition(it, k).keysIterator)(Encoders.STRING)
      .toDF("key").distinct()
    confirm(keys, candidates, minFrac)
  }

  /** Counter budget for threshold fraction `minFrac`: ⌈2/f⌉ halves the
    * undercount bound below the threshold, so no true heavy hitter can be
    * evicted to zero. */
  def counters(minFrac: Double): Int = {
    require(minFrac > 0 && minFrac < 1, s"minFrac in (0,1), got $minFrac")
    math.ceil(2.0 / minFrac).toInt
  }

  /** One ≤ k-counter Misra-Gries summary of the whole DataFrame (a column
    * named "key"): per-partition summaries stream under bounded memory,
    * ≤ k·partitions rows reach the driver, and one merge folds them. Counts
    * are UNDERCOUNTS (true count minus at most N/(k+1)) — candidates for an
    * exact confirming pass, never answers. */
  def mgSummary(keys: DataFrame, k: Int): Map[String, Long] = {
    val parts = keys.select("key").as(Encoders.STRING)
      .mapPartitions(it => mgPartition(it, k).iterator)(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .collect()
    mergeAll(parts.iterator, k)
  }

  /** Merge two Misra-Gries summaries into one with ≤ k counters, preserving
    * the summed undercount bound. */
  def mergeSummaries(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] =
    mergeAll(a.iterator ++ b.iterator, k)

  /** Exact confirming pass shared by the batch and streaming paths, in ONE
    * corpus scan: a broadcast mark-join tags candidate rows, every
    * non-candidate collapses into a single null group, so the grouped
    * output is ≤ |candidates|+1 rows carrying both the per-candidate counts
    * AND (as the group-count sum, via an unpartitioned window over that
    * tiny set — deliberately single-partition, it is sketch-sized) the
    * exact total. `keys` must already be in [[sentinelKeys]] form (nulls
    * sentineled); the sentinel is mapped back to null on output.
    * Output: (key, n_key, n_total). */
  def confirm(keys: DataFrame, candidates: DataFrame,
      minFrac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    keys.join(broadcast(candidates.withColumn("__cand", lit(true))),
        Seq("key"), "left")
      .groupBy(when(col("__cand"), col("key")).as("key"))
      .agg(count(lit(1)).as("n_key"))
      .withColumn("n_total",
        sum(col("n_key")).over(Window.partitionBy()))
      .filter(col("key").isNotNull &&
        col("n_key") > col("n_total") * lit(minFrac))
      .withColumn("key", when(col("key") === lit(NullKeySentinel),
        lit(null).cast("string")).otherwise(col("key")))
  }

  /** [[confirm]] with driver-side candidates (e.g. a merged summary's key
    * set). */
  def confirmKeys(keys: DataFrame, candidates: Iterable[String],
      minFrac: Double): DataFrame = {
    import keys.sparkSession.implicits._
    confirm(keys, candidates.toSeq.toDF("key"), minFrac)
  }

  /** The classic MG stream step over one partition: ≤ k live counters; a
    * new key against a full table decrements every counter (batch-dropping
    * zeros) instead of entering. */
  private def mgPartition(it: Iterator[String],
      k: Int): mutable.HashMap[String, Long] = {
    val ctr = mutable.HashMap.empty[String, Long]
    it.foreach { s =>
      if (ctr.contains(s)) ctr(s) += 1L
      else if (ctr.size < k) ctr(s) = 1L
      else {
        val dead = mutable.ArrayBuffer.empty[String]
        ctr.keysIterator.foreach { c =>
          if (ctr(c) == 1L) dead += c else ctr(c) -= 1L
        }
        dead.foreach(ctr.remove)
      }
    }
    ctr
  }

  /** Sum counters per key; if more than k survive, subtract the (k+1)-th
    * largest count from all and drop non-positives (≤ k then remain, each
    * having absorbed one more bounded undercount). */
  private def mergeAll(entries: Iterator[(String, Long)],
      k: Int): Map[String, Long] = {
    val sum = mutable.HashMap.empty[String, Long]
    entries.foreach { case (key, n) =>
      sum.update(key, sum.getOrElse(key, 0L) + n)
    }
    if (sum.size <= k) sum.toMap
    else {
      val t = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.iterator.map { case (key, n) => (key, n - t) }
        .filter(_._2 > 0L).toMap
    }
  }
}
