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
  *      (> n_p/k) in at least one partition (pigeonhole: if it were ≤ n_p/k
  *      everywhere, its total would be ≤ N/k < f·N), so the union of
  *      partition candidates is a SUPERSET of the true answer;
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
  */
object HeavyHitters {

  /** Keys of `df.select(key)` (as strings) with frequency strictly above
    * `minFrac` of the total row count, with their exact counts:
    * `(key, n_key, n_total)`.
    */
  def heavyHitters(df: DataFrame, key: Column, minFrac: Double): DataFrame = {
    require(minFrac > 0 && minFrac < 1, s"minFrac in (0,1), got $minFrac")
    val k = math.ceil(2.0 / minFrac).toInt
    val keys = df.select(key.cast("string").as("key"))

    // phase 1: per-partition Misra-Gries candidate nomination (bounded
    // memory: at most k live counters per partition, whatever the data)
    val candidates = keys.select("key").as(Encoders.STRING)
      .mapPartitions { it =>
        val ctr = mutable.HashMap.empty[String, Long]
        it.foreach { s =>
          if (ctr.contains(s)) ctr(s) += 1L
          else if (ctr.size < k) ctr(s) = 1L
          else {
            // decrement-all; drop zeros (the classic MG step, amortized by
            // batching the removal)
            val dead = mutable.ArrayBuffer.empty[String]
            ctr.keysIterator.foreach { c =>
              if (ctr(c) == 1L) dead += c else ctr(c) -= 1L
            }
            dead.foreach(ctr.remove)
          }
        }
        ctr.keysIterator
      }(Encoders.STRING)
      .toDF("key").distinct()

    // phase 2: exact confirmation — count ONLY candidate-key rows (broadcast
    // semi join), threshold against the exact total. The total rides along
    // as a broadcast 1-row aggregate so the whole thing stays one lazy plan.
    val total = df.agg(count(lit(1)).as("n_total"))
    keys.join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("n_key"))
      .crossJoin(broadcast(total))
      .filter(col("n_key") > col("n_total") * lit(minFrac))
  }
}
