package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md §7 / brief: "salting for skew").
  *
  * AQE's skew-join handles sort-merge skew adaptively at runtime; this is
  * the deliberate, planner-independent form for the pathological case — a
  * handful of join keys carrying an outsized share of a fact table. The
  * fact side gets a deterministic per-row salt in [0, buckets), the
  * dimension side is replicated ×buckets, and the join key becomes
  * (key, salt): one hot key now spreads over `buckets` shuffle partitions.
  *
  * Cost model: dimension-side rows are duplicated ×buckets, so this is for
  * a dimension small enough to replicate but too large (or too mid-sized)
  * to broadcast outright — the classic gap between broadcast joins and
  * skew-crushed sort-merge joins.
  */
object SkewOps {

  /** Equi-join `big ⋈ small` on `key` with the big side salted.
    *
    * @param saltBy a column of `big` that varies within a key (any unique or
    *               near-unique id) — hashed to spread one key's rows across
    *               buckets deterministically (no rand(): identical plans
    *               re-execute identically, which retries/speculation need).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltBy: Column, buckets: Int): DataFrame = {
    require(buckets > 0)
    val b = big.withColumn("_salt", pmod(xxhash64(saltBy), lit(buckets.toLong)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
