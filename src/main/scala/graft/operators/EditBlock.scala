package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable edit-distance near-pair finding — the blocked twin of the
  * bounded all-pairs verifier in `e2_edit_distance` (TextOps). The reference
  * has no string-similarity op at all (its dedup is exact
  * `drop_duplicates`, /root/reference/pipeline.py:107); this is the
  * string-level member of the near-dup family (titles, URLs, short fields)
  * where shingle/token methods overshoot.
  *
  * Candidate generation is the segment-pigeonhole scheme (the PassJoin idea,
  * Li/Deng/Feng VLDB 2011, public literature): partition the INDEXED string
  * into t+1 contiguous segments; if ed(a,b) ≤ t then at most t segments are
  * touched by edits, so at least one segment of b appears VERBATIM in a,
  * starting within ±t of its original position. So:
  *
  *   index side: each string emits its t+1 own segments, keyed
  *               (own_len, seg_idx, seg_str);
  *   probe side: each string emits, for every length m within ±t that
  *               actually occurs in the data (broadcast length dictionary —
  *               no fabricating windows for lengths nobody has), the
  *               substrings lying in the ±t position window of each segment
  *               of a length-m partner, keyed the same way;
  *   join on the key → candidate superset → exact `levenshtein` re-rank.
  *
  * NEVER all-pairs: the only shuffles are the (len, seg_idx, seg_str) key
  * join and the candidate dedup, and candidates shrink with segment
  * selectivity. Probe fanout is bounded: ≤ |lengths within ±t| × (t+1)
  * segments × (2t+1) window positions per row, all arithmetic on scan
  * columns (no data-sized state). Measured on the driver corpus (30-char
  * prefixes, pathological 31-word vocabulary): t=8 → 41% of all-pairs
  * survive as candidates, t=4 → 8%; on a natural corpus segments are
  * near-unique and candidates are near-linear in matches.
  *
  * Short strings (len ≤ t) don't have t+1 nonempty segments, so the
  * pigeonhole guarantee fails for SHORT×SHORT pairs only (a long partner can
  * always serve as the indexed side). Those pairs go through an explicit
  * length-banded join of the short slice against itself — bounded, because
  * strings of length ≤ t are a fixed tiny universe at any corpus size.
  */
object EditBlock {

  // integer arithmetic throughout (Column./ is double division; sequence()
  // needs integral endpoints)
  private def segStart(m: Column, i: Column, k: Int): Column =
    (lit(1) + i * floor(m / k).cast("int") + least(i, m % k)).cast("int")
  private def segLen(m: Column, i: Column, k: Int): Column =
    (floor(m / k).cast("int") +
      when(i < m % k, lit(1)).otherwise(lit(0))).cast("int")

  /** All unordered pairs `(id_a < id_b, dist)` with
    * `levenshtein(strCol_a, strCol_b) <= t`. Exact (lossless vs all-pairs):
    * candidate generation is a pigeonhole superset, re-rank is exact.
    */
  def nearPairs(df: DataFrame, idCol: String, strCol: String,
                t: Int): DataFrame = {
    require(t >= 1, "threshold must be >= 1")
    val k = t + 1
    val s = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("n")).filter(col("s").isNotNull)
    val long = s.filter(col("n") > t)
    val short = s.filter(col("n") <= t)

    val si = explode(sequence(lit(0), lit(t))).as("si")
    // index side: own segments of every long string
    val idx = long.select(col("id").as("id_b"), col("n").as("m"), si, col("s"))
      .select(col("id_b"), col("m"), col("si"),
        col("s").substr(segStart(col("m"), col("si"), k),
          segLen(col("m"), col("si"), k)).as("seg"))
      .filter(length(col("seg")) > 0)

    // probe side: substrings in the ±t window of each segment of a length-m
    // partner, for the partner lengths that exist (broadcast dictionary)
    val lens = long.select(col("n").as("m")).distinct()
    val probe = s.join(broadcast(lens), abs(col("n") - col("m")) <= t)
      .select(col("id").as("id_a"), col("s"), col("n"), col("m"), si)
      .withColumn("st", segStart(col("m"), col("si"), k))
      .withColumn("ln", segLen(col("m"), col("si"), k))
      .withColumn("lo", greatest(lit(1), col("st") - t))
      .withColumn("hi", least(col("n") - col("ln") + 1, col("st") + t))
      // guard BEFORE explode: sequence(lo, hi) with lo > hi would generate a
      // descending range, not an empty one
      .filter(col("ln") > 0 && col("lo") <= col("hi"))
      .select(col("id_a"), col("m"), col("si"),
        explode(expr("array_distinct(transform(sequence(lo, hi), " +
          "p -> substring(s, p, ln)))")).as("seg"))

    val blocked = probe.join(idx, Seq("m", "si", "seg"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))

    // short×short fallback: the pigeonhole needs > t nonempty segments
    val shortPairs = short.select(col("id").as("id_a"), col("s").as("s_a"),
        col("n").as("n_a"))
      .join(short.select(col("id").as("id_b"), col("s").as("s_b"),
        col("n").as("n_b")),
        col("id_a") < col("id_b") && abs(col("n_a") - col("n_b")) <= t)
      .select("id_a", "id_b")

    val strs = s.select(col("id"), col("s"))
    blocked.union(shortPairs).distinct()
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= t)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
