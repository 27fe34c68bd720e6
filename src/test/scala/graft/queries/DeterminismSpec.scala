package graft.queries

import graft.SparkSpec

/** Partitioning-determinism: a distributed engine's results must not depend
  * on how work was split. Every cross-engine-hash trick in the catalog
  * (decimal carriers for sums, micro-quantized NLL/entropy terms, unique
  * window orderings, struct-ordered max_by tiebreaks) exists to make that
  * true — this spec proves it by running representative queries under
  * different shuffle partitionings and requiring bit-identical rows.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // one query per determinism mechanism: decimal-carrier sums (q1), window
  // keeper + version tiebreak (m2), micro-quantized double terms (logprob),
  // max_by argmax tiebreak (centroid assignment), banding + re-rank (lsh)
  // (+ round-4: quantized-distance ANN shortlist/re-rank, integer
  // correlation sums, packed-key shard head/tail)
  private val names = Seq("q1_pricing_summary", "m2_cdc_merge",
    "e4_unigram_logprob", "e3_centroids", "e2_minhash_lsh",
    "e3_pq_adc", "a17_lag_autocorr", "e8_shuffle_shards",
    // rank-weighted integer sums, islands grouping, closed-form interleave,
    // micro-quantized divergence terms
    "a24_gini", "w7_islands", "e8_interleave", "e4_jsd")

  test("results are bit-identical under different shuffle partitionings") {
    for (name <- names) {
      val run = (parts: String) => {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try QueryCatalog.queries(name)(spark, dir)
          .collect().map(_.toSeq).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      val a = run("3")
      val b = run("17")
      assert(a.nonEmpty, s"$name returned no rows")
      assert(a == b, s"$name diverged between 3 and 17 shuffle partitions")
    }
  }
}
