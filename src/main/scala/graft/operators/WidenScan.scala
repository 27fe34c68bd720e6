package graft.operators

import org.apache.spark.sql.Dataset

/** Decouple COMPUTE parallelism from input file layout for per-row-expensive
  * operators (regex tokenization, shingling, hashing, binary decode).
  *
  * A parquet scan's parallelism is bounded by its splittable units: a table
  * landed as one file with one fat row group scans as ONE effective
  * partition no matter how many byte-range splits Spark creates (only the
  * split containing the row-group start does work). For scan-bound queries
  * that's irrelevant; for text/decode operators whose per-byte compute cost
  * is 10–100× the scan cost it silently single-threads the whole query —
  * the round-10 100× probe measured e4_langid/e4_fingerprint at 14× their
  * 10× time (10× data, one core) against a single-row-group fixture, the
  * generalization of the round-9 per-row simhash finding (33 s @ 1
  * partition vs 5 s @ 8). Fat row groups are not a fixture artifact: crawl
  * shards and single-writer exports land exactly like this in practice.
  *
  * The fix is one explicit-count round-robin repartition (AQE-exempt) when
  * the scan arrives narrower than the session's cores: the shuffle moves
  * only the raw column bytes once (linear, tiny next to the downstream
  * compute it parallelizes), and is SKIPPED whenever the input is already
  * at least core-wide — a many-file 100-TB table never pays it.
  *
  * Intended for SCAN-rooted inputs: `df.rdd.getNumPartitions` on a pure
  * file scan is driver-side planning only (no exchange exists, so AQE has
  * no stage to materialize early).
  *
  * GATE ON CONSUMER COMPUTE, NOT INPUT BYTES (round-10 watch item): the
  * call site knows whether its per-row work is tokenizer/shingle/codec-
  * grade (widen) or hash/byte-prefix-grade (don't — the repartition cost
  * the scan-bound mm_* rows 2-3× at sf0.1 for parallelism they could not
  * use). A bytes heuristic cannot make this call: the 10× fixture is
  * 5.7 MB and its tokenizer rows still needed widening 4-6×.
  */
object WidenScan {
  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val cores = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < cores) ds.repartition(cores) else ds
  }
}
