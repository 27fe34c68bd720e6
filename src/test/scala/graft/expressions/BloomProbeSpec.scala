package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.BloomFilter

/** The compiled Bloom probe must agree bit-for-bit with the expression
  * spelling it replaced — same xxhash64 fold (h2 is hashLong(seed2, h1),
  * NOT h1 under a different seed), same k double-hashed positions, same
  * verdict on members (always true — no false negatives), non-members,
  * and null keys. */
class BloomProbeSpec extends SparkSpec {

  test("kernel ≡ expression spelling on members, non-members, null") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"member_$i")
    val keyDf = keys.toDF("key")
    val k = 11
    val bits = BloomFilter.build(keyDf, col("key"),
      BloomFilter.sizeBits(keys.size.toLong), k)

    val probes = (keys.take(100) ++ (0 until 400).map(i => s"absent_$i"))
      .map(Option(_)) :+ Option.empty[String]
    val df = probes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "key")
    val both = df.select(col("id"),
        BloomFilter.probe(col("key"), bits, k).as("kernel"),
        BloomFilter.mightContain(col("key"), bits, k).as("ref"))
      .collect()
    both.foreach { r =>
      // xxhash64 SKIPS null children (hash = seed), so even the null key
      // yields a concrete verdict in both spellings
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"id ${r.getLong(0)} nullness")
      assert(r.getBoolean(1) == r.getBoolean(2), s"id ${r.getLong(0)}")
    }
    // structural: every member probes true in BOTH spellings
    val neg = keyDf.select(BloomFilter.probe(col("key"), bits, k).as("p"))
      .filter(!col("p")).count()
    assert(neg == 0L, "false negative from the kernel probe")
  }
}
