package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomFilterSpec extends SparkSpec {

  test("sizeBits rounds to a power of two at >= bitsPerKey per key") {
    assert(BloomFilter.sizeBits(1) == 64)
    assert(BloomFilter.sizeBits(100) == 4096) // 3200 -> 4096
    val m = BloomFilter.sizeBits(100000)
    assert(Integer.bitCount(m) == 1 && m >= 3200000)
  }

  test("no false negatives: every inserted key probes true (exhaustive)") {
    import spark.implicits._
    val keys = (0 until 2000).map(i => s"key-$i")
    val df = keys.toDF("k")
    val bits = BloomFilter.build(df, col("k"), BloomFilter.sizeBits(2000), 11)
    val misses = df.filter(!BloomFilter.mightContain(col("k"), bits, 11)).count()
    assert(misses == 0, s"$misses false negatives — structurally impossible")
  }

  test("false positive rate well under the gate bound on disjoint probes") {
    import spark.implicits._
    val inserted = (0 until 2000).map(i => s"key-$i").toDF("k")
    val bits = BloomFilter.build(inserted, col("k"),
      BloomFilter.sizeBits(2000), 11)
    val probes = (0 until 20000).map(i => s"other-$i").toDF("k")
    val fp = probes.filter(BloomFilter.mightContain(col("k"), bits, 11)).count()
    // expected ~1e-6/probe at m = 32n, k = 11 -> ~0.02 expected hits;
    // the 1% gate bound leaves orders of magnitude of margin
    assert(fp <= 20, s"$fp false positives in 20000 disjoint probes")
  }

  test("anyMightContain matches element-wise mightContain on arrays") {
    import spark.implicits._
    val inserted = Seq("apple", "banana", "cherry").toDF("k")
    val bits = BloomFilter.build(inserted, col("k"), 4096, 11)
    val arrs = Seq(
      (1L, Seq("x1", "x2", "banana")),  // one member
      (2L, Seq("x3", "x4")),            // none
      (3L, Seq.empty[String])           // empty array -> false
    ).toDF("id", "arr")
    val got = arrs.select(col("id"),
        BloomFilter.anyMightContain(col("arr"), bits, 11).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L))
    assert(got(3L) == false)
    // id 2 is false unless both probes false-positive (~1e-12)
    assert(got(2L) == false)
  }

  test("bit array size is bounded by the filter, not the key count") {
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"k$i").toDF("k")
    val m = BloomFilter.sizeBits(5000)
    val bits = BloomFilter.build(keys, col("k"), m, 11)
    assert(bits.length == m / 64)
  }
}
