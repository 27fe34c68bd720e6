package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom filter for set-membership pre-filtering at corpus scale
  * (decontamination, blocklist lookup, incremental-dedup probe).
  *
  * The exact decontamination path (`e2_decontaminate`) broadcasts the
  * benchmark n-gram SET and joins — right when the set fits in an executor,
  * but a 10⁹-entry benchmark no longer broadcasts as strings. The Bloom
  * form compresses membership to ~4 bytes/key at 2⁻²⁰-ish per-probe error:
  *
  *  - build: one tiny shuffle over the BENCHMARK keys only (k probe
  *    positions per key, `groupBy(word) + bit_or` partial-aggregates
  *    map-side to ≤ m/64 rows per partition), collected as a long[] —
  *    bounded by the filter size m, never by the corpus.
  *  - probe: the bit array rides the plan as a literal (broadcast
  *    semantics) and membership is a codegen'd `exists` over each doc's
  *    shingle array — the CORPUS side is pure map-side: zero shuffle, zero
  *    explode, no join. At 100 TB this is the difference between "scan +
  *    filter" and "shuffle the hit set".
  *
  * No false negatives ever (structural); false-positive rate set by m/n.
  * With m = 32·n bits (pow2-rounded) and k = 11 double-hashed probes the
  * per-probe FP rate is ~1e-6, so even ~100-shingle docs flag falsely at
  * ≤ 1e-4 — the driver row gates recall = 100% and doc-level FP ≤ 1%.
  *
  * Double hashing pos_i = h1 + i·h2 (Kirsch-Mitzenmacher) is sound here —
  * both h1 and h2 are full-range xxhash64 draws, unlike the collapsed
  * narrow-h2 variant that broke min-hashing (see MinHashSig notes).
  */
object BloomFilter {

  /** Second-hash seed: any fixed value ≠ xxhash64's default (42). */
  private val Seed2 = 0x5EED2L

  private def h1(c: Column): Column = xxhash64(c)
  private def h2(c: Column): Column = xxhash64(c, lit(Seed2))

  /** i-th probe position in [0, m); m must be a power of two. */
  private def pos(key: Column, i: Column, m: Int): Column =
    (h1(key) + i.cast("long") * h2(key)).bitwiseAND(lit(m - 1L))

  /** Size the filter: m = next power of two ≥ bitsPerKey·n (min 64). */
  def sizeBits(n: Long, bitsPerKey: Int = 32): Int = {
    require(n > 0, "empty key set")
    val want = math.max(64L, n * bitsPerKey)
    var m = 64L
    while (m < want) m <<= 1
    require(m <= Int.MaxValue, s"filter of $m bits exceeds array addressing")
    m.toInt
  }

  /** Build the bit array from `keys` (one column, any hashable type).
    * Distributed: k probe rows per key, bit positions OR-folded per 64-bit
    * word in one partial-aggregated shuffle of ≤ m/64 rows; the collect is
    * bounded by the filter size, not the key count. */
  def build(keys: DataFrame, key: Column, m: Int, k: Int): Array[Long] = {
    require(Integer.bitCount(m) == 1, s"m=$m not a power of two")
    val words = m / 64
    val bits = keys.select(key.as("key"))
      .select(explode(sequence(lit(0), lit(k - 1))).as("i"), col("key"))
      .select(pos(col("key"), col("i"), m).as("p"))
      .select(shiftrightunsigned(col("p"), 6).cast("int").as("w"),
        // shiftleft with a COLUMN shift amount — the DSL overload only
        // takes a literal, the registered SQL function takes both
        call_function("shiftleft", lit(1L),
          col("p").bitwiseAND(lit(63L)).cast("int")).as("bit"))
      .groupBy("w").agg(call_function("bit_or", col("bit")).as("word"))
      .collect()
    val arr = new Array[Long](words)
    bits.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** All k probe bits set, given the key's two precomputed hashes. */
  private def probesOk(h1c: Column, h2c: Column, bits: Array[Long],
                       k: Int): Column = {
    val m = bits.length * 64
    require(Integer.bitCount(m) == 1)
    val bitsLit = typedLit(bits.toSeq)
    forall(sequence(lit(0), lit(k - 1)), i => {
      val p = (h1c + i.cast("long") * h2c).bitwiseAND(lit(m - 1L))
      val word = element_at(bitsLit,
        shiftrightunsigned(p, 6).cast("int") + 1)
      call_function("shiftrightunsigned", word,
        p.bitwiseAND(lit(63L)).cast("int")).bitwiseAND(lit(1L)) === 1L
    })
  }

  /** Membership probe: true iff all k probe bits are set. REFERENCE
    * spelling (HOF + element_at over the bits literal), kept for
    * cross-checking [[probe]] — as a hot-path expression it pays
    * interpreted HOF dispatch per probe and re-renders the m/64-long bit
    * array literal into the plan (round-17 audit: the
    * e2_decontaminate_bloom plan was 163 KB and the probe pass dominated
    * the row); use [[probe]] in query plans. */
  def mightContain(c: Column, bits: Array[Long], k: Int): Column =
    probesOk(h1(c), h2(c), bits, k)

  /** Compiled membership probe ([[graft.expressions.BloomProbe]]) —
    * bit-identical to [[mightContain]] (BloomProbeSpec pins the hash fold
    * and every probe against the expression spelling). */
  def probe(c: Column, bits: Array[Long], k: Int): Column =
    graft.expressions.BloomProbe(c, bits, k, Seed2)

  /** Does ANY element of the array column hit the filter? Hashes each
    * element ONCE into a (h1, h2) struct before probing — HOF lambdas
    * don't share subexpressions across iterations, so the naive spelling
    * would re-hash every element k times. */
  def anyMightContain(arr: Column, bits: Array[Long], k: Int): Column =
    exists(transform(arr, e => struct(h1(e).as("a"), h2(e).as("b"))),
      s => probesOk(s.getField("a"), s.getField("b"), bits, k))
}
