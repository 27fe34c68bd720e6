package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** [[ShingleMinHash]] parity with the staged MinHashSig∘ShingleSet spelling
  * it fuses: identical mh signature and sz = |distinct shingles|, across
  * ASCII, repeated-gram, multi-byte (codepoint-indexed substrings), and
  * shorter-than-n inputs. */
class ShingleMinHashSpec extends SparkSpec {

  private val n = 5
  private val k = 16

  test("fused sig equals staged ShingleSet → MinHashSig + size") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "aaaaaaaaaaaaaaaaaa"), // one distinct gram
      (2L, "abcdeabcdeabcde"), // repeated grams
      (3L, "héllo wörld — ünïcode ünïcode"), // multi-byte codepoints
      (4L, "tiny"), // shorter than n → null signature
      (5L, "exact"), // exactly n chars → one gram
      (6L, "")
    ).toDF("doc_id", "text")

    val fused = docs.select(col("doc_id"),
        ShingleMinHash(col("text"), n, k).as("sig"))
      .select(col("doc_id"), col("sig.sz"), col("sig.mh"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else (r.getInt(1), r.getSeq[Long](2))))
      .toMap

    val staged = docs.select(col("doc_id"),
        TextFunctions.shingles(col("text"), n).as("shset"))
      .select(col("doc_id"), size(col("shset")).as("sz"),
        when(size(col("shset")) > 0, MinHashSig(col("shset"), k)).as("mh"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) null else (r.getInt(1), r.getSeq[Long](2))))
      .toMap

    assert(fused.keySet == staged.keySet)
    for (id <- fused.keySet) assert(fused(id) == staged(id), s"doc $id")
  }

  test("minhashLshPairs results unchanged by the fused signature path") {
    import spark.implicits._
    // planted near-dup: same text with one token flipped; plus distinct docs
    val base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    // fillers share no 5-grams with each other (every token carries its id)
    val docs = (0L until 40L).map(i =>
        (i, (0 until 8).map(j => s"w${i}x${j}y${i * 7 + j}z").mkString(" ")))
      .toDF("doc_id", "text")
      .union(Seq((100L, base), (101L, base.replace("dolor", "dolur")))
        .toDF("doc_id", "text"))
    val got = TextFunctions
      .minhashLshPairs(docs, numHashes = 128, bands = 32, shingleLen = 5,
        threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.contains((100L, 101L)))
    assert(got.forall { case (a, b) => a == 100L && b == 101L })
  }
}
