package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** [[ShingleShaMin]] parity with the staged explode∘sha2∘min spelling it
  * fuses: identical (min SHA-256 hex, distinct-gram count) across ASCII,
  * repeated-gram, multi-byte, and shorter-than-n inputs — and on the real
  * documents fixture (the e4_fingerprint contract). */
class ShingleShaMinSpec extends SparkSpec {

  private val n = 8

  private def both(docs: org.apache.spark.sql.DataFrame) = {
    val fused = docs.select(col("doc_id"),
        ShingleShaMin(col("text"), n).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s.fp"), col("s.sz"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    val staged = docs.select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), n)).as("sh"))
      .withColumn("h", sha2(col("sh"), 256))
      .groupBy("doc_id")
      .agg(min("h").as("fp"), count(lit(1)).cast("int").as("sz"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    (fused, staged)
  }

  test("fused fingerprint equals staged explode → sha2 → min/count") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "aaaaaaaaaaaaaaaaaa"), // one distinct gram
      (2L, "abcdefghabcdefghabcdefgh"), // repeated grams
      (3L, "héllo wörld — ünïcode ünïcode padding text"), // multi-byte
      (4L, "tiny"), // shorter than n → absent from both
      (5L, "exactly8"), // exactly n chars → one gram
      (6L, "")
    ).toDF("doc_id", "text")
    val (fused, staged) = both(docs)
    assert(fused.keySet == staged.keySet)
    for (id <- fused.keySet) assert(fused(id) == staged(id), s"doc $id")
  }

  test("parity on the documents fixture") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val (fused, staged) = both(docs)
    assert(fused.nonEmpty && fused == staged)
  }
}
