package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{shingles, shinglesHof}

/** The native shingle kernel must be bit-identical to the HOF spelling it
  * replaced — same substrings, same first-occurrence order, same
  * empty-array and null behavior, including multi-byte codepoints (SQL
  * substring indexes characters, not bytes). */
class ShingleSetSpec extends SparkSpec {

  private val cases = Seq(
    "abcdefgh",                      // plain ascii
    "aaaaaaa",                       // heavy dedup
    "abcab",                         // dedup with reorder pressure
    "abcd",                          // length == n
    "abc",                           // shorter than n → empty
    "",                              // empty → empty
    "héllo wörld héllo",             // 2-byte codepoints
    "日本語のテキストです日本語",         // 3-byte codepoints
    "mix 日本 and ascii 日本 text")    // mixed widths

  test("kernel ≡ HOF: values, order, empties (n=4)") {
    import spark.implicits._
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val both = df.select(col("id"),
        shingles(col("text"), 4).as("k"), shinglesHof(col("text"), 4).as("h"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch for id ${r.getLong(0)}")
    }
  }

  test("null text → null, not a crash") {
    import spark.implicits._
    val df = Seq(Tuple1(Option.empty[String])).toDF("text")
    val r = df.select(shingles(col("text"), 4)).head
    assert(r.isNullAt(0))
  }

  test("kernel output feeds array_intersect / jaccard identically") {
    import spark.implicits._
    val df = Seq((0L, "the quick brown fox"), (1L, "the quick brown cat"))
      .toDF("id", "text")
    def j(sh: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val a = df.filter(col("id") === 0).select(sh(col("text")).as("s"))
      val b = df.filter(col("id") === 1).select(sh(col("text")).as("t"))
      a.crossJoin(b).select(
        (size(array_intersect(col("s"), col("t"))).cast("double") /
          size(array_union(col("s"), col("t")))).as("j")).head.getDouble(0)
    }
    assert(j(shingles(_, 5)) == j(shinglesHof(_, 5)))
  }
}
