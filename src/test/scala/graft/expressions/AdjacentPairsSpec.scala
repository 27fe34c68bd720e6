package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{adjacentPairs, tokens}

/** The map-side bigram kernel must yield exactly the pairs of the
  * posexplode → lead-window spelling it replaced in e4_bigram_logprob:
  * consecutive token pairs in array order, nothing for 0/1-token arrays. */
class AdjacentPairsSpec extends SparkSpec {

  private val cases = Seq(
    "the quick brown fox jumps",
    "a a a a",                       // repeated bigrams must keep multiplicity
    "one",                           // single token → no pairs
    "",                              // no tokens → no pairs
    "  padded   with   runs  ",      // empty-split artifacts filtered first
    "a b")                           // exactly one pair

  private def df = {
    import spark.implicits._
    cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("kernel pairs ≡ posexplode + lead window") {
    val kernel = df
      .select(col("id"), explode(adjacentPairs(tokens(col("text")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val w = Window.partitionBy("id").orderBy("pos")
    val window = df
      .select(col("id"), posexplode(tokens(col("text"))).as(Seq("pos", "w1")))
      .withColumn("w2", lead("w1", 1).over(w))
      .filter(col("w2").isNotNull)
      .select("id", "w1", "w2")
    assert(kernel.exceptAll(window).isEmpty && window.exceptAll(kernel).isEmpty,
      "kernel and window spellings disagree")
  }

  test("pair count is max(n_tokens - 1, 0)") {
    val counts = df
      .select(col("id"), size(tokens(col("text"))).as("n"),
        size(adjacentPairs(tokens(col("text")))).as("p"))
      .collect()
    counts.foreach(r => assert(r.getInt(2) == math.max(r.getInt(1) - 1, 0)))
  }

  test("null array → null; null element → loud failure") {
    import spark.implicits._
    val nullArr = Seq(Tuple1(Option.empty[Seq[String]])).toDF("a")
      .select(adjacentPairs(col("a"))).head
    assert(nullArr.isNullAt(0))
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq(Some("x"), Option.empty[String]))).toDF("a")
        .select(adjacentPairs(col("a"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
