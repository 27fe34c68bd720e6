package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{tokenCounts, tokens}

/** The per-row token-count kernel must yield exactly the rows of the
  * explode + groupBy(doc, t).count() spelling it replaced. */
class ArrayElementCountsSpec extends SparkSpec {

  private val cases = Seq(
    "the quick the slow the quick",
    "one",
    "",                              // no tokens → no rows
    "  runs   of   spaces  a a  ",
    "unicode häst häst 日本 日本 日本")

  private def df = {
    import spark.implicits._
    cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("kernel rows ≡ explode + group count") {
    val kernel = df
      .select(col("id"), explode(tokenCounts(col("text"))).as("e"))
      .select(col("id"), col("e.t").as("t"), col("e.cnt").as("cnt"))
    val grouped = df
      .select(col("id"), explode(tokens(col("text"))).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("cnt"))
    assert(kernel.exceptAll(grouped).isEmpty && grouped.exceptAll(kernel).isEmpty,
      "kernel and explode+groupBy spellings disagree")
  }

  test("counts sum to the token count; null text → null array") {
    import spark.implicits._
    val sums = df
      .select(col("id"), size(tokens(col("text"))).as("n"),
        explode(tokenCounts(col("text"))).as("e"))
      .groupBy("id", "n").agg(sum("e.cnt").as("total"))
      .collect()
    assert(sums.length == cases.count(_.trim.nonEmpty))
    sums.foreach(r => assert(r.getInt(1).toLong == r.getLong(2)))
    val r = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(tokenCounts(col("text"))).head
    assert(r.isNullAt(0))
  }
}
