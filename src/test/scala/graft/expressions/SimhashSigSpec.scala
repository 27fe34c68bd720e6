package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** [[SimhashSig]] parity with the staged explode → hash → 64-vote-sum
  * spelling it fuses, for BOTH hash families, across edge cases and the
  * documents fixture. */
class SimhashSigSpec extends SparkSpec {

  private def staged(docs: org.apache.spark.sql.DataFrame,
      tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    val exploded = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
      .select(col("doc_id"), tokenHash(col("t")).as("h"))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v_$b")
    }
    val votes = exploded.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val sh64 = (0 until 64).map { b =>
      when(col(s"v_$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    docs.select(col("doc_id")).join(votes, Seq("doc_id"), "left")
      .select(col("doc_id"), sh64.as("sh64"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  private def fused(docs: org.apache.spark.sql.DataFrame, useMd5: Boolean) =
    docs.select(col("doc_id"), SimhashSig(col("text"), useMd5).as("sh64"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def check(docs: org.apache.spark.sql.DataFrame): Unit = {
    assert(fused(docs, useMd5 = false) == staged(docs, xxhash64(_)),
      "xxhash64 family diverged")
    assert(fused(docs, useMd5 = true) ==
      staged(docs, TextFunctions.md5Hash60), "md5Hash60 family diverged")
  }

  test("fused signature equals the staged vote pipeline on edge cases") {
    import spark.implicits._
    check(Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "   leading and   multiple   spaces\t tabs\nnewlines  "),
      (2L, "repeat repeat repeat repeat"),
      (3L, "héllo wörld ünïcode"),
      (4L, ""), // token-less → sh64 = 0 in both forms
      (5L, "one")
    ).toDF("doc_id", "text"))
  }

  test("parity on the documents fixture") {
    check(graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text"))
  }
}
